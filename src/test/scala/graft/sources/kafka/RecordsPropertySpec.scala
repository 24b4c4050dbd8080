package graft.sources.kafka

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the record-batch v2 codec — every row the wire
  * source emits passes through `Records.decodeAll`, so the codec gets the
  * adversarial-input treatment: arbitrary keys/values (null / empty /
  * binary), headers, timestamps, base offsets, all five codecs, and random
  * transactional log layouts. Example-based coverage lives in
  * RecordsCodecSpec; these pin the INVARIANTS:
  *
  *  - encode∘decode is the identity on every field, under every codec
  *  - concatenated batches decode to the concatenation, cursor at the end
  *  - read_committed visibility matches a reference model of transaction
  *    fates, and the cursor is IDENTICAL in both isolation modes (the
  *    property that makes checkpoints isolation-invariant)
  */
class RecordsPropertySpec extends AnyFunSuite {

  /** Deterministic run: fixed seed, fixed count — a CI property flake is
    * a bug report you can't reproduce. */
  private def check(label: String, p: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(0xC0FFEE42L)), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 48).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))

  /** null (no key / tombstone), empty, or arbitrary binary. */
  private val genOptBytes: Gen[Array[Byte]] = Gen.frequency(
    7 -> genBytes,
    2 -> Gen.const(null.asInstanceOf[Array[Byte]]),
    1 -> Gen.const(Array.emptyByteArray))

  private val genHeaders: Gen[List[(String, Array[Byte])]] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.identifier.map(_.take(12))
      v <- genOptBytes
    } yield (k, v)))

  private val genCodec: Gen[Int] = Gen.oneOf(
    Records.CodecNone, Records.CodecGzip, Records.CodecSnappy,
    Records.CodecLz4, Records.CodecZstd)

  private def genRecords(baseOffset: Long): Gen[List[Records.Record]] = for {
    n <- Gen.chooseNum(1, 16)
    ts0 <- Gen.chooseNum(0L, 1L << 40)
    recs <- Gen.sequence[List[Records.Record], Records.Record](
      (0 until n).toList.map { i =>
        for {
          dts <- Gen.chooseNum(0L, 1L << 20)
          k <- genOptBytes; v <- genOptBytes; hs <- genHeaders
        } yield Records.Record(baseOffset + i, ts0 + dts, k, v, 0, hs)
      })
  } yield recs

  private def sameBytes(a: Array[Byte], b: Array[Byte]): Boolean =
    (a == null && b == null) || (a != null && b != null && java.util.Arrays.equals(a, b))

  private def sameRecord(a: Records.Record, b: Records.Record): Boolean =
    a.offset == b.offset && a.timestampMs == b.timestampMs &&
      sameBytes(a.key, b.key) && sameBytes(a.value, b.value) &&
      a.headers.size == b.headers.size &&
      a.headers.zip(b.headers).forall { case ((ak, av), (bk, bv)) =>
        ak == bk && sameBytes(av, bv) }

  test("encode∘decode is the identity on offsets/timestamps/keys/values/headers, any codec") {
    val gen = for {
      base <- Gen.chooseNum(0L, 1L << 32)
      recs <- genRecords(base)
      codec <- genCodec
    } yield (base, recs, codec)
    check("roundtrip", Prop.forAll(gen) { case (base, recs, codec) =>
      val dec = Records.decodeAll(Records.encodeBatch(base, recs, attributes = codec))
      dec.nextOffset == base + recs.size &&
        dec.records.size == recs.size &&
        dec.records.zip(recs).forall { case (a, b) => sameRecord(a, b) }
    })
  }

  test("concatenated batches decode to the concatenation; cursor lands at the log end") {
    val gen = for {
      base <- Gen.chooseNum(0L, 1L << 20)
      sizes <- Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1, 8)))
      codecs <- Gen.listOfN(sizes.size, genCodec)
    } yield (base, sizes, codecs)
    check("concat", Prop.forAll(gen) { case (base, sizes, codecs) =>
      var off = base
      val all = mutable.ArrayBuffer[Records.Record]()
      val wire = mutable.ArrayBuffer[Byte]()
      sizes.zip(codecs).foreach { case (n, codec) =>
        val recs = (0 until n).map(i => Records.Record(off + i, 1L + i,
          s"k${off + i}".getBytes(StandardCharsets.UTF_8),
          s"v${off + i}".getBytes(StandardCharsets.UTF_8)))
        wire ++= Records.encodeBatch(off, recs, attributes = codec)
        all ++= recs
        off += n
      }
      val dec = Records.decodeAll(wire.toArray)
      dec.nextOffset == off &&
        dec.records.zip(all).forall { case (a, b) => sameRecord(a, b) } &&
        dec.records.size == all.size
    })
  }

  test("LogAppendTime batches stamp every record with the batch max timestamp") {
    val gen = for {
      base <- Gen.chooseNum(0L, 1L << 20)
      recs <- genRecords(base)
      codec <- genCodec
    } yield (base, recs, codec)
    check("logappend", Prop.forAll(gen) { case (base, recs, codec) =>
      val dec = Records.decodeAll(
        Records.encodeBatch(base, recs, attributes = codec | 0x08))
      val maxTs = recs.map(_.timestampMs).max
      dec.records.forall(r => r.timestampMs == maxTs && r.timestampType == 1)
    })
  }

  // --- transactional visibility model ---------------------------------------

  /** A random producer action; interpretation below enforces validity
    * (an End for a producer with nothing open is dropped). */
  private sealed trait Op
  private case class Plain(n: Int) extends Op
  private case class TxnAppend(pid: Long, n: Int) extends Op
  private case class End(pid: Long, commit: Boolean) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> Gen.chooseNum(1, 4).map(Plain(_)),
    4 -> (for { pid <- Gen.chooseNum(1L, 3L); n <- Gen.chooseNum(1, 4) }
      yield TxnAppend(pid, n)),
    3 -> (for { pid <- Gen.chooseNum(1L, 3L); c <- Gen.oneOf(true, false) }
      yield End(pid, c)))

  test("read_committed visibility matches the transaction-fate model; cursor is isolation-invariant") {
    val gen = for {
      ops <- Gen.chooseNum(1, 14).flatMap(k => Gen.listOfN(k, genOp))
      tailCommits <- Gen.listOfN(3, Gen.oneOf(true, false)) // fates for still-open txns
      codec <- genCodec
    } yield (ops, tailCommits, codec)
    check("txn-model", Prop.forAll(gen) { case (ops, tailCommits, codec) =>
      var off = 0L
      var txnSeq = 0
      val wire = mutable.ArrayBuffer[Byte]()
      // log-ordered rows: (value, txnId tag; -1 = non-transactional)
      val rows = mutable.ArrayBuffer[(String, Int)]()
      val fate = mutable.Map[Int, Boolean]()             // txnId → committed?
      val openTxn = mutable.Map[Long, Int]()             // pid → open txnId
      val openFirst = mutable.Map[Long, Long]()          // pid → first offset
      val aborted = mutable.ArrayBuffer[(Long, Long)]()  // fetch-style index

      def appendData(pid: Long, n: Int): Unit = {
        val txnId = if (pid < 0) -1 else openTxn.getOrElseUpdate(pid, { txnSeq += 1; txnSeq })
        if (pid >= 0 && !openFirst.contains(pid)) openFirst(pid) = off
        val recs = (0 until n).map { i =>
          val v = s"o${off + i}"
          rows += ((v, txnId))
          Records.Record(off + i, 7L, null, v.getBytes(StandardCharsets.UTF_8))
        }
        wire ++= Records.encodeBatch(off, recs,
          attributes = codec | (if (pid >= 0) Records.TransactionalBit else 0),
          producerId = pid)
        off += n
      }
      def endTxn(pid: Long, commit: Boolean): Unit = openTxn.remove(pid).foreach { txnId =>
        fate(txnId) = commit
        if (!commit) aborted += ((pid, openFirst(pid)))
        openFirst.remove(pid)
        wire ++= Records.encodeControl(off, pid, commit)
        off += 1
      }

      ops.foreach {
        case Plain(n) => appendData(-1L, n)
        case TxnAppend(pid, n) => appendData(pid, n)
        case End(pid, c) => endTxn(pid, c) // no-op when nothing open
      }
      // close every still-open txn (below the LSO everything is settled;
      // decodeAll sits below the fetch layer that enforces the LSO)
      openTxn.keys.toSeq.sorted.zipWithIndex.foreach { case (pid, i) =>
        endTxn(pid, tailCommits(i % tailCommits.size))
      }
      if (rows.isEmpty) Prop.undecided
      else {
        val bytes = wire.toArray
        val expected = rows.collect {
          case (v, tag) if tag == -1 || fate(tag) => v }.toList
        val rc = Records.decodeAll(bytes, aborted.toSeq, readCommitted = true)
        val ru = Records.decodeAll(bytes)
        val rcVals = rc.records.map(r => new String(r.value, StandardCharsets.UTF_8)).toList
        val ruVals = ru.records.map(r => new String(r.value, StandardCharsets.UTF_8)).toList
        Prop(rcVals == expected) :| s"visible $rcVals != model $expected" &&
          Prop(ruVals == rows.map(_._1).toList) :| "read_uncommitted must surface every data row" &&
          Prop(rc.nextOffset == off && ru.nextOffset == off) :|
            s"cursors ${rc.nextOffset}/${ru.nextOffset} != log end $off"
      }
    })
  }
}
