package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import AsOfJoin.Projection

/** Randomized cross-checks: each distributed operator against a trivially
  * correct in-memory reference implementation over seeded random data —
  * catches semantic edge cases (key boundaries, window boundaries, ties)
  * that hand-picked fixtures miss. */
class RandomizedSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("windowedBatch dedup matches an in-memory since-last-kept scan") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (1 to 400).map(i =>
        (s"k${rnd.nextInt(8)}", rnd.nextInt(500).toLong, i.toLong))
      val window = 40L
      val got = DedupOp.windowedBatch(Seq("k"), "ts_ns", window, "id")(
          rows.toDF("k", "ts_ns", "id"))
        .collect().map(_.getLong(2)).toSet
      val expect = rows.groupBy(_._1).values.flatMap { g =>
        var lastKept = Long.MinValue
        var first = true
        g.sortBy(t => (t._2, t._3)).flatMap { case (_, ts, id) =>
          if (first || ts - lastKept > window) {
            first = false; lastKept = ts; Some(id)
          } else None
        }
      }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("sortMerge as-of join matches an in-memory latest-right scan") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // unique timestamps per key/side keep "latest" unambiguous
      def side(n: Int, off: Int) = (1 to n).map { i =>
        (s"k${rnd.nextInt(6)}", (rnd.nextInt(5000) * 2 + off).toLong, i.toLong)
      }.distinct
      val lefts = side(150, 0)
      val rights = side(150, 1)
      val window = 500L
      val got = AsOfJoin.sortMerge(
          lefts.toDF("k", "ts_ns", "id"), rights.toDF("k", "ts_ns", "id"),
          "k", "k", "ts_ns", "ts_ns", window,
          Seq(Projection("id", "lid")), Seq(Projection("id", "rid")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rightsByKey = rights.groupBy(_._1)
      val expect = lefts.flatMap { case (k, lts, lid) =>
        rightsByKey.getOrElse(k, Seq.empty)
          .filter { case (_, rts, _) => rts <= lts && lts - rts <= window }
          .sortBy(_._2).lastOption.map { case (_, _, rid) => (lid, rid) }
      }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("exact dedup matches an in-memory group-min") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed)
      val rows = (1 to 300).map(i =>
        (s"k${rnd.nextInt(20)}", rnd.nextInt(100).toLong, i.toLong))
      val got = DedupOp.exact(Seq("k"), Seq(col("ts_ns"), col("id")))(
          rows.toDF("k", "ts_ns", "id"))
        .collect().map(_.getLong(2)).toSet
      val expect = rows.groupBy(_._1).values
        .map(g => g.minBy(t => (t._2, t._3))._3).toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("minhash LSH finds all pairs above threshold on synthetic dup corpus") {
    val rnd = new Random(7)
    val vocab = (1 to 50).map(i => s"w$i")
    def doc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // base docs + mutated near-dups (drop/replace a few words)
    val bases = (1 to 30).map(i => (i.toLong, doc(80)))
    val dups = bases.take(10).map { case (id, text) =>
      val toks = text.split(" ").toBuffer
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
      (id + 1000, toks.mkString(" "))
    }
    val df = (bases ++ dups).toDF("doc_id", "text")
    val got = graft.data.MinHashDedup.duplicatePairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: exact pairwise jaccard over word 3-gram shingle sets
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val all = (bases ++ dups)
    val expect = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      j = { val (a, b) = (sh(ta), sh(tb))
        if ((a | b).isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size }
      if j >= 0.8
    } yield (ia, ib)).toSet
    assert(expect.nonEmpty && got == expect)
  }
}
