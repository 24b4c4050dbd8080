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

  test("incremental dedup against a corpus matches exhaustive cross-jaccard") {
    val rnd = new Random(11)
    val vocab = (1 to 50).map(i => s"w$i")
    def doc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val corpus = (1 to 40).map(i => (i.toLong, doc(80)))
    // batch: near-dups of some corpus docs + genuinely new docs
    val batch = corpus.take(8).map { case (id, text) =>
      val toks = text.split(" ").toBuffer
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
      (id + 1000, toks.mkString(" "))
    } ++ (1 to 6).map(i => (2000L + i, doc(80)))
    val got = graft.data.MinHashDedup.dedupAgainstCorpus(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expect = batch.map { case (bid, bt) =>
      val matches = corpus.filter { case (_, ct) =>
        val (a, b) = (sh(bt), sh(ct))
        (a | b).nonEmpty && (a & b).size.toDouble / (a | b).size >= 0.8
      }.map(_._1)
      (bid, matches.isEmpty, if (matches.isEmpty) -1L else matches.min)
    }.toSet
    assert(expect.exists(!_._2) && expect.exists(_._2) && got == expect)
  }

  test("top_k_by matches an in-memory sort-take over random groups") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (1 to 500).map(i =>
        (s"g${rnd.nextInt(12)}", rnd.nextInt(100).toDouble, i.toLong))
      val k = 1 + rnd.nextInt(5)
      val got = rows.toDF("g", "score", "id").repartition(7)
        .groupBy($"g")
        .agg(graft.exprs.TopKBy.topKBy(
          struct($"score", (-$"id").as("n")), $"id", k).as("top"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val expect = rows.groupBy(_._1).map { case (g, grp) =>
        g -> grp.sortBy(t => (-t._2, t._3)).take(k).map(_._3).toList
      }
      assert(got == expect, s"seed $seed k=$k")
    }
  }

  test("heavy_hitters is exact for random streams whenever capacity covers the distinct set") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val distinct = 5 + rnd.nextInt(40)
      val rows = (1 to 800).map(_ => s"u${rnd.nextInt(distinct)}")
      val k = 1 + rnd.nextInt(10)
      val got = rows.toDF("u").repartition(5)
        .agg(graft.exprs.HeavyHitters.heavyHitters($"u", k, 64).as("top"))
        .select(explode($"top").as("h")).select($"h.item", $"h.count", $"h.error")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val expect = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (u, c) => (-c, u) }.take(k)
      assert(got.map(t => (t._1, t._2)).toSeq == expect, s"seed $seed k=$k")
      assert(got.forall(_._3 == 0L), s"seed $seed: exact regime must report zero error")
    }
  }

  test("TemporalJoin.step: pruning never changes output vs an unpruned model") {
    import TemporalJoin.{Ev, JState, step}
    // the unpruned reference: identical transition minus the watermark prune
    def naive(events: Seq[Ev], st0: JState, leftTtl: Long, rightTtl: Long):
        (Vector[(Long, Long)], JState) = {
      var st = st0
      val out = Vector.newBuilder[(Long, Long)]
      events.foreach { e =>
        if (e.side == 0) {
          st.leftBuffer.reverse.foreach { case (lts, lp) =>
            if (e.ts - lts <= leftTtl) out += ((lp(0).asInstanceOf[Long], e.payload(0).asInstanceOf[Long]))
          }
          st = JState(Nil, Some((e.ts, e.payload)))
        } else st.rightLatest match {
          case Some((rts, rp)) if rts <= e.ts && e.ts - rts <= rightTtl =>
            out += ((e.payload(0).asInstanceOf[Long], rp(0).asInstanceOf[Long]))
          case _ => st = st.copy(leftBuffer = (e.ts, e.payload) :: st.leftBuffer)
        }
      }
      (out.result(), st)
    }
    val rnd = new Random(20260812L)
    (1 to 50).foreach { trial =>
      val ttl = 50L + rnd.nextInt(100)
      val nBatches = 1 + rnd.nextInt(6)
      var t = 0L
      var pruned = JState(Nil, None)
      var model = JState(Nil, None)
      (1 to nBatches).foreach { _ =>
        val events = Seq.fill(1 + rnd.nextInt(30)) {
          t += rnd.nextInt(20)
          Ev(t, if (rnd.nextInt(4) == 0) 0 else 1, Array[Any](t))
        }.sortBy(e => (e.ts, e.side))
        // a valid watermark never exceeds processed event time
        val wm = t - 5 - rnd.nextInt(30)
        val (outP, stP) = step(events, pruned, wm, ttl, ttl)
        val (outN, stN) = naive(events, model, ttl, ttl)
        val outPPairs = outP.map { case (l, r) =>
          (l(0).asInstanceOf[Long], r(0).asInstanceOf[Long]) }
        assert(outPPairs == outN, s"trial $trial: output diverged")
        pruned = stP; model = stN
        // pruned state is a suffix-subset of the model's, bounded by the TTL horizon
        assert(pruned.leftBuffer.toSet.subsetOf(model.leftBuffer.toSet))
        pruned.leftBuffer.foreach { case (lts, _) => assert(wm - lts <= ttl) }
        assert(pruned.rightLatest.map(_._1) == model.rightLatest.map(_._1))
      }
    }
  }

  test("sorted-neighborhood pairs match an in-memory model on a synthetic dup corpus") {
    import spark.implicits._
    val rnd = new Random(83)
    val words = Vector("alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa")
    def doc() = Seq.fill(6 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")
    // base docs plus near-dup copies with one word appended (same prefix)
    val base = (1L to 60L).map(i => (i, doc()))
    val dups = base.take(20).map { case (i, t) => (i + 1000L, t + " extra") }
    val all = rnd.shuffle(base ++ dups)
    val got = graft.data.SortedNeighborhood.pairs(
        all.toDF("doc_id", "text"), "doc_id", "text",
        keyLen = 24, blockLen = 6, window = 4, jaccardPctMin = 70)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    // in-memory replay of key/block/rank/window/verify
    def norm(t: String) = t.toLowerCase.trim
    def key(t: String) = norm(t).replaceAll("[^a-z0-9]+", "").take(24)
    val keyed = all.map { case (id, t) => (id, norm(t), key(t)) }
    val want = keyed.groupBy(_._3.take(6)).toSeq.flatMap { case (_, g) =>
      val ranked = g.sortBy(r => (r._3, r._1)).zipWithIndex
      for {
        ((aId, ta, _), ra) <- ranked
        ((bId, tb, _), rb) <- ranked
        if rb - ra >= 1 && rb - ra <= 3
        wa = ta.split("\\s+").toSet
        wb = tb.split("\\s+").toSet
        i = (wa & wb).size.toLong
        u = (wa | wb).size.toLong
        if i * 100 >= u * 70
      } yield (aId, bId, i * 1000 / u)
    }.sorted
    assert(got == want)
    assert(got.nonEmpty) // the planted same-prefix dups must surface
  }
}
