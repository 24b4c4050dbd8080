package graft.data

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilerBasketSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, distincts, min/max per column") {
    val df = Seq(
      (1L, Some("b"), Some(10)), (2L, None, Some(20)), (3L, Some("a"), None),
      (4L, Some("a"), Some(20))
    ).toDF("id", "s", "v")
    val out = Profiler.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getLong(1) == 4 && out("id").getLong(2) == 0)
    assert(out("id").getLong(3) == 4)
    assert(out("id").getString(4) == "1" && out("id").getString(5) == "4")
    assert(out("s").getLong(2) == 1 && out("s").getLong(3) == 2)
    assert(out("s").getString(4) == "a" && out("s").getString(5) == "b")
    assert(out("v").getLong(2) == 1 && out("v").getLong(3) == 2)
  }

  test("profile approx mode has the same shape") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Profiler.profile(df, Seq("id", "s"), exact = false).collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(3) == 2L))
  }

  test("frequentPairs counts basket co-occurrence with support cutoff") {
    // baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4} → (1,2) support 3; (1,3),(2,3),
    // (1,4),(2,4),(3,4) support 1
    val df = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 4L), (30L, 4L), // dup item collapses
      (40L, 3L), (40L, 4L)
    ).toDF("basket", "item")
    val out = Basket.frequentPairs(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L)))
  }

  test("frequentPairs singleton pruning does not change the answer") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(12).toLong))
    val df = rows.toDF("basket", "item")
    val got = Basket.frequentPairs(df, "basket", "item", minSupport = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val items = rows.distinct
    val byBasket = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val pairCounts = byBasket.values.flatMap(is =>
      for (a <- is; b <- is if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val want = pairCounts.filter(_._2 >= 3L)
      .map { case ((a, b), n) => (a, b, n) }.toSeq.sorted
    assert(got.toSeq == want)
  }

  test("cosineTopK matches in-memory brute-force cosine² top-k") {
    val rnd = new scala.util.Random(41)
    val rows = for (b <- 1L to 120L; _ <- 0 until 4)
      yield (b, rnd.nextInt(25).toLong)
    val df = rows.toDF("basket", "item")
    val got = Basket.cosineTopK(df, "basket", "item", minSupport = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted

    // brute force over the distinct (basket, item) incidence
    val inc = rows.distinct
    val byItem = inc.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val items = byItem.keySet.toSeq
    val pairs = for {
      a <- items; b <- items if a < b
      c = (byItem(a) & byItem(b)).size.toLong if c >= 2
    } yield (a, b, c)
    // both endpoints must individually clear minSupport (A-priori prune)
    val freq = byItem.filter(_._2.size >= 2).keySet
    val sym = pairs.filter(p => freq(p._1) && freq(p._2))
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
    val want = sym.groupBy(_._1).toSeq.flatMap { case (item, ps) =>
      ps.map { case (_, partner, c) =>
        val sim2 = c * c * 1000000L / (byItem(item).size.toLong * byItem(partner).size)
        (item, partner, c, sim2)
      }.sortBy { case (_, partner, _, sim2) => (-sim2, partner) }
        .take(3).zipWithIndex
        .map { case ((i, p, c, s2), rn) => (i, p, c, s2, rn + 1L) }
    }.sorted
    assert(got == want)
  }
}
