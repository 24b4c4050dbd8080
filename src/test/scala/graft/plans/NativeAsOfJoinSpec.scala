package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NativeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the in-memory as-of model on random data, any partitioning") {
    val rnd = new scala.util.Random(41)
    val lefts = (0 until 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(100000).toLong * 1000L, i.toLong))
    val rights = (0 until 300).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(100000).toLong * 1000L + 1, 1000L + i))
    val window = 20000000L
    val model = lefts.flatMap { case (k, t, id) =>
      val cands = rights.filter(r => r._1 == k && r._2 <= t && t - r._2 <= window)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(_._2) // right ts values are unique (odd vs even)
        Some((id, k, t, best._3))
      }
    }.sorted
    for (parts <- Seq(1, 7)) {
      val l = lefts.toDF("k", "t", "lid").repartition(parts)
      val r = rights.toDF("rk", "rt", "rid").repartition(parts + 1)
      val got = NativeAsOfJoin.join(l, r, "k", "t", "rk", "rt", window)
        .select(col("lid"), col("k"), col("t"), col("rid"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .toSeq.sorted
      assert(got == model, s"parts=$parts")
    }
  }

  test("self-join from one scan works (fresh ids on the right) and plans AsOfJoinExec") {
    val base = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 15L, "x"),
      (2L, 5L, "c"), (2L, 4L, "y")).toDF("k", "t", "v")
    val left = base.filter(col("v").isin("a", "b", "c"))
      .select(col("k"), col("t"), col("v").as("lv"))
    val right = base.filter(col("v").isin("x", "y"))
      .select(col("k").as("rk"), col("t").as("rt"), col("v").as("rv"))
    val j = NativeAsOfJoin.join(left, right, "k", "t", "rk", "rt", 1000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin k#"), plan)
    val got = j.select(col("lv"), col("rv")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // a(t=10) has no right ≤ 10 for k=1 (x at 15) -> dropped (inner);
    // b(t=20) -> x(15); c(t=5) -> y(4)
    assert(got == Set(("b", "x"), ("c", "y")))
  }

  test("declared ordering requirement is satisfied by EnsureRequirements sorts") {
    val l = spark.range(100).select((col("id") % 5).as("k"),
      (col("id") * 7 % 1000).as("t"), col("id").as("lid"))
    val r = spark.range(80).select((col("id") % 5).as("rk"),
      (col("id") * 11 % 1000).as("rt"), col("id").as("rid"))
    val j = NativeAsOfJoin.join(l, r, "k", "t", "rk", "rt", Long.MaxValue / 4)
    val plan = j.queryExecution.executedPlan.toString
    // both children get an in-partition sort and a hash exchange
    assert(plan.contains("Sort ["), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(j.count() > 0)
  }
}
