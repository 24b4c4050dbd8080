package graft.exprs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{SparkSpec, Tables}

class TopKBySpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by equals window row_number<=k on real data") {
    val orders = Tables.orders(spark, sf)
    val viaAgg = orders
      .groupBy($"o_custkey")
      .agg(TopKBy.topKBy(
        struct($"o_totalprice", (-$"o_orderkey").as("neg")),
        struct($"o_orderkey", $"o_totalprice"), 3).as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"col.o_orderkey".as("o_orderkey"), $"o_custkey",
        $"col.o_totalprice".as("o_totalprice"), ($"pos" + 1).as("rn"))
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"rn")
    val a = viaAgg.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(r => r.toSeq.updated(3, r.getInt(3))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("partial aggregation: heaps combine map-side before the shuffle") {
    val df = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(TopKBy.topKBy($"o_totalprice", $"o_orderkey", 2).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.linesIterator.take(5).mkString("\n"))
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by"), "no partial agg phase")
  }

  test("null sort keys are skipped; groups smaller than k return what they have") {
    val df = Seq(
      ("a", Some(3.0), 1L), ("a", None, 2L), ("a", Some(1.0), 3L),
      ("b", Some(5.0), 4L)).toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(TopKBy.topKBy($"score", $"id", 2).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(1L, 3L)) // 3.0 then 1.0; null never kept
    assert(out("b") == Seq(4L))
  }

  test("string sort keys and SQL registration") {
    NativeExpressions.register(spark)
    Seq(("x", "b", 1), ("x", "c", 2), ("x", "a", 3)).toDF("g", "s", "v")
      .createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      "SELECT g, top_k_by(s, v, 2) AS top FROM topk_in GROUP BY g").collect()
    assert(rows.head.getSeq[Int](1) == Seq(2, 1)) // 'c' then 'b'
  }

  test("bottom_k_by keeps the smallest, ascending — string keys included") {
    val out = Seq((1, "c", 10L), (1, "a", 20L), (1, "b", 30L)).toDF("g", "s", "v")
      .groupBy($"g").agg(TopKBy.bottomKBy($"s", $"v", 2).as("bot"))
      .head().getSeq[Long](1)
    assert(out == Seq(20L, 30L)) // 'a' then 'b'
  }

  test("k larger than the group keeps everything, descending") {
    val out = Seq((1, 10.0), (1, 30.0), (1, 20.0)).toDF("g", "x")
      .groupBy($"g").agg(TopKBy.topKBy($"x", $"x", 100).as("top"))
      .head().getSeq[Double](1)
    assert(out == Seq(30.0, 20.0, 10.0))
  }
}
