package graft.exprs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: set algebra matches exact distinct arithmetic under any partitioning") {
    // A = multiples of 2 in [0,200), B = multiples of 3 in [0,300):
    // |A|=100, |B|=100, |A∩B|=|multiples of 6 < 200|=34, |A∪B|=166, |A\B|=66
    val a = spark.range(100).select((col("id") * 2).as("v"))
    val b = spark.range(100).select((col("id") * 3).as("v"))
    for (parts <- Seq(1, 9)) {
      val ska = a.repartition(parts).agg(ThetaSketch.sketchAgg(col("v"), 1024).as("sk"))
      val skb = b.repartition(parts).agg(ThetaSketch.sketchAgg(col("v"), 1024).as("sk"))
      val row = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
        .select(
          ThetaSketch.estimate(col("sk")).as("na"),
          ThetaSketch.estimate(col("sk2")).as("nb"),
          ThetaSketch.estimate(ThetaSketch.intersect(col("sk"), col("sk2"))).as("ni"),
          ThetaSketch.estimate(ThetaSketch.union(col("sk"), col("sk2"))).as("nu"),
          ThetaSketch.estimate(ThetaSketch.aNotB(col("sk"), col("sk2"))).as("nd"))
        .head
      assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4)) == ((100L, 100L, 34L, 166L, 66L)), s"parts=$parts")
    }
  }

  test("estimation regime: published error envelopes hold for union and intersection") {
    // 80k distinct into nom=4096 — deep estimation mode. RSE ≈ 1/√nom
    // ≈ 1.6%; assert a generous 8% (deterministic: murmur seed is fixed).
    val n = 80000L
    val a = spark.range(n).select(col("id").as("v"))                // [0, 80k)
    val b = spark.range(n / 2, n + n / 2).select(col("id").as("v")) // [40k, 120k)
    val ska = a.agg(ThetaSketch.sketchAgg(col("v"), 4096).as("sk"))
    val skb = b.agg(ThetaSketch.sketchAgg(col("v"), 4096).as("sk"))
    val row = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
      .select(
        ThetaSketch.estimate(col("sk")).as("na"),
        ThetaSketch.estimate(ThetaSketch.union(col("sk"), col("sk2"))).as("nu"),
        ThetaSketch.estimate(ThetaSketch.intersect(col("sk"), col("sk2"))).as("ni"))
      .head
    assert(math.abs(row.getLong(0) - n) <= n * 8 / 100, s"na=${row.getLong(0)}")
    assert(math.abs(row.getLong(1) - 120000L) <= 120000L * 8 / 100, s"nu=${row.getLong(1)}")
    // intersection error scales with inclusion ratio (50% here): allow 15%
    assert(math.abs(row.getLong(2) - 40000L) <= 40000L * 15 / 100, s"ni=${row.getLong(2)}")
  }

  test("theta_merge_agg rollup equals a direct whole-set sketch (exact regime)") {
    val df = spark.range(3000).select((col("id") % 7L).as("g"), col("id").as("v"))
    val perGroup = df.groupBy(col("g"))
      .agg(ThetaSketch.sketchAgg(col("v"), 8192).as("sk"))
    val rolled = perGroup.agg(
      ThetaSketch.estimate(ThetaSketch.mergeAgg(col("sk"), 8192)).as("n"))
    assert(rolled.head.getLong(0) == 3000L)
  }

  test("serialized sketches survive a parquet round trip") {
    val dir = java.nio.file.Files.createTempDirectory("theta").toString
    spark.range(500).select((col("id") % 5L).as("g"), col("id").as("v"))
      .groupBy(col("g")).agg(ThetaSketch.sketchAgg(col("v"), 1024).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .agg(ThetaSketch.estimate(ThetaSketch.mergeAgg(col("sk"), 1024)).as("n"))
    assert(back.head.getLong(0) == 500L)
    val strings = Seq("a", "b", "a", "c").toDF("s")
      .agg(ThetaSketch.estimate(ThetaSketch.sketchAgg(col("s"), 64)).as("n"))
    assert(strings.head.getLong(0) == 3L)
  }
}
