package graft.exprs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSpec extends SparkSpec {
  import spark.implicits._

  test("kll_sketch_agg quantiles land within the rank-error envelope") {
    // 0..9999 shuffled deterministically across partitions
    val df = spark.range(10000)
      .select((col("id") * 2654435761L % 10000L).as("v"))
      .repartition(7)
    val sk = df.agg(KllQuantiles.sketchAgg(col("v"), 400).as("sk"))
    val Seq(q50, q95) = Seq(0.5, 0.95).map { p =>
      sk.select(KllQuantiles.quantile(col("sk"), p)).head.getLong(0)
    }
    // k=400: single-sided rank error ~0.87% @99%; assert a generous 2.5%
    assert(math.abs(q50 - 5000L) <= 250, s"q50=$q50")
    assert(math.abs(q95 - 9500L) <= 250, s"q95=$q95")
  }

  test("kll_merge_agg of per-group sketches matches a direct whole-set sketch's envelope") {
    val df = spark.range(20000)
      .select((col("id") % 10L).as("g"), (col("id") * 48271L % 20000L).as("v"))
    val perGroup = df.groupBy(col("g"))
      .agg(KllQuantiles.sketchAgg(col("v"), 400).as("sk"))
    val merged = perGroup.agg(KllQuantiles.mergeAgg(col("sk"), 400).as("sk"))
    val q50 = merged.select(KllQuantiles.quantile(col("sk"), 0.5)).head.getLong(0)
    assert(math.abs(q50 - 10000L) <= 500, s"merged q50=$q50")
  }

  test("empty input yields an empty sketch and a null quantile") {
    val sk = spark.range(1).filter(col("id") < 0)
      .agg(KllQuantiles.sketchAgg(col("id"), 200).as("sk"))
    val r = sk.select(KllQuantiles.quantile(col("sk"), 0.5)).head
    assert(r.isNullAt(0))
  }

  test("sketch binary round-trips through parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("kll").toString
    spark.range(1000).select(lit(1L).as("g"), col("id").as("v"))
      .groupBy("g").agg(KllQuantiles.sketchAgg(col("v"), 200).as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .agg(KllQuantiles.mergeAgg(col("sk"), 200).as("sk"))
    val q = back.select(KllQuantiles.quantile(col("sk"), 0.5)).head.getLong(0)
    assert(math.abs(q - 500L) <= 50, s"q=$q")
  }
}
