package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Scan-efficiency regression gate: the three properties that decide
  * whether a 100 TB parquet read touches gigabytes or the whole lake —
  * predicate pushdown, column pruning, and partition pruning — asserted
  * on the PHYSICAL plan, not inferred from row counts.
  */
class ScanPruningSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filters reach the parquet scan as PushedFilters") {
    val plan = formatted(
      Tables.lineitem(spark, sf).filter(col("l_quantity") > 30.0)
        .select(col("l_orderkey"), col("l_quantity")))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity,30.0)"), plan)
  }

  test("a 2-column projection prunes ReadSchema to those columns") {
    val plan = formatted(
      Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_partkey"),
      readSchema)
    // none of the other 9 columns survive into the scan schema
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("day-partitioned layout prunes partitions under a day filter") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf)
      .withColumn("day", expr("ts_ns div 86400000000000"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("day") === 19725L)
    val plan = formatted(one)
    // the day predicate must land in PartitionFilters, not PushedFilters
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("19725")), plan)
    // and the scan must report exactly one of the ~30 day partitions
    val scanned = one.select(input_file_name()).distinct().count()
    val total = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(scanned < total / 10,
      s"expected a small fraction of files scanned, got $scanned of $total")
    assert(one.count() > 0)
  }
}
