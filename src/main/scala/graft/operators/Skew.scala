package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys. AQE's skew-join splitting covers joins
  * automatically; for aggregations over power-law keys (the common case in
  * 100 TB event data: one user/tenant is 10% of rows) this provides the
  * classic two-phase salted aggregate: partial-aggregate on (key, salt) so
  * the hot key fans out over `salt` reducers, then merge the partials on
  * the key alone. Only algebraic aggregates (sum/count/min/max) can merge
  * this way — avg must be expressed as sum/count by the caller.
  */
object Skew {

  /** Two-phase salted aggregation.
    * @param aggs (outputName → (phase1 agg over raw rows, phase2 merge over
    *             partials)) e.g. "n" -> (count(lit(1)), sum(col("n"))) */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                aggs: Seq[(String, (Column, Column))]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m.as(n) }: _*)
  }

  /** Salted sum+count convenience (enough for sums, counts, and averages
    * via sum/count). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets, Seq(
      "sum_v" -> (sum(col(valueCol)), sum(col("sum_v"))),
      "cnt" -> (count(lit(1)), sum(col("cnt")))))
}
