package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling: per-column row count, null count, distinct count and
  * min/max — the schema-drift / data-quality audit a pipeline runs before
  * trusting a new drop of upstream data. Output is LONG form (one row per
  * column) so a 500-column table profiles into 500 rows, not a 2000-column
  * monster row.
  *
  * Shape: ONE aggregate pass computes every column's stats simultaneously.
  * With exact distinct counts Spark plans the multi-countDistinct via a
  *  single Expand (k-fold row multiplication, one shuffle) — exact and
  * oracle-checkable, the default here. At 100 TB-wide profiles, pass
  * `exact = false` to swap in HyperLogLog `approx_count_distinct`, which
  * drops the Expand entirely (plain partial-agg pipeline, fixed-size
  * sketch per column). The long-form pivot is a literal `stack` over the
  * one aggregated row — no second pass over data.
  */
object Profiler {

  /** Profile `cols` of `df`. Min/max are computed on the native type
    * (preserving numeric/date ordering) and then rendered to string so
    * heterogeneous columns stack into one output schema. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val one = df.agg(total, aggs: _*)
    // stack(k, name1, total, cnt1, dst1, min1, max1, ...) — pure literal
    // reshaping of the single aggregated row into long form
    val stackArgs: Seq[Column] = cols.flatMap { c =>
      Seq(lit(c), col("__total"), col(s"__cnt_$c"), col(s"__dst_$c"),
        col(s"__min_$c"), col(s"__max_$c"))
    }
    one.select(stack((lit(cols.size) +: stackArgs): _*)
        .as(Seq("column_name", "n_rows", "n_present", "n_distinct", "min_str", "max_str")))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_present")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
