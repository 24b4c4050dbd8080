package graft.operators

import org.apache.spark.sql.DataFrame

import graft.exprs.ExprCompiler

/** Expression filter — the reference's filter stage
  * (glassflow-api/internal/filter/json/filter.go:17-54): the configured
  * expr-lang predicate is compiled once and rows that don't satisfy it are
  * dropped. Compiled to a Catalyst predicate so it is pushed down to the
  * scan (PushedFilters) whenever the source supports it — at 100 TB the
  * filter happens inside the parquet/Kafka reader, not after it.
  *
  * Null/eval-error semantics: a predicate evaluating to NULL drops the row
  * (same observable outcome as the reference routing eval errors away from
  * the output stream).
  */
object FilterOp {
  def apply(expression: String)(df: DataFrame): DataFrame =
    df.filter(ExprCompiler.compile(expression, df.schema))

  /** Split pass/fail for DLQ-style handling: rows failing the predicate
    * (or evaluating to NULL) go to the second frame. */
  def partition(expression: String)(df: DataFrame): (DataFrame, DataFrame) = {
    val pred = ExprCompiler.compile(expression, df.schema)
    (df.filter(pred), df.filter(!coalesceFalse(pred)))
  }

  private def coalesceFalse(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.coalesce(c, org.apache.spark.sql.functions.lit(false))
}
