package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality audit checks — the referential-integrity / uniqueness /
  * null-rate sweep a warehouse runs over landed tables before promoting
  * them. Each check reduces a table to ONE summary row `(check_name,
  * violations, total)`; the audit result is the union of those rows, so a
  * whole-corpus audit costs one aggregate pass per check and shuffles
  * nothing but per-partition partial counts.
  *
  * Scale shape per check:
  *  - foreign-key orphans: LEFT ANTI join child→parent. The parent side is
  *    keys-only (distinct of one column) — for dimension-sized parents it
  *    broadcasts; for fact-sized parents AQE plans the shuffle join, and
  *    either way the count aggregate is 16 bytes per partition.
  *  - primary-key duplicates: groupBy(key) count>1 — one partial-agg'd
  *    exchange of the key column only.
  *  - null rate: conditional count in a single scan, no shuffle at all
  *    (one all-to-one 16-byte partial).
  */
object Integrity {

  /** Rows of `child` whose `childKey` has no match in `parent.parentKey`
    * (NULL child keys count as orphans — a null FK fails the audit).
    * Single pass: a LEFT join against the marked parent key set feeds one
    * conditional-count aggregate — total and violations from the same
    * scan, no separate count job. */
  def fkOrphans(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childKey).as("__k"))
      .join(pk, Seq("__k"), "left")
      .agg(count(lit(1)).as("total"),
        count(when(col("__hit").isNull, lit(1))).as("violations"))
      .select(lit(name).as("check_name"), col("violations"), col("total"))
  }

  /** Count of rows carrying a duplicated value of `keyCols` (rows, not
    * distinct keys: a key appearing 3× contributes 3 violations). One
    * keyed exchange of the key columns only; totals derive from the same
    * per-key counts. */
  def dupKeyRows(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("total"),
        coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"),
        col("violations").cast("long").as("violations"),
        col("total").cast("long").as("total"))

  /** Null count of one column in one scan. */
  def nullCount(name: String, df: DataFrame, c: String): DataFrame =
    df.agg(count(lit(1)).as("__t"),
        count(when(col(c).isNull, lit(1))).as("violations"))
      .select(lit(name).as("check_name"), col("violations"),
        col("__t").as("total"))

  /** Union the per-check summary rows into the audit report. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))
}
