package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch analog of the reference's temporal join
  * (glassflow-api/internal/join/temporal.go): for each left row, join the
  * LATEST right row with the same key whose timestamp is ≤ the left row's
  * and within the window ("latest value per key" lookup semantics — right
  * overwrites, temporal.go:267-291). Inner: lefts with no in-window right
  * are dropped.
  *
  * Two implementations:
  *  - [[sortMerge]] (the scale path): union both sides, repartition by key,
  *    sort by (key, ts), one linear pass carrying the last right row. Cost is
  *    one shuffle of each input and NO intermediate pair blow-up — a plain
  *    range-join would materialize every (left, right-in-window) pair before
  *    picking the latest, which is quadratic under hot keys at 100 TB.
  *  - [[viaWindow]] (compose-built-ins cross-check): range join + row_number.
  *
  * Output projection follows the reference's JoinRule select/rename
  * (join/utils.go:16-40): explicit per-side {field → output_name} lists.
  */
object AsOfJoin {

  /** {source field → output column} (reference JoinRule, configs.go:774-828). */
  final case class Projection(field: String, as: String)

  /** Keys/projections resolve dotted names literal-first then as nested
    * paths — the reference's dual gjson resolution (join/utils.go:16-40),
    * same contract as [[TemporalJoin]]. */
  private def resolved(df: DataFrame, field: String): (Column, DataType) = {
    val (c, dt) = graft.exprs.ExprCompiler.resolve(field.split('.').toSeq, df.schema)
    (c, dt.getOrElse(StringType))
  }

  def sortMerge(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTsNs: String, rightTsNs: String,
                windowNs: Long,
                leftOut: Seq[Projection], rightOut: Seq[Projection]): DataFrame = {
    val lStruct = struct(leftOut.map(p => resolved(left, p.field)._1.as(p.as)): _*)
    val rStruct = struct(rightOut.map(p => resolved(right, p.field)._1.as(p.as)): _*)
    val rType = StructType(rightOut.map(p =>
      StructField(p.as, resolved(right, p.field)._2, nullable = true)))
    val lType = StructType(leftOut.map(p =>
      StructField(p.as, resolved(left, p.field)._2, nullable = true)))

    // side 0 = right sorts before side 1 = left at equal timestamps, so a
    // left row sees a same-instant right (inclusive bound, like the
    // reference's store-then-drain handler order)
    val taggedL = left.select(resolved(left, leftKey)._1.as("__k"), left(leftTsNs).as("__ts"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val taggedR = right.select(resolved(right, rightKey)._1.as("__k"), right(rightTsNs).as("__ts"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val outSchema = StructType(lType.fields ++ rType.fields)
    // final xxhash64 sort key: with duplicate right timestamps on a key the
    // "latest" is otherwise whichever row the shuffle happened to order last
    // — hash of the payload makes the winner deterministic across runs.
    // xxhash64 hashes the structs directly; a to_json render here would pay
    // a full JSON serialization of both payloads per row in the sort
    val sorted = taggedR.unionByName(taggedL)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ts"), col("__side"),
        xxhash64(col("__l"), col("__r")))

    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var haveKey = false
      var lastRight: Row = null
      var lastRightTs = Long.MinValue
      rows.flatMap { r =>
        val k = r.get(0)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true; lastRight = null; lastRightTs = Long.MinValue
        }
        val ts = r.getLong(1)
        if (r.getInt(2) == 0) { // right: becomes the latest value for the key
          lastRight = r.getStruct(4); lastRightTs = ts
          None
        } else { // left: probe the latest right within the window
          if (lastRight != null && ts - lastRightTs <= windowNs) {
            val l = r.getStruct(3)
            val vals = new Array[Any](outSchema.length)
            var i = 0
            while (i < lType.length) { vals(i) = l.get(i); i += 1 }
            var j = 0
            while (j < rType.length) { vals(i + j) = lastRight.get(j); j += 1 }
            Some(new GenericRowWithSchema(vals, outSchema): Row)
          } else None
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Compose-built-ins variant: range join then keep the latest right per
    * left row (`leftId` must be unique). Cross-checks sortMerge in tests. */
  def viaWindow(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTsNs: String, rightTsNs: String,
                windowNs: Long, leftId: String,
                leftOut: Seq[Projection], rightOut: Seq[Projection]): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val cond = col(s"l.$leftKey") === col(s"r.$rightKey") &&
      col(s"r.$rightTsNs") <= col(s"l.$leftTsNs") &&
      col(s"l.$leftTsNs") - col(s"r.$rightTsNs") <= windowNs
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTsNs").desc)
    l.join(r, cond, "inner")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(leftOut.map(p => col(s"l.${p.field}").as(p.as)) ++
        rightOut.map(p => col(s"r.${p.field}").as(p.as)): _*)
  }
}
