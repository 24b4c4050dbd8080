package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.exprs.ExprCompiler
import graft.types.{CHCast, CHType}

/** Field mapper — the reference sink's JSON→ClickHouse column mapping
  * (glassflow-api/internal/mapper/mapper.go:37-121): per-column
  * {source field, target column, ClickHouse type}, with dotted source names
  * resolved literal-first then as nested paths, and the ConvertValue matrix
  * applied per value. One `select`, fully codegen'd; deterministic column
  * order comes from the mapping list itself (mapper.go:43-47 sorts — we keep
  * the user's declared order, which is also deterministic).
  */
object SinkMapper {

  /** `{ source_id.field → column : type }` rule (configs.go:375-427). */
  final case class ColumnMapping(sourceField: String, column: String, chType: String)

  private def sourceCol(m: ColumnMapping, df: DataFrame): Option[(Column, org.apache.spark.sql.types.DataType)] =
    try {
      val (c, dt) = ExprCompiler.resolve(m.sourceField.split('.').toSeq, df.schema)
      Some((c, dt.getOrElse(org.apache.spark.sql.types.StringType)))
    } catch { case _: Exception => None }

  /** A mapping whose source field is absent from the batch entirely inserts
    * NULL — except Map targets, which insert an empty map (Maps cannot be
    * NULL in ClickHouse) — exactly the reference mapper's absent-field
    * path (mapper.go:100-118; sink.feature "Import events with Nullable
    * string" relies on it). Config-time strictness lives in [[validate]]. */
  def columns(mappings: Seq[ColumnMapping], df: DataFrame): Seq[Column] =
    mappings.map { m =>
      sourceCol(m, df) match {
        case Some((src, dt)) =>
          CHCast.convert(src, dt, CHType.parse(m.chType)).as(m.column)
        case None =>
          (CHType.parse(m.chType) match {
            case t if isMapTarget(t) =>
              typedLit(Map.empty[String, String]).cast(t.sparkType)
            case t => lit(null).cast(t.sparkType)
          }).as(m.column)
      }
    }

  private def isMapTarget(t: graft.types.CHType): Boolean = t match {
    case CHType.CHMap(_, _) => true
    case CHType.CHLowCardinality(i) => isMapTarget(i)
    case CHType.CHNullable(i) => isMapTarget(i)
    case _ => false
  }

  def apply(mappings: Seq[ColumnMapping])(df: DataFrame): DataFrame =
    df.select(columns(mappings, df): _*)

  /** DLQ split: a conversion error is source-not-null ∧ mapped-null
    * (reference routes ConvertValue errors to DLQ, sink/clickhouse.go:426-481).
    * Returns (good rows in target shape, failed rows in source shape). */
  def partitionErrors(mappings: Seq[ColumnMapping])(df: DataFrame): (DataFrame, DataFrame) = {
    val errFlags = mappings.flatMap { m =>
      // absent fields never error (reference inserts NULL silently)
      sourceCol(m, df).map { case (src, dt) =>
        val out = CHCast.convert(src, dt, CHType.parse(m.chType))
        src.isNotNull && out.isNull
      }
    }
    val anyErr = errFlags.reduceOption(_ || _).getOrElse(lit(false))
    val flagged = df.withColumn("__graft_err", coalesce(anyErr, lit(false)))
    val good = flagged.filter(!col("__graft_err")).drop("__graft_err")
    val bad = flagged.filter(col("__graft_err")).drop("__graft_err")
    (apply(mappings)(good), bad)
  }

  /** Config validation (control plane): all CH types parse + all source
    * fields resolve (reference clickhouse_validate.go:15-61). */
  def validate(mappings: Seq[ColumnMapping], schema: org.apache.spark.sql.types.StructType): Either[String, Unit] = {
    val errors = mappings.flatMap { m =>
      val typeErr =
        try { CHType.parse(m.chType); None }
        catch { case e: Exception => Some(s"${m.column}: ${e.getMessage}") }
      val fieldErr =
        try { ExprCompiler.resolve(m.sourceField.split('.').toSeq, schema); None }
        catch { case e: Exception => Some(s"${m.column}: ${e.getMessage}") }
      typeErr.toSeq ++ fieldErr.toSeq
    }
    if (errors.isEmpty) Right(()) else Left(errors.mkString("; "))
  }
}
