package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.coalesce
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

import graft.exprs.ExprCompiler

/** Stateless transform — the reference's projection stage
  * (glassflow-api/internal/transformer/json/transformation.go:50-131;
  * config model internal/models/configs.go:434-451). The output contains
  * ONLY the computed columns (a full reshape, not an augment), each cast to
  * its declared output type. Compiles to a single `select`, so Catalyst
  * prunes every unreferenced input column down to the scan.
  */
object TransformOp {

  /** One `{expression, output_name, output_type}` rule. Output types are the
    * reference's convertType domain: string, int, int64, float64, bool,
    * []string (transformation.go:102-131). */
  final case class Rule(expression: String, outputName: String, outputType: String)

  def sparkType(outputType: String): DataType = outputType match {
    case "string" => StringType
    case "int" | "int64" | "uint" | "uint64" => LongType
    case "int32" | "uint32" => IntegerType
    case "float64" | "float" | "float32" => DoubleType
    case "bool" => BooleanType
    case "[]string" => ArrayType(StringType)
    case other => throw new IllegalArgumentException(s"unsupported output type: $other")
  }

  def columns(rules: Seq[Rule], schema: StructType): Seq[Column] =
    rules.map { r =>
      val c = ExprCompiler.compile(r.expression, schema)
      val target = sparkType(r.outputType)
      // errors → zero value is only guaranteed by the to* functions; a plain
      // cast keeps null (the reference forwards conversion errors to DLQ —
      // callers that need that split use TransformOp.partitionErrors)
      c.try_cast(target).as(r.outputName)
    }

  def apply(rules: Seq[Rule])(df: DataFrame): DataFrame =
    df.select(columns(rules, df.schema): _*)

  /** DLQ split: rows where any rule produced NULL from a NON-null expression
    * evaluation failure are routed to the error frame. */
  def partitionErrors(rules: Seq[Rule])(df: DataFrame): (DataFrame, DataFrame) = {
    val out = apply(rules)(df)
    val anyNull = rules.map(r => out(r.outputName).isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    (out.filter(!coalesce(anyNull, lit(false))), out.filter(anyNull))
  }
}
