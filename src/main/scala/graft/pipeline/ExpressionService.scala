package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.exprs.ExprCompiler
import graft.operators.TransformOp

/** The expression evaluation / validation API surface — entry point 3 of
  * the reference (SURVEY.md §3.3):
  *
  *  - POST /transform/expression/evaluate → compile + run a transform list
  *    against one sample JSON document, return the transformed JSON
  *    (reference internal/api/evaluate_transform.go:39-70)
  *  - POST /filter/validate → compile + type-check a filter expression
  *    against declared fields (internal/api/validate_filter.go)
  *
  * Spark gives "compile + run on a sample" for free: parse the sample into
  * a 1-row local DataFrame and run the same Catalyst plan the pipeline
  * would run — identical semantics to production by construction.
  */
object ExpressionService {

  /** Evaluate transform rules against one sample JSON document; returns the
    * transformed row as JSON, or Left(compile/analysis error). */
  def evaluateTransform(spark: SparkSession, rules: Seq[TransformOp.Rule],
                        sampleJson: String): Either[String, String] = {
    try {
      import spark.implicits._
      val sample = spark.read.json(Seq(sampleJson).toDS)
      val out = TransformOp(rules)(sample)
      Right(out.toJSON.head())
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString))
    }
  }

  /** Validate a filter expression against a declared schema (compile only —
    * analysis errors surface eagerly, like expr.Compile in the reference). */
  def validateFilter(expression: String, schema: StructType): Either[String, Unit] =
    ExprCompiler.validate(expression, schema)

  /** Evaluate a filter against one sample JSON document. */
  def evaluateFilter(spark: SparkSession, expression: String,
                     sampleJson: String): Either[String, Boolean] = {
    try {
      import spark.implicits._
      val sample = spark.read.json(Seq(sampleJson).toDS)
      Right(sample.filter(ExprCompiler.compile(expression, sample.schema)).count() == 1)
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString))
    }
  }
}
