package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Versioned transform router — F3
  * (glassflow-api/internal/transformer/versioned/versioned_transformation.go:
  * 60-115): each row carries a schema-version id; the transform rules for
  * that version apply; versions with no configured rules pass through
  * unchanged (bypass).
  *
  * Spark shape: a union of per-version branches. Catalyst prunes each
  * branch's columns independently and the version predicate reaches the
  * scan, so a 100-TB table with one hot version reads only that version's
  * row groups where the source is partitioned/clustered by version.
  * (The reference instead caches one compiled program per version and
  * dispatches per message.)
  */
object VersionedTransform {

  /** @param versionCol   column holding the schema-version id
    * @param rulesByVersion transform rules per version id
    * @param passthrough  when true, rows with unknown versions pass through
    *                     with null-padded output columns (reference bypass);
    *                     when false they are dropped */
  def apply(versionCol: String,
            rulesByVersion: Map[String, Seq[TransformOp.Rule]],
            passthrough: Boolean = false)(df: DataFrame): DataFrame = {
    require(rulesByVersion.nonEmpty, "at least one version required")
    // all versions must produce the same output shape: the union of output
    // names, each cast to its declared type (missing in a version → null)
    val allOutputs: Seq[(String, String)] = rulesByVersion.values.flatten
      .map(r => r.outputName -> r.outputType).toSeq.distinct
    require(allOutputs.map(_._1).distinct.length == allOutputs.length,
      "conflicting output types across versions")

    def branch(version: String, rules: Seq[TransformOp.Rule]): DataFrame = {
      val byName = rules.map(r => r.outputName -> r).toMap
      val part = df.filter(col(versionCol) === version)
      val cols = allOutputs.map { case (name, tpe) =>
        byName.get(name) match {
          case Some(r) => TransformOp.columns(Seq(r), df.schema).head
          case None => lit(null).cast(TransformOp.sparkType(tpe)).as(name)
        }
      }
      part.select(col(versionCol).as("__version") +: cols: _*)
    }

    val known = rulesByVersion.map { case (v, rules) => branch(v, rules) }
      .reduce(_ unionByName _)
    if (!passthrough) known.withColumnRenamed("__version", versionCol)
    else {
      val unknown = df
        .filter(!col(versionCol).isInCollection(rulesByVersion.keys.toSeq))
        .select(col(versionCol).as("__version") +:
          allOutputs.map { case (n, t) =>
            lit(null).cast(TransformOp.sparkType(t)).as(n)
          }: _*)
      known.unionByName(unknown).withColumnRenamed("__version", versionCol)
    }
  }
}
