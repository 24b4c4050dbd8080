package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side schema handling — the reference's ingestor processor
  * (glassflow-api/internal/ingestor/processor.go:178-239):
  *
  *  - strip the Confluent Schema Registry wire-format prefix
  *    `[0x00][uint32 BE schema-id]` when present
  *    (internal/schema_v2/schema.go:180-190)
  *  - parse JSON against the declared StructType — ONE parse per row total,
  *    vs. the reference's parse-per-stage (a real win: SURVEY.md §4)
  *  - rows that fail schema validation split to the DLQ frame instead of
  *    failing the stream ("poison records never stop the pipeline")
  */
object JsonIngest {

  /** Wire-format handling on a binary Kafka `value` column: returns
    * (payload string column, schema-id column — null when unframed). */
  def stripSchemaRegistryPrefix(value: Column): (Column, Column) = {
    val framed = length(value) >= 5 && substring(value, 1, 1) === lit(Array[Byte](0))
    val schemaId = when(framed,
      conv(hex(substring(value, 2, 4)), 16, 10).cast(LongType))
    val payload = when(framed, substring(value, 6, Int.MaxValue).cast(StringType))
      .otherwise(value.cast(StringType))
    (payload, schemaId)
  }

  /** Parse + validate a JSON string column against the declared schema.
    * Output columns: the schema's fields, plus `__raw` (original payload)
    * and `__corrupt` (true when the payload failed validation).
    *
    * Corrupt means: malformed JSON or a type-mismatched declared field
    * (both land in from_json's corrupt-record column under PERMISSIVE —
    * the reference fails validation on any bad field type,
    * schema_v2/validate.go:186-196), or a syntactically valid object
    * containing NONE of the declared fields (missing fields fail reference
    * validation, validate.go:221). A record whose declared fields are
    * present but null is NOT corrupt — from_json cannot distinguish
    * explicit null from absent, so presence is checked via
    * json_object_keys only on the rare all-null rows (the && short-circuits
    * in codegen; the second parse never runs on the hot path).
    *
    * `keep` names source columns carried through UNCHANGED alongside the
    * parsed fields — Kafka lineage/meta columns (timestamp, partition,
    * offset) that downstream dedup windows and audit trails need; the
    * reference's processor passes its message context the same way. */
  def parse(df: DataFrame, jsonCol: String, schema: StructType,
            keep: Seq[String] = Nil): DataFrame = {
    val corruptField = "__corrupt_rec"
    val parseSchema = StructType(schema.fields :+ StructField(corruptField, StringType))
    val parsed = df.withColumn("__parsed",
      from_json(col(jsonCol), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptField)))
    val allNull = schema.fieldNames
      .map(f => col("__parsed").getField(f).isNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    // dotted names resolve literal-first then nested (mapper.go:100-118),
    // so either the literal key or its root segment counts as present
    val declaredKeys = schema.fieldNames.flatMap(f => Seq(f, f.split('.').head)).distinct.toSeq
    val anyDeclaredKey = arrays_overlap(
      json_object_keys(col(jsonCol)), array(declaredKeys.map(lit): _*))
    parsed
      .withColumn("__corrupt", col(jsonCol).isNotNull && (
        col("__parsed").isNull ||
          col("__parsed").getField(corruptField).isNotNull ||
          (allNull && !coalesce(anyDeclaredKey, lit(false)))))
      .withColumn("__raw", col(jsonCol))
      .select(schema.fieldNames.map(f => col("__parsed").getField(f).as(f)) ++
        keep.map(col) :+ col("__raw") :+ col("__corrupt"): _*)
  }

  /** Narrow a declared schema to the fields a pipeline actually references
    * (sink mappings + expressions). from_json's cost is dominated by value
    * materialization per declared field: parsing 12 of 35 fields of a
    * 1.5 KB record is the single biggest ingest-throughput lever, and the
    * JSON schema pruning the optimizer does cannot help unless the
    * StructType itself is narrowed. */
  def pruneSchema(schema: StructType, needed: Seq[String]): StructType = {
    val keep = needed.flatMap(f => Seq(f, f.split('.').head)).toSet
    StructType(schema.fields.filter(f => keep.contains(f.name)))
  }

  /** Full ingest split: (valid rows with schema [+ kept] columns, DLQ
    * rows — the raw payload plus any kept lineage columns). */
  def ingest(df: DataFrame, jsonCol: String, schema: StructType,
             keep: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val parsed = parse(df, jsonCol, schema, keep)
    (parsed.filter(!col("__corrupt")).drop("__corrupt", "__raw"),
      parsed.filter(col("__corrupt")).select(col("__raw") +: keep.map(col): _*))
  }
}
