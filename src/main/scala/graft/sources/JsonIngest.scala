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
    * and `__corrupt` (true when the payload failed to parse). */
  def parse(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn("__parsed",
      from_json(col(jsonCol), schema, Map("mode" -> "PERMISSIVE")))
    // from_json yields a null struct (or all-null fields) on corrupt input;
    // a row is corrupt if parsing nulled every declared field while the raw
    // payload was non-null
    val allNull = schema.fieldNames
      .map(f => col("__parsed").getField(f).isNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    parsed
      .withColumn("__corrupt", col(jsonCol).isNotNull && (col("__parsed").isNull || allNull))
      .withColumn("__raw", col(jsonCol))
      .select(schema.fieldNames.map(f => col("__parsed").getField(f).as(f)) :+
        col("__raw") :+ col("__corrupt"): _*)
  }

  /** Full ingest split: (valid rows with schema columns, DLQ rows). */
  def ingest(df: DataFrame, jsonCol: String, schema: StructType): (DataFrame, DataFrame) = {
    val parsed = parse(df, jsonCol, schema)
    (parsed.filter(!col("__corrupt")).drop("__corrupt", "__raw"),
      parsed.filter(col("__corrupt")).select(col("__raw")))
  }
}
