package graft.types

import org.apache.spark.sql.types._

/** The engine's internal 7-type lattice and source-schema building — the
  * reference's "Kafka types" layer (glassflow-api/internal/constants.go:78-86,
  * internal/kafka_types.go:6-25): precision spellings normalize to
  * `string | bool | int | uint | float | array | map`, and a pipeline's
  * declared `schema_fields` become the StructType used by from_json.
  */
object EngineSchema {

  final case class SchemaException(msg: String) extends RuntimeException(msg)

  /** NormalizeToBasicKafkaType: int8..int64→int, uint8..64→uint,
    * float32/64→float, bytes→string. */
  def normalize(t: String): String = t.trim.toLowerCase match {
    case "int8" | "int16" | "int32" | "int64" | "int" | "integer" => "int"
    case "uint8" | "uint16" | "uint32" | "uint64" | "uint" => "uint"
    case "float32" | "float64" | "float" | "double" | "number" => "float"
    case "bytes" | "string" => "string"
    case "bool" | "boolean" => "bool"
    case "array" => "array"
    case "map" | "object" => "map"
    case "null" => "null"
    case other => throw SchemaException(s"unknown engine type: $other")
  }

  /** Basic engine type → Spark type. `uint` stays LongType (range-checked at
    * the sink, where UInt64 widens to Decimal(20,0) — CHType.CHUInt). */
  def sparkType(t: String): DataType = normalize(t) match {
    case "string" => StringType
    case "bool" => BooleanType
    case "int" | "uint" => LongType
    case "float" => DoubleType
    case "array" => ArrayType(StringType)
    case "map" => MapType(StringType, StringType)
    case "null" => NullType
    case other => throw SchemaException(s"no spark type for: $other")
  }

  /** Declared source schema (pipeline config `schema_fields`,
    * internal/models/configs.go:36-41) → StructType for from_json. */
  def structFor(fields: Seq[(String, String)]): StructType =
    StructType(fields.map { case (name, t) => StructField(name, sparkType(t)) })

  /** Backward-compatibility check for schema evolution (reference
    * schema_v2/validate.go:35-62): every previous field must still exist
    * with the same normalized type. */
  def isBackwardCompatible(prev: Seq[(String, String)], next: Seq[(String, String)]): Boolean = {
    val nextMap = next.map { case (n, t) => n -> normalize(t) }.toMap
    prev.forall { case (n, t) => nextMap.get(n).contains(normalize(t)) }
  }
}
