package graft.sources

/** Minimal protobuf wire-format → OTLP/JSON decoder for the three OTLP
  * export requests (logs / traces / metrics). This is what lets the HTTP
  * receiver accept an OpenTelemetry collector's `otlphttp` exporter in its
  * DEFAULT encoding (protobuf) — not just `encoding: json`.
  *
  * Schema-driven: each message is a field-number → (jsonName, type,
  * repeated) table transcribed from the public opentelemetry-proto
  * definitions (opentelemetry/proto/{common,resource,logs,trace,metrics}/v1).
  * The output follows the OTLP JSON mapping the flatteners
  * already consume: camelCase names, 64-bit ints as strings, enums as
  * integers, byte ids as lowercase hex, packed numeric arrays as JSON
  * arrays. Unknown fields (exemplars, future additions) are skipped by
  * wire type — a decoder must tolerate schema growth.
  *
  * The decoder is a few hundred lines instead of a generated stub because
  * this build takes no dependencies beyond Spark; the wire format itself
  * (varint / fixed64 / length-delimited / fixed32) is small and stable.
  */
object OtlpProto {

  // ---- field types ----
  sealed trait FType
  case object FString extends FType
  case object FBool extends FType            // varint → true/false
  case object FInt extends FType             // varint → JSON number (enums, uint32)
  case object FSInt extends FType            // zigzag varint → JSON number
  case object FU64Str extends FType          // fixed64 or varint → JSON string (u64)
  case object FI64Str extends FType          // sfixed64 or varint → JSON string (i64)
  case object FDouble extends FType          // fixed64 bits → JSON number
  case object FHex extends FType             // bytes → lowercase hex string
  case object FPackedU64 extends FType       // packed fixed64 → array of strings
  case object FPackedVarint extends FType    // packed varint → array of strings
  case object FPackedDouble extends FType    // packed double → array of numbers
  final case class FMsg(schema: () => Schema) extends FType

  final case class Field(name: String, tpe: FType, repeated: Boolean = false)
  final case class Schema(fields: Map[Int, Field])

  private def msg(s: => Schema) = FMsg(() => s)

  // ---- opentelemetry/proto/common/v1/common.proto ----
  lazy val anyValue: Schema = Schema(Map(
    1 -> Field("stringValue", FString),
    2 -> Field("boolValue", FBool),
    3 -> Field("intValue", FI64Str),
    4 -> Field("doubleValue", FDouble),
    5 -> Field("arrayValue", msg(arrayValue)),
    6 -> Field("kvlistValue", msg(kvList)),
    7 -> Field("bytesValue", FHex)))
  lazy val arrayValue: Schema = Schema(Map(
    1 -> Field("values", msg(anyValue), repeated = true)))
  lazy val kvList: Schema = Schema(Map(
    1 -> Field("values", msg(keyValue), repeated = true)))
  lazy val keyValue: Schema = Schema(Map(
    1 -> Field("key", FString),
    2 -> Field("value", msg(anyValue))))
  lazy val scope: Schema = Schema(Map(
    1 -> Field("name", FString),
    2 -> Field("version", FString),
    3 -> Field("attributes", msg(keyValue), repeated = true),
    4 -> Field("droppedAttributesCount", FInt)))

  // ---- opentelemetry/proto/resource/v1/resource.proto ----
  lazy val resource: Schema = Schema(Map(
    1 -> Field("attributes", msg(keyValue), repeated = true),
    2 -> Field("droppedAttributesCount", FInt)))

  // ---- opentelemetry/proto/logs/v1/logs.proto ----
  lazy val logRecord: Schema = Schema(Map(
    1 -> Field("timeUnixNano", FU64Str),
    2 -> Field("severityNumber", FInt),
    3 -> Field("severityText", FString),
    5 -> Field("body", msg(anyValue)),
    6 -> Field("attributes", msg(keyValue), repeated = true),
    7 -> Field("droppedAttributesCount", FInt),
    8 -> Field("flags", FInt),
    9 -> Field("traceId", FHex),
    10 -> Field("spanId", FHex),
    11 -> Field("observedTimeUnixNano", FU64Str),
    12 -> Field("eventName", FString)))
  lazy val scopeLogs: Schema = Schema(Map(
    1 -> Field("scope", msg(scope)),
    2 -> Field("logRecords", msg(logRecord), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val resourceLogs: Schema = Schema(Map(
    1 -> Field("resource", msg(resource)),
    2 -> Field("scopeLogs", msg(scopeLogs), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val exportLogs: Schema = Schema(Map(
    1 -> Field("resourceLogs", msg(resourceLogs), repeated = true)))

  // ---- opentelemetry/proto/trace/v1/trace.proto ----
  lazy val spanEvent: Schema = Schema(Map(
    1 -> Field("timeUnixNano", FU64Str),
    2 -> Field("name", FString),
    3 -> Field("attributes", msg(keyValue), repeated = true),
    4 -> Field("droppedAttributesCount", FInt)))
  lazy val spanLink: Schema = Schema(Map(
    1 -> Field("traceId", FHex),
    2 -> Field("spanId", FHex),
    3 -> Field("traceState", FString),
    4 -> Field("attributes", msg(keyValue), repeated = true),
    5 -> Field("droppedAttributesCount", FInt),
    6 -> Field("flags", FInt)))
  lazy val spanStatus: Schema = Schema(Map(
    2 -> Field("message", FString),
    3 -> Field("code", FInt)))
  lazy val span: Schema = Schema(Map(
    1 -> Field("traceId", FHex),
    2 -> Field("spanId", FHex),
    3 -> Field("traceState", FString),
    4 -> Field("parentSpanId", FHex),
    5 -> Field("name", FString),
    6 -> Field("kind", FInt),
    7 -> Field("startTimeUnixNano", FU64Str),
    8 -> Field("endTimeUnixNano", FU64Str),
    9 -> Field("attributes", msg(keyValue), repeated = true),
    10 -> Field("droppedAttributesCount", FInt),
    11 -> Field("events", msg(spanEvent), repeated = true),
    12 -> Field("droppedEventsCount", FInt),
    13 -> Field("links", msg(spanLink), repeated = true),
    14 -> Field("droppedLinksCount", FInt),
    15 -> Field("status", msg(spanStatus)),
    16 -> Field("flags", FInt)))
  lazy val scopeSpans: Schema = Schema(Map(
    1 -> Field("scope", msg(scope)),
    2 -> Field("spans", msg(span), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val resourceSpans: Schema = Schema(Map(
    1 -> Field("resource", msg(resource)),
    2 -> Field("scopeSpans", msg(scopeSpans), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val exportTraces: Schema = Schema(Map(
    1 -> Field("resourceSpans", msg(resourceSpans), repeated = true)))

  // ---- opentelemetry/proto/metrics/v1/metrics.proto ----
  lazy val numberDp: Schema = Schema(Map(
    7 -> Field("attributes", msg(keyValue), repeated = true),
    2 -> Field("startTimeUnixNano", FU64Str),
    3 -> Field("timeUnixNano", FU64Str),
    4 -> Field("asDouble", FDouble),
    6 -> Field("asInt", FI64Str),
    8 -> Field("flags", FInt)))           // 5 = exemplars: skipped
  lazy val histogramDp: Schema = Schema(Map(
    9 -> Field("attributes", msg(keyValue), repeated = true),
    2 -> Field("startTimeUnixNano", FU64Str),
    3 -> Field("timeUnixNano", FU64Str),
    4 -> Field("count", FU64Str),
    5 -> Field("sum", FDouble),
    6 -> Field("bucketCounts", FPackedU64),
    7 -> Field("explicitBounds", FPackedDouble),
    10 -> Field("flags", FInt),
    11 -> Field("min", FDouble),
    12 -> Field("max", FDouble)))         // 8 = exemplars: skipped
  lazy val expBuckets: Schema = Schema(Map(
    1 -> Field("offset", FSInt),
    2 -> Field("bucketCounts", FPackedVarint)))
  lazy val expHistogramDp: Schema = Schema(Map(
    1 -> Field("attributes", msg(keyValue), repeated = true),
    2 -> Field("startTimeUnixNano", FU64Str),
    3 -> Field("timeUnixNano", FU64Str),
    4 -> Field("count", FU64Str),
    5 -> Field("sum", FDouble),
    6 -> Field("scale", FSInt),
    7 -> Field("zeroCount", FU64Str),
    8 -> Field("positive", msg(expBuckets)),
    9 -> Field("negative", msg(expBuckets)),
    10 -> Field("flags", FInt),
    12 -> Field("min", FDouble),
    13 -> Field("max", FDouble)))         // 11 = exemplars: skipped
  lazy val quantileValue: Schema = Schema(Map(
    1 -> Field("quantile", FDouble),
    2 -> Field("value", FDouble)))
  lazy val summaryDp: Schema = Schema(Map(
    7 -> Field("attributes", msg(keyValue), repeated = true),
    2 -> Field("startTimeUnixNano", FU64Str),
    3 -> Field("timeUnixNano", FU64Str),
    4 -> Field("count", FU64Str),
    5 -> Field("sum", FDouble),
    6 -> Field("quantileValues", msg(quantileValue), repeated = true),
    8 -> Field("flags", FInt)))
  lazy val gauge: Schema = Schema(Map(
    1 -> Field("dataPoints", msg(numberDp), repeated = true)))
  lazy val sumMetric: Schema = Schema(Map(
    1 -> Field("dataPoints", msg(numberDp), repeated = true),
    2 -> Field("aggregationTemporality", FInt),
    3 -> Field("isMonotonic", FBool)))
  lazy val histogram: Schema = Schema(Map(
    1 -> Field("dataPoints", msg(histogramDp), repeated = true),
    2 -> Field("aggregationTemporality", FInt)))
  lazy val expHistogram: Schema = Schema(Map(
    1 -> Field("dataPoints", msg(expHistogramDp), repeated = true),
    2 -> Field("aggregationTemporality", FInt)))
  lazy val summary: Schema = Schema(Map(
    1 -> Field("dataPoints", msg(summaryDp), repeated = true)))
  lazy val metric: Schema = Schema(Map(
    1 -> Field("name", FString),
    2 -> Field("description", FString),
    3 -> Field("unit", FString),
    5 -> Field("gauge", msg(gauge)),
    7 -> Field("sum", msg(sumMetric)),
    9 -> Field("histogram", msg(histogram)),
    10 -> Field("exponentialHistogram", msg(expHistogram)),
    11 -> Field("summary", msg(summary)),
    12 -> Field("metadata", msg(keyValue), repeated = true)))
  lazy val scopeMetrics: Schema = Schema(Map(
    1 -> Field("scope", msg(scope)),
    2 -> Field("metrics", msg(metric), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val resourceMetrics: Schema = Schema(Map(
    1 -> Field("resource", msg(resource)),
    2 -> Field("scopeMetrics", msg(scopeMetrics), repeated = true),
    3 -> Field("schemaUrl", FString)))
  lazy val exportMetrics: Schema = Schema(Map(
    1 -> Field("resourceMetrics", msg(resourceMetrics), repeated = true)))

  /** signal ("logs"|"traces"|"metrics") + protobuf bytes → OTLP JSON. */
  def toJson(signal: String, bytes: Array[Byte]): String = {
    val schema = signal match {
      case "logs" => exportLogs
      case "traces" => exportTraces
      case "metrics" => exportMetrics
      case other => throw new IllegalArgumentException(s"unknown signal: $other")
    }
    val sb = new StringBuilder(bytes.length * 2 + 16)
    render(new Reader(bytes, 0, bytes.length), schema, sb)
    sb.toString
  }

  // ---- wire reader ----
  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed64(): Long = {
      var out = 0L; var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; out
    }
    def fixed32(): Int = {
      var out = 0; var i = 0
      while (i < 4) { out |= (buf(pos + i) & 0xFF) << (8 * i); i += 1 }
      pos += 4; out
    }
    def slice(len: Int): Reader = {
      // a hostile/corrupt length must fail fast, not move the cursor
      // backwards (infinite loop) or past the buffer
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(s"bad length $len at $pos/$end")
      val r = new Reader(buf, pos, pos + len); pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => slice(varint().toInt); ()
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def hex(buf: Array[Byte], from: Int, until: Int): String = {
    val sb = new StringBuilder((until - from) * 2)
    var i = from
    while (i < until) { sb.append(f"${buf(i) & 0xFF}%02x"); i += 1 }
    sb.toString
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Render double like JSON expects (no trailing .0 loss concerns — Spark
    * reads any JSON number). NaN/±Inf have no JSON number form and would
    * poison the downstream double cast — render as null (value absent). */
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Decode one message per `schema`, appending a JSON object to `sb`.
    * Repeated fields accumulate in encounter order; scalar fields take the
    * last occurrence (proto3 semantics). */
  private def render(r: Reader, schema: Schema, sb: StringBuilder): Unit = {
    // collect field values as rendered JSON fragments, preserving schema
    // declaration independence from wire order
    val singles = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val repeats = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[String]]
    // packed primitives accumulate ELEMENTS (a packed field may legally be
    // split across chunks, and pre-packed encoders emit one element per tag)
    val packed = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[String]]
    while (r.hasMore) {
      val tag = r.varint()
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      schema.fields.get(fieldNo) match {
        case None => r.skip(wire)
        case Some(Field(name, tpe, repeated)) =>
          def put(json: String): Unit =
            if (repeated) repeats.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty) += json
            else singles(name) = json
          tpe match {
            case FString =>
              val len = r.varint().toInt; val s = r.slice(len)
              put("\"" + escape(new String(s.buf, s.pos, len, "UTF-8")) + "\"")
            case FHex =>
              val len = r.varint().toInt; val s = r.slice(len)
              put("\"" + hex(s.buf, s.pos, s.end) + "\"")
            case FBool => put(if (r.varint() != 0L) "true" else "false")
            case FInt =>
              // uint32 fields are varints, but flags on LogRecord/Span/Link
              // are declared fixed32 — decode by the ACTUAL wire type
              val v = wire match {
                case 5 => r.fixed32().toLong & 0xFFFFFFFFL
                case 1 => r.fixed64()
                case _ => r.varint()
              }
              put(v.toString)
            case FSInt => put(zigzag(r.varint()).toString)
            case FU64Str =>
              val v = if (wire == 1) r.fixed64() else r.varint()
              put("\"" + java.lang.Long.toUnsignedString(v) + "\"")
            case FI64Str =>
              val v = if (wire == 1) r.fixed64() else r.varint()
              put("\"" + v.toString + "\"")
            case FDouble =>
              val v = wire match {
                case 1 => java.lang.Double.longBitsToDouble(r.fixed64())
                case 5 => java.lang.Float.intBitsToFloat(r.fixed32()).toDouble
                case _ => r.varint().toDouble
              }
              put(num(v))
            case FPackedU64 =>
              val acc = packed.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty)
              if (wire == 2) {
                val len = r.varint().toInt; val s = r.slice(len)
                while (s.hasMore) acc += "\"" + java.lang.Long.toUnsignedString(s.fixed64()) + "\""
              } else acc += "\"" + java.lang.Long.toUnsignedString(r.fixed64()) + "\""
            case FPackedVarint =>
              val acc = packed.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty)
              if (wire == 2) {
                val len = r.varint().toInt; val s = r.slice(len)
                while (s.hasMore) acc += "\"" + java.lang.Long.toUnsignedString(s.varint()) + "\""
              } else acc += "\"" + java.lang.Long.toUnsignedString(r.varint()) + "\""
            case FPackedDouble =>
              val acc = packed.getOrElseUpdate(name, scala.collection.mutable.ArrayBuffer.empty)
              if (wire == 2) {
                val len = r.varint().toInt; val s = r.slice(len)
                while (s.hasMore) acc += num(java.lang.Double.longBitsToDouble(s.fixed64()))
              } else acc += num(java.lang.Double.longBitsToDouble(r.fixed64()))
            case FMsg(sub) =>
              val len = r.varint().toInt
              val nested = new StringBuilder
              render(r.slice(len), sub(), nested)
              put(nested.toString)
          }
      }
    }
    sb.append('{')
    var first = true
    def emit(name: String, json: String): Unit = {
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(name).append("\":").append(json)
    }
    singles.foreach { case (n, j) => emit(n, j) }
    repeats.foreach { case (n, vs) => emit(n, vs.mkString("[", ",", "]")) }
    packed.foreach { case (n, vs) => emit(n, vs.mkString("[", ",", "]")) }
    sb.append('}')
  }
}
