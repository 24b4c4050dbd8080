package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTLP flatteners — the reference's OTLP receiver processors re-expressed
  * as explode chains (glassflow-api/internal/otlp-receiver/server/processor/
  * flattener/{logs,traces,metrics}.go; output schemas
  * internal/models/otlp.go:174-245).
  *
  * Input: a DataFrame holding the standard OTLP JSON export shape
  * (resourceLogs / resourceSpans / resourceMetrics nested arrays, as
  * produced by `spark.read.json` over collector exports). Output: one row
  * per log record / span / data point, with attribute lists collapsed to
  * `map<string,string>` (AnyValue scalars formatted, complex values
  * JSON-encoded — flattener/logs.go:16-97) and nanosecond timestamps
  * rendered RFC3339.
  *
  * Everything is generate/explode + projections: Catalyst prunes unused
  * branches and the explodes run inside codegen — no per-record interpreter.
  */
object OtlpFlatten {

  /** OTLP AnyValue struct → string (scalars formatted, arrays/kvlists
    * JSON-encoded — flattener/logs.go AnyValue coercion). Tolerant of
    * whichever variant fields exist in the input schema. */
  private def anyValueToString(v: Column, vType: DataType): Column = {
    val st = vType match { case s: StructType => s; case _ => return v.cast(StringType) }
    def has(f: String) = st.fieldNames.contains(f)
    val candidates = Seq(
      if (has("stringValue")) Some(v.getField("stringValue")) else None,
      if (has("intValue")) Some(v.getField("intValue").cast(StringType)) else None,
      if (has("doubleValue")) Some(v.getField("doubleValue").cast(StringType)) else None,
      if (has("boolValue")) Some(v.getField("boolValue").cast(StringType)) else None,
      if (has("arrayValue")) Some(to_json(v.getField("arrayValue"))) else None,
      if (has("kvlistValue")) Some(to_json(v.getField("kvlistValue"))) else None
    ).flatten
    if (candidates.isEmpty) to_json(v) else coalesce(candidates: _*)
  }

  /** KeyValue list column → map<string,string>. */
  def attrsToMap(attrs: Column, attrsType: DataType): Column = attrsType match {
    case ArrayType(st: StructType, _) =>
      val vType = st.fields.find(_.name == "value").map(_.dataType).getOrElse(StringType)
      map_from_entries(transform(attrs,
        kv => struct(kv.getField("key").as("key"),
          anyValueToString(kv.getField("value"), vType).as("value"))))
    case _ => lit(null).cast(MapType(StringType, StringType))
  }

  /** map<string,string> → deterministic JSON string with keys sorted
    * (array_sort over map_entries orders by the struct's first field = key).
    * Oracle-facing queries need this: hash comparison over raw map columns
    * is order-sensitive and map values aren't hashable driver-side. */
  def attrsJson(m: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(m))))

  /** Unix-nanos column (long or numeric string) → RFC3339 string with
    * microsecond precision (flattener logs.go ns→RFC3339). Division is done
    * in Decimal: a double round-trip would corrupt epoch-nanos (1.7e18 is
    * beyond double's 2^53 exact-integer range — off-by-1µs on ~half of rows). */
  def nsToRfc3339(c: Column): Column =
    date_format(timestamp_micros(
      (c.cast(DecimalType(20, 0)) / 1000).cast(LongType)),
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  private def fieldType(df: DataFrame, path: String): DataType = {
    path.split('.').foldLeft(df.schema: DataType) {
      case (s: StructType, seg) => s(seg).dataType
      case (ArrayType(s: StructType, _), seg) => s(seg).dataType
      case (other, seg) =>
        throw new IllegalArgumentException(s"cannot descend into $other at $seg")
    }
  }

  private def opt(st: StructType, name: String, otherwise: Column, c: => Column): Column =
    if (st.fieldNames.contains(name)) c else otherwise

  /** Resolve a nested path tolerantly: proto3 omits empty messages on the
    * wire, so `resource`/`scope` (and anything under them) may be absent
    * from the inferred schema entirely — a legal request must not fail
    * analysis. */
  private def fieldTypeOpt(df: DataFrame, path: String): Option[DataType] =
    try Some(fieldType(df, path)) catch { case _: IllegalArgumentException => None }

  private def attrsMapOpt(df: DataFrame, path: String): Column =
    fieldTypeOpt(df, path) match {
      case Some(t) => attrsToMap(col(path), t)
      case None => lit(null).cast(MapType(StringType, StringType))
    }

  /** Scope struct type if present, else an empty struct stand-in. */
  private def scopeType(df: DataFrame, path: String): StructType =
    fieldTypeOpt(df, path) match {
      case Some(s: StructType) => s
      case _ => StructType(Nil)
    }

  /** F4: ExportLogsServiceRequest → one row per LogRecord (14 columns,
    * models/otlp.go:174-188). */
  def logs(df: DataFrame): DataFrame = {
    val rl = df.select(explode(col("resourceLogs")).as("rl"))
    val sl = rl.select(
      attrsMapOpt(rl, "rl.resource.attributes").as("resource_attributes"),
      explode(col("rl.scopeLogs")).as("sl"))
    val scopeT = scopeType(sl, "sl.scope")
    val lr = sl.select(
      col("resource_attributes"),
      opt(scopeT, "name", lit(null).cast(StringType), col("sl.scope.name")).as("scope_name"),
      opt(scopeT, "version", lit(null).cast(StringType), col("sl.scope.version")).as("scope_version"),
      attrsMapOpt(sl, "sl.scope.attributes").as("scope_attributes"),
      explode(col("sl.logRecords")).as("lr"))
    val lrT = fieldType(lr, "lr").asInstanceOf[StructType]
    val lrAttrsT = if (lrT.fieldNames.contains("attributes")) lrT("attributes").dataType else NullType
    val bodyT = if (lrT.fieldNames.contains("body")) lrT("body").dataType else NullType
    lr.select(
      nsToRfc3339(col("lr.timeUnixNano")).as("timestamp"),
      opt(lrT, "observedTimeUnixNano", lit(null).cast(StringType),
        nsToRfc3339(col("lr.observedTimeUnixNano"))).as("observed_timestamp"),
      opt(lrT, "severityNumber", lit(0L), col("lr.severityNumber").cast(LongType)).as("severity_number"),
      opt(lrT, "severityText", lit(null).cast(StringType), col("lr.severityText")).as("severity_text"),
      (if (bodyT == NullType) lit(null).cast(StringType)
       else anyValueToString(col("lr.body"), bodyT)).as("body"),
      opt(lrT, "traceId", lit(null).cast(StringType), lower(col("lr.traceId"))).as("trace_id"),
      opt(lrT, "spanId", lit(null).cast(StringType), lower(col("lr.spanId"))).as("span_id"),
      opt(lrT, "flags", lit(0L), col("lr.flags").cast(LongType)).as("flags"),
      opt(lrT, "droppedAttributesCount", lit(0L),
        col("lr.droppedAttributesCount").cast(LongType)).as("dropped_attributes_count"),
      col("resource_attributes"),
      col("scope_name"), col("scope_version"), col("scope_attributes"),
      (if (lrAttrsT == NullType) lit(null).cast(MapType(StringType, StringType))
       else attrsToMap(col("lr.attributes"), lrAttrsT)).as("attributes"))
  }

  /** F5: one row per span; duration_ns = end − start; events/links kept as
    * arrays of structs (flattener/traces.go, models/otlp.go:109-132). */
  def traces(df: DataFrame): DataFrame = {
    val rs = df.select(explode(col("resourceSpans")).as("rs"))
    val ss = rs.select(
      attrsMapOpt(rs, "rs.resource.attributes").as("resource_attributes"),
      explode(col("rs.scopeSpans")).as("ss"))
    val scopeT = scopeType(ss, "ss.scope")
    val sp = ss.select(
      col("resource_attributes"),
      opt(scopeT, "name", lit(null).cast(StringType), col("ss.scope.name")).as("scope_name"),
      opt(scopeT, "version", lit(null).cast(StringType), col("ss.scope.version")).as("scope_version"),
      explode(col("ss.spans")).as("sp"))
    val spT = fieldType(sp, "sp").asInstanceOf[StructType]
    val spAttrsT = if (spT.fieldNames.contains("attributes")) spT("attributes").dataType else NullType
    sp.select(
      lower(col("sp.traceId")).as("trace_id"),
      lower(col("sp.spanId")).as("span_id"),
      opt(spT, "parentSpanId", lit(null).cast(StringType), lower(col("sp.parentSpanId"))).as("parent_span_id"),
      opt(spT, "traceState", lit(null).cast(StringType), col("sp.traceState")).as("trace_state"),
      opt(spT, "flags", lit(0L), col("sp.flags").cast(LongType)).as("flags"),
      col("sp.name").as("name"),
      opt(spT, "kind", lit(null).cast(StringType), col("sp.kind").cast(StringType)).as("kind"),
      nsToRfc3339(col("sp.startTimeUnixNano")).as("start_timestamp"),
      nsToRfc3339(col("sp.endTimeUnixNano")).as("end_timestamp"),
      (col("sp.endTimeUnixNano").cast(LongType) -
        col("sp.startTimeUnixNano").cast(LongType)).as("duration_ns"),
      opt(spT, "status", lit(null).cast(StringType),
        col("sp.status.code").cast(StringType)).as("status_code"),
      opt(spT, "status", lit(null).cast(StringType),
        col("sp.status.message").cast(StringType)).as("status_message"),
      opt(spT, "events", lit(null).cast(ArrayType(StringType)),
        transform(col("sp.events"), e => to_json(e))).as("events"),
      opt(spT, "links", lit(null).cast(ArrayType(StringType)),
        transform(col("sp.links"), l => to_json(l))).as("links"),
      col("resource_attributes"), col("scope_name"), col("scope_version"),
      (if (spAttrsT == NullType) lit(null).cast(MapType(StringType, StringType))
       else attrsToMap(col("sp.attributes"), spAttrsT)).as("attributes"))
  }

  /** F6: one row per metric DATA POINT — union over
    * gauge/sum/histogram/exp-histogram/summary into one wide sparse schema
    * with temporality mapped to DELTA/CUMULATIVE
    * (flattener/metrics.go:32-213). Every data point carries its OWN
    * `attributes` map and `flags` (metrics.go stamps
    * `rec.Attributes = attrsToMap(dp.GetAttributes())` / `rec.Flags` on
    * each point) alongside resource/scope attributes. Summary points
    * surface count/sum only — the reference drops quantile values
    * (flattenSummaryDataPoints, metrics.go:179-203; no quantile field in
    * models/otlp.go's OTLPMetric) and this matches that surface exactly. */
  def metrics(df: DataFrame): DataFrame = {
    val rm = df.select(explode(col("resourceMetrics")).as("rm"))
    val sm = rm.select(
      attrsMapOpt(rm, "rm.resource.attributes").as("resource_attributes"),
      explode(col("rm.scopeMetrics")).as("sm"))
    val scopeT = scopeType(sm, "sm.scope")
    val m = sm.select(col("resource_attributes"),
      opt(scopeT, "name", lit(null).cast(StringType), col("sm.scope.name")).as("scope_name"),
      opt(scopeT, "version", lit(null).cast(StringType),
        col("sm.scope.version")).as("scope_version"),
      attrsMapOpt(sm, "sm.scope.attributes").as("scope_attributes"),
      explode(col("sm.metrics")).as("m"))
    val mT = fieldType(m, "m").asInstanceOf[StructType]

    def temporality(c: Column): Column =
      when(c.cast(LongType) === 1, "DELTA")
        .when(c.cast(LongType) === 2, "CUMULATIVE")
        .otherwise("UNSPECIFIED")

    val baseCols = Seq(
      col("resource_attributes"), col("scope_name"),
      col("scope_version"), col("scope_attributes"),
      col("m.name").as("metric_name"),
      (if (mT.fieldNames.contains("description")) col("m.description")
       else lit(null).cast(StringType)).as("metric_description"),
      (if (mT.fieldNames.contains("unit")) col("m.unit")
       else lit(null).cast(StringType)).as("metric_unit"))
    def base(metricType: String) = baseCols :+ lit(metricType).as("metric_type")

    // proto3 omits default-valued fields entirely: a batch where every sum
    // is non-monotonic (or UNSPECIFIED temporality) has NO such field in
    // the inferred schema — resolve tolerantly, defaulting like the wire
    def branchField(branch: String, field: String, otherwise: Column): Column =
      fieldTypeOpt(m, s"m.$branch.$field") match {
        case Some(_) => col(s"m.$branch.$field")
        case None => otherwise
      }

    // Fused single-pass path: when every present metric-type branch carries
    // the SAME dataPoints element type — which is exactly what the
    // production parse produces (from_json / the proto decoder against the
    // declared OTLP schema unify all five shapes into one wide struct) —
    // the union-of-branches plan below would scan the source five times,
    // each pass re-evaluating the upstream. Metric types are mutually
    // exclusive per metric, so one pass with CASE dispatch + a single
    // explode(coalesce(...)) is equivalent and 5× cheaper on computed or
    // row-oriented inputs (on columnar scans the branch passes prune to
    // disjoint subtrees, so fusion matters less there).
    val branchSpecs = Seq(
      ("gauge", "gauge"), ("sum", "sum"), ("histogram", "histogram"),
      ("exponentialHistogram", "exp_histogram"), ("summary", "summary"))
      .filter { case (f, _) => mT.fieldNames.contains(f) }
    def branchTemporality(field: String): Column = field match {
      case "gauge" | "summary" => lit("UNSPECIFIED")
      case f => temporality(branchField(f, "aggregationTemporality", lit(0)))
    }
    def branchMonotonic(field: String): Column = field match {
      case "sum" => coalesce(branchField("sum", "isMonotonic", lit(false)), lit(false))
      case _ => lit(false)
    }
    // nullability differs between branches (literal nulls vs columns), so
    // compare shapes with nullability erased
    def eraseNullability(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = eraseNullability(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(eraseNullability(a.elementType), containsNull = true)
      case mp: MapType => MapType(eraseNullability(mp.keyType),
        eraseNullability(mp.valueType), valueContainsNull = true)
      case other => other
    }
    val dpElemTypes = branchSpecs
      .map { case (f, _) => fieldTypeOpt(m, s"m.$f.dataPoints").map(eraseNullability) }
    val fusable = branchSpecs.size > 1 && dpElemTypes.forall(_.isDefined) &&
      dpElemTypes.flatten.distinct.size == 1 &&
      dpElemTypes.head.get.isInstanceOf[ArrayType]

    val parts = Seq.newBuilder[DataFrame]
    if (fusable) {
      def dispatch(default: Column)(value: (String, String) => Column): Column =
        branchSpecs.foldRight(default) {
          case ((f, label), acc) =>
            when(col(s"m.$f").isNotNull, value(f, label)).otherwise(acc)
        }
      parts += m
        .filter(branchSpecs.map { case (f, _) => col(s"m.$f").isNotNull }.reduce(_ || _))
        .select(baseCols ++ Seq(
          dispatch(lit(null).cast(StringType))((_, label) => lit(label)).as("metric_type"),
          dispatch(lit(null).cast(StringType))((f, _) => branchTemporality(f)).as("aggregation_temporality"),
          dispatch(lit(false))((f, _) => branchMonotonic(f)).as("is_monotonic"),
          explode(coalesce(branchSpecs.map { case (f, _) => col(s"m.$f.dataPoints") }: _*)).as("dp")): _*)
    }
    else {
    if (mT.fieldNames.contains("gauge"))
      parts += m.filter(col("m.gauge").isNotNull)
        .select(base("gauge") :+ explode(col("m.gauge.dataPoints")).as("dp"): _*)
        .withColumn("aggregation_temporality", lit("UNSPECIFIED"))
        .withColumn("is_monotonic", lit(false))
    if (mT.fieldNames.contains("sum"))
      parts += m.filter(col("m.sum").isNotNull)
        .select(base("sum") :+ explode(col("m.sum.dataPoints")).as("dp") :+
          temporality(branchField("sum", "aggregationTemporality", lit(0)))
            .as("aggregation_temporality") :+
          coalesce(branchField("sum", "isMonotonic", lit(false)), lit(false))
            .as("is_monotonic"): _*)
    if (mT.fieldNames.contains("histogram"))
      parts += m.filter(col("m.histogram").isNotNull)
        .select(base("histogram") :+ explode(col("m.histogram.dataPoints")).as("dp") :+
          temporality(branchField("histogram", "aggregationTemporality", lit(0)))
            .as("aggregation_temporality") :+
          lit(false).as("is_monotonic"): _*)
    if (mT.fieldNames.contains("exponentialHistogram"))
      parts += m.filter(col("m.exponentialHistogram").isNotNull)
        .select(base("exp_histogram") :+
          explode(col("m.exponentialHistogram.dataPoints")).as("dp") :+
          temporality(branchField("exponentialHistogram", "aggregationTemporality", lit(0)))
            .as("aggregation_temporality") :+
          lit(false).as("is_monotonic"): _*)
    if (mT.fieldNames.contains("summary"))
      parts += m.filter(col("m.summary").isNotNull)
        .select(base("summary") :+ explode(col("m.summary.dataPoints")).as("dp") :+
          lit("UNSPECIFIED").as("aggregation_temporality") :+
          lit(false).as("is_monotonic"): _*)
    }

    val unioned = parts.result().reduce(_ unionByName (_, allowMissingColumns = true))
    val dpT = unioned.schema("dp").dataType.asInstanceOf[StructType]
    def dpField(name: String, target: DataType): Column =
      (if (dpT.fieldNames.contains(name)) col(s"dp.$name").cast(target)
       else lit(null).cast(target)).as(name match {
        case "asDouble" => "value_double"
        case "asInt" => "value_int"
        case other => other
      })

    val dpAttrsT = if (dpT.fieldNames.contains("attributes"))
      dpT("attributes").dataType else NullType
    unioned.select(
      nsToRfc3339(col("dp.timeUnixNano")).as("timestamp"),
      (if (dpT.fieldNames.contains("startTimeUnixNano"))
        nsToRfc3339(col("dp.startTimeUnixNano"))
      else lit(null).cast(StringType)).as("start_timestamp"),
      col("metric_name"), col("metric_description"), col("metric_unit"),
      col("metric_type"), col("aggregation_temporality"), col("is_monotonic"),
      (if (dpT.fieldNames.contains("flags")) coalesce(col("dp.flags").cast(LongType), lit(0L))
       else lit(0L)).as("flags"),
      dpField("asDouble", DoubleType), dpField("asInt", LongType),
      dpField("count", LongType), dpField("sum", DoubleType),
      dpField("min", DoubleType), dpField("max", DoubleType),
      dpField("bucketCounts", ArrayType(LongType)),
      dpField("explicitBounds", ArrayType(DoubleType)),
      col("resource_attributes"), col("scope_name"),
      col("scope_version"), col("scope_attributes"),
      (if (dpAttrsT == NullType) lit(null).cast(MapType(StringType, StringType))
       else attrsToMap(col("dp.attributes"), dpAttrsT)).as("attributes"))
  }
}
