package graft.operators

import graft.SparkSpec

class OtlpSpec extends SparkSpec {
  import spark.implicits._

  private def parse(json: String) = spark.read.json(Seq(json).toDS)

  test("logs flattener: one row per LogRecord, attrs to maps, ns to RFC3339") {
    val json =
      """{"resourceLogs":[{"resource":{"attributes":[
        |   {"key":"service.name","value":{"stringValue":"checkout"}},
        |   {"key":"k8s.pod.replicas","value":{"intValue":3}}]},
        | "scopeLogs":[{"scope":{"name":"io.app","version":"1.2"},
        |   "logRecords":[
        |     {"timeUnixNano":"1735725600000000000","observedTimeUnixNano":"1735725601000000000",
        |      "severityNumber":9,"severityText":"INFO",
        |      "body":{"stringValue":"user logged in"},
        |      "attributes":[{"key":"user","value":{"stringValue":"u1"}}],
        |      "droppedAttributesCount":0,"flags":1,
        |      "traceId":"5B8EFFF798038103D269B633813FC60C","spanId":"EEE19B7EC3C1B174"},
        |     {"timeUnixNano":"1735725602000000000","severityNumber":17,"severityText":"ERROR",
        |      "body":{"stringValue":"boom"}}
        | ]}]}]}""".stripMargin
    val out = OtlpFlatten.logs(parse(json)).orderBy("timestamp").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[String]("timestamp") == "2025-01-01T10:00:00.000000Z")
    assert(r.getAs[String]("observed_timestamp") == "2025-01-01T10:00:01.000000Z")
    assert(r.getAs[Long]("severity_number") == 9L)
    assert(r.getAs[String]("body") == "user logged in")
    assert(r.getAs[String]("trace_id") == "5b8efff798038103d269b633813fc60c")
    assert(r.getAs[Map[String, String]]("resource_attributes") ==
      Map("service.name" -> "checkout", "k8s.pod.replicas" -> "3"))
    assert(r.getAs[Map[String, String]]("attributes") == Map("user" -> "u1"))
    assert(r.getAs[String]("scope_name") == "io.app")
    assert(out(1).getAs[String]("severity_text") == "ERROR")
  }

  test("traces flattener: duration_ns computed, events JSON-encoded") {
    val json =
      """{"resourceSpans":[{"resource":{"attributes":[
        |   {"key":"service.name","value":{"stringValue":"api"}}]},
        | "scopeSpans":[{"scope":{"name":"tracer"},
        |   "spans":[{"traceId":"AA11","spanId":"BB22","parentSpanId":"CC33",
        |     "name":"GET /x","kind":2,
        |     "startTimeUnixNano":"1735725600000000000",
        |     "endTimeUnixNano":"1735725600250000000",
        |     "status":{"code":1,"message":"ok"},
        |     "events":[{"timeUnixNano":"1735725600100000000","name":"retry"}],
        |     "attributes":[{"key":"http.status","value":{"intValue":200}}]}]}]}]}""".stripMargin
    val out = OtlpFlatten.traces(parse(json)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("duration_ns") == 250000000L)
    assert(r.getAs[String]("trace_id") == "aa11")
    assert(r.getAs[String]("name") == "GET /x")
    assert(r.getAs[String]("status_code") == "1")
    assert(r.getAs[Map[String, String]]("attributes") == Map("http.status" -> "200"))
    assert(r.getAs[Seq[String]]("events").head.contains("retry"))
  }

  test("metrics flattener: one row per data point across metric kinds") {
    val json =
      """{"resourceMetrics":[{"resource":{"attributes":[
        |   {"key":"host","value":{"stringValue":"n1"}}]},
        | "scopeMetrics":[{"scope":{"name":"meter"},
        |   "metrics":[
        |     {"name":"cpu_load","unit":"1","gauge":{"dataPoints":[
        |        {"timeUnixNano":"1735725600000000000","asDouble":0.75},
        |        {"timeUnixNano":"1735725660000000000","asDouble":0.80}]}},
        |     {"name":"requests","sum":{"aggregationTemporality":2,"isMonotonic":true,
        |        "dataPoints":[{"timeUnixNano":"1735725600000000000","asInt":"42",
        |          "startTimeUnixNano":"1735725000000000000"}]}},
        |     {"name":"latency","histogram":{"aggregationTemporality":1,"dataPoints":[
        |        {"timeUnixNano":"1735725600000000000","count":"10","sum":1.5,
        |         "min":0.01,"max":0.9,
        |         "bucketCounts":["5","3","2"],"explicitBounds":[0.1,0.5]}]}},
        |     {"name":"latency_exp","exponentialHistogram":{"aggregationTemporality":2,
        |        "dataPoints":[{"timeUnixNano":"1735725600000000000","count":"7",
        |          "sum":2.5,"min":0.02,"max":1.1}]}}
        | ]}]}]}""".stripMargin
    val out = OtlpFlatten.metrics(parse(json))
    val rows = out.orderBy("metric_name", "timestamp").collect()
    assert(rows.length == 5)
    val exp = rows.filter(_.getAs[String]("metric_name") == "latency_exp").head
    assert(exp.getAs[String]("metric_type") == "exp_histogram")
    assert(exp.getAs[String]("aggregation_temporality") == "CUMULATIVE")
    assert(exp.getAs[Long]("count") == 7L && exp.getAs[Double]("sum") == 2.5)
    val byName = rows.groupBy(_.getAs[String]("metric_name"))
    assert(byName("cpu_load").length == 2)
    assert(byName("cpu_load").head.getAs[Double]("value_double") == 0.75)
    assert(byName("cpu_load").head.getAs[String]("aggregation_temporality") == "UNSPECIFIED")
    val sum = byName("requests").head
    assert(sum.getAs[Long]("value_int") == 42L)
    assert(sum.getAs[String]("aggregation_temporality") == "CUMULATIVE")
    assert(sum.getAs[Boolean]("is_monotonic"))
    assert(sum.getAs[String]("start_timestamp") == "2025-01-01T09:50:00.000000Z")
    val h = byName("latency").head
    assert(h.getAs[Long]("count") == 10L)
    assert(h.getAs[scala.collection.Seq[Long]]("bucketCounts") == Seq(5L, 3L, 2L))
    assert(h.getAs[scala.collection.Seq[Double]]("explicitBounds") == Seq(0.1, 0.5))
    assert(h.getAs[String]("aggregation_temporality") == "DELTA")
  }
}
