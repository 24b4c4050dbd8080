package graft.sources

import graft.SparkSpec
import graft.operators.OtlpFlatten

/** Wire-level tests for the protobuf → OTLP/JSON decoder: messages are
  * hand-encoded with an independent little writer below (field numbers
  * transcribed separately from the opentelemetry-proto definitions) and
  * driven through decode + the F4–F6 flatteners. */
class OtlpProtoSpec extends SparkSpec {

  /** Minimal protobuf writer. */
  private class Pb {
    private val out = new java.io.ByteArrayOutputStream()
    private def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v = v >>> 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def vint(field: Int, v: Long): Pb = { tag(field, 0); varint(v); this }
    def zigzag(field: Int, v: Long): Pb = { tag(field, 0); varint((v << 1) ^ (v >> 63)); this }
    def fixed64(field: Int, v: Long): Pb = {
      tag(field, 1)
      (0 until 8).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt)); this
    }
    def double(field: Int, d: Double): Pb = fixed64(field, java.lang.Double.doubleToLongBits(d))
    def fixed32(field: Int, v: Int): Pb = {
      tag(field, 5)
      (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xFF)); this
    }
    def str(field: Int, s: String): Pb = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Pb = { tag(field, 2); varint(b.length); out.write(b); this }
    def msg(field: Int, m: Pb): Pb = bytes(field, m.build)
    def packedFixed64(field: Int, vs: Seq[Long]): Pb = {
      val p = new java.io.ByteArrayOutputStream()
      vs.foreach(v => (0 until 8).foreach(i => p.write(((v >>> (8 * i)) & 0xFF).toInt)))
      bytes(field, p.toByteArray)
    }
    def packedDouble(field: Int, vs: Seq[Double]): Pb =
      packedFixed64(field, vs.map(java.lang.Double.doubleToLongBits))
    def build: Array[Byte] = out.toByteArray
  }

  private def kv(key: String, value: Pb) = new Pb().str(1, key).msg(2, value)
  private def sv(s: String) = new Pb().str(1, s)

  test("logs request: body, attributes, ids, times round-trip") {
    val record = new Pb()
      .fixed64(1, 1718000000123456789L)           // timeUnixNano
      .vint(2, 9)                                 // severityNumber
      .str(3, "INFO")                             // severityText
      .msg(5, sv("hello world"))                  // body
      .msg(6, kv("k8s.pod", sv("api-1")))         // attributes
      .vint(7, 2)                                 // droppedAttributesCount
      .bytes(9, Array.tabulate[Byte](16)(i => (i + 1).toByte))  // traceId
      .bytes(10, Array.tabulate[Byte](8)(i => (0xA0 + i).toByte)) // spanId
      .fixed64(11, 1718000001000000000L)          // observedTimeUnixNano
    val req = new Pb().msg(1, new Pb()            // resourceLogs
      .msg(1, new Pb().msg(1, kv("service", sv("api"))))  // resource.attributes
      .msg(2, new Pb()                            // scopeLogs
        .msg(1, new Pb().str(1, "logger").str(2, "1.2"))  // scope
        .msg(2, record)))
    val json = OtlpProto.toJson("logs", req.build)
    import spark.implicits._
    val row = OtlpFlatten.logs(spark.read.json(Seq(json).toDS)).collect().head

    assert(row.getAs[String]("body") == "hello world")
    assert(row.getAs[String]("severity_text") == "INFO")
    assert(row.getAs[Long]("severity_number") == 9L)
    assert(row.getAs[String]("trace_id") == "0102030405060708090a0b0c0d0e0f10")
    assert(row.getAs[String]("span_id") == "a0a1a2a3a4a5a6a7")
    assert(row.getAs[String]("timestamp").startsWith("2024-06-10T"))
    assert(row.getAs[Map[String, String]]("resource_attributes") == Map("service" -> "api"))
    assert(row.getAs[Map[String, String]]("attributes") == Map("k8s.pod" -> "api-1"))
    assert(row.getAs[String]("scope_name") == "logger")
    assert(row.getAs[String]("scope_version") == "1.2")
    assert(row.getAs[Long]("dropped_attributes_count") == 2L)
  }

  test("traces request: span with status, events, links, enum kind") {
    val span = new Pb()
      .bytes(1, Array.fill[Byte](16)(0x11))
      .bytes(2, Array.fill[Byte](8)(0x22))
      .str(5, "GET /api")
      .vint(6, 2)                                 // kind = SERVER
      .fixed64(7, 1718000000000000000L)
      .fixed64(8, 1718000000500000000L)
      .msg(9, kv("http.status", new Pb().vint(3, 200)))  // int attr
      .msg(11, new Pb().fixed64(1, 1718000000100000000L).str(2, "retry")) // event
      .msg(13, new Pb().bytes(1, Array.fill[Byte](16)(0x33))
        .bytes(2, Array.fill[Byte](8)(0x44)))     // link
      .msg(15, new Pb().str(2, "ok").vint(3, 1))  // status
    val req = new Pb().msg(1, new Pb()
      .msg(1, new Pb().msg(1, kv("service", sv("web"))))
      .msg(2, new Pb().msg(1, new Pb().str(1, "tracer")).msg(2, span)))
    val json = OtlpProto.toJson("traces", req.build)
    import spark.implicits._
    val row = OtlpFlatten.traces(spark.read.json(Seq(json).toDS)).collect().head

    assert(row.getAs[String]("trace_id") == "11" * 16)
    assert(row.getAs[String]("span_id") == "22" * 8)
    assert(row.getAs[String]("name") == "GET /api")
    assert(row.getAs[String]("kind") == "2")
    assert(row.getAs[Long]("duration_ns") == 500000000L)
    assert(row.getAs[String]("status_code") == "1")
    assert(row.getAs[String]("status_message") == "ok")
    assert(row.getAs[Map[String, String]]("attributes") == Map("http.status" -> "200"))
    assert(row.getAs[Seq[String]]("events").head.contains("retry"))
    assert(row.getAs[Seq[String]]("links").head.contains("33333333"))
  }

  test("metrics request: all five types, packed arrays, zigzag, dp attributes + flags") {
    def dpCommon(p: Pb) = p
      .fixed64(2, 1718000000000000000L)           // startTimeUnixNano
      .fixed64(3, 1718000001000000000L)           // timeUnixNano
      .msg(7, kv("et", sv("click")))              // attributes (NumberDataPoint/Summary)
    val gauge = new Pb().str(1, "m_gauge")
      .msg(5, new Pb().msg(1, dpCommon(new Pb()).double(4, 1.5).vint(8, 3)))
    val sum = new Pb().str(1, "m_sum")
      .msg(7, new Pb().msg(1, dpCommon(new Pb()).fixed64(6, 42L)).vint(2, 1).vint(3, 1))
    val hist = new Pb().str(1, "m_hist")
      .msg(9, new Pb().msg(1, new Pb()
          .fixed64(3, 1718000001000000000L)
          .msg(9, kv("et", sv("click")))          // attributes (HistogramDataPoint)
          .fixed64(4, 10L).double(5, 55.5)
          .packedFixed64(6, Seq(1L, 2L, 7L))
          .packedDouble(7, Seq(0.5, 2.5))
          .vint(10, 1).double(11, 0.1).double(12, 9.9))
        .vint(2, 2))
    val expHist = new Pb().str(1, "m_exp")
      .msg(10, new Pb().msg(1, new Pb()
          .fixed64(3, 1718000001000000000L)
          .msg(1, kv("et", sv("click")))          // attributes (ExpHistogramDataPoint)
          .fixed64(4, 5L).double(5, 12.5).zigzag(6, -2)
          .msg(8, new Pb().zigzag(1, -1).vint(2, 3).vint(2, 4)))  // positive buckets (unpacked varints)
        .vint(2, 1))
    val summary = new Pb().str(1, "m_summary")
      .msg(11, new Pb().msg(1, dpCommon(new Pb())
        .fixed64(4, 9L).double(5, 99.9)
        .msg(6, new Pb().double(1, 0.5).double(2, 3.3))))
    val req = new Pb().msg(1, new Pb()
      .msg(1, new Pb().msg(1, kv("host", sv("n1"))))
      .msg(2, new Pb().msg(1, new Pb().str(1, "meter").str(2, "3.1"))
        .msg(2, gauge).msg(2, sum).msg(2, hist).msg(2, expHist).msg(2, summary)))
    val json = OtlpProto.toJson("metrics", req.build)
    // decoder-level assertions on things the flattener doesn't surface
    assert(json.contains(""""scale":-2"""))
    assert(json.contains(""""offset":-1"""))
    assert(json.contains(""""bucketCounts":["3","4"]"""))
    assert(json.contains(""""quantileValues":[{"quantile":0.5,"value":3.3}]"""))

    import spark.implicits._
    val rows = OtlpFlatten.metrics(spark.read.json(Seq(json).toDS)).collect()
      .map(r => r.getAs[String]("metric_type") -> r).toMap
    assert(rows.keySet == Set("gauge", "sum", "histogram", "exp_histogram", "summary"))
    assert(rows("gauge").getAs[Double]("value_double") == 1.5)
    assert(rows("gauge").getAs[Long]("flags") == 3L)
    assert(rows("gauge").getAs[Map[String, String]]("attributes") == Map("et" -> "click"))
    assert(rows("sum").getAs[Long]("value_int") == 42L)
    assert(rows("sum").getAs[String]("aggregation_temporality") == "DELTA")
    assert(rows("sum").getAs[Boolean]("is_monotonic"))
    assert(rows("histogram").getAs[Long]("count") == 10L)
    assert(rows("histogram").getAs[scala.collection.Seq[Long]]("bucketCounts") == Seq(1L, 2L, 7L))
    assert(rows("histogram").getAs[scala.collection.Seq[Double]]("explicitBounds") == Seq(0.5, 2.5))
    assert(rows("histogram").getAs[Double]("min") == 0.1)
    assert(rows("histogram").getAs[Double]("max") == 9.9)
    assert(rows("histogram").getAs[String]("aggregation_temporality") == "CUMULATIVE")
    assert(rows("exp_histogram").getAs[Long]("count") == 5L)
    assert(rows("summary").getAs[Long]("count") == 9L)
    assert(rows("summary").getAs[Double]("sum") == 99.9)
    assert(rows("summary").getAs[String]("scope_version") == "3.1")
  }

  test("fixed32-encoded flags (logs/spans per proto) decode by wire type") {
    // LogRecord.flags is fixed32 on the wire — a varint-assuming decoder
    // would desync the stream and corrupt everything after it
    val record = new Pb()
      .fixed64(1, 1718000000000000000L)
      .str(3, "INFO")
      .fixed32(8, 0x80000001)                     // flags, high bit set
      .bytes(9, Array.fill[Byte](16)(0x55))
    val req = new Pb().msg(1, new Pb()
      .msg(2, new Pb().msg(1, new Pb().str(1, "lg")).msg(2, record)))
    val json = OtlpProto.toJson("logs", req.build)
    assert(json.contains(""""flags":2147483649"""))
    assert(json.contains(""""traceId":"""" + "55" * 16))
    assert(json.contains(""""severityText":"INFO""""))
  }

  test("randomized log batches round-trip: every record and attribute survives") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val nRecords = 1 + rnd.nextInt(8)
      val expected = (1 to nRecords).map { i =>
        val body = s"msg-${rnd.nextInt(1000000)}"
        val sev = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR")(rnd.nextInt(5))
        val attrs = (0 until rnd.nextInt(4)).map(j => s"k$j" -> s"v${rnd.nextInt(100)}").toMap
        val ts = 1700000000000000000L + rnd.nextLong(1000000000000L)
        (body, sev, attrs, ts)
      }
      val records = expected.map { case (body, sev, attrs, ts) =>
        var p = new Pb().fixed64(1, ts).str(3, sev).msg(5, sv(body))
        attrs.foreach { case (k, v) => p = p.msg(6, kv(k, sv(v))) }
        p
      }
      var scopeLogs = new Pb().msg(1, new Pb().str(1, "fuzz"))
      records.foreach(r => scopeLogs = scopeLogs.msg(2, r))
      val req = new Pb().msg(1, new Pb()
        .msg(1, new Pb().msg(1, kv("svc", sv("t"))))
        .msg(2, scopeLogs))
      val json = OtlpProto.toJson("logs", req.build)
      import spark.implicits._
      val rows = OtlpFlatten.logs(spark.read.json(Seq(json).toDS)).collect()
      assert(rows.length == expected.length)
      val got = rows.map(r => (r.getAs[String]("body"), r.getAs[String]("severity_text"),
        Option(r.getAs[Map[String, String]]("attributes")).getOrElse(Map.empty))).toSet
      val want = expected.map(e => (e._1, e._2, e._3)).toSet
      assert(got == want, s"diff: ${(got -- want)} / ${(want -- got)}")
    }
  }

  test("resource and scope may be absent entirely (proto3 omits empty messages)") {
    val req = new Pb().msg(1, new Pb().msg(2, new Pb()
      .msg(2, new Pb().fixed64(1, 1718000000000000000L).str(3, "X"))))
    val json = OtlpProto.toJson("logs", req.build)
    import spark.implicits._
    val rows = OtlpFlatten.logs(spark.read.json(Seq(json).toDS)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("severity_text") == "X")
    assert(rows.head.getAs[Map[String, String]]("resource_attributes") == null)
    assert(rows.head.getAs[String]("scope_name") == null)
  }

  test("randomized span batches round-trip: ids, times, attributes survive") {
    val rnd = new scala.util.Random(7)
    (1 to 15).foreach { _ =>
      val expected = (1 to 1 + rnd.nextInt(6)).map { _ =>
        val tid = Array.fill[Byte](16)(rnd.nextInt(256).toByte)
        val sid = Array.fill[Byte](8)(rnd.nextInt(256).toByte)
        val name = s"op-${rnd.nextInt(100000)}"
        val start = 1700000000000000000L + rnd.nextLong(1000000000000L)
        val dur = 1000000L + rnd.nextLong(1000000000L)
        (tid, sid, name, start, dur)
      }
      var scopeSpans = new Pb().msg(1, new Pb().str(1, "t"))
      expected.foreach { case (tid, sid, name, start, dur) =>
        scopeSpans = scopeSpans.msg(2, new Pb()
          .bytes(1, tid).bytes(2, sid).str(5, name)
          .fixed64(7, start).fixed64(8, start + dur))
      }
      val req = new Pb().msg(1, new Pb()
        .msg(1, new Pb().msg(1, kv("s", sv("x")))).msg(2, scopeSpans))
      import spark.implicits._
      val rows = OtlpFlatten.traces(
        spark.read.json(Seq(OtlpProto.toJson("traces", req.build)).toDS)).collect()
      def hexOf(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
      val got = rows.map(r => (r.getAs[String]("trace_id"), r.getAs[String]("span_id"),
        r.getAs[String]("name"), r.getAs[Long]("duration_ns"))).toSet
      val want = expected.map(e => (hexOf(e._1), hexOf(e._2), e._3, e._5)).toSet
      assert(got == want)
    }
  }

  test("randomized metric batches round-trip: type, value, count survive") {
    val rnd = new scala.util.Random(11)
    (1 to 15).foreach { _ =>
      val expected = (1 to 1 + rnd.nextInt(5)).map { i =>
        val name = s"m$i"
        val kind = rnd.nextInt(3) // 0 gauge, 1 sum, 2 histogram
        val value = rnd.nextInt(1000000).toDouble / 7
        val count = rnd.nextInt(10000).toLong
        (name, kind, value, count)
      }
      var sm = new Pb().msg(1, new Pb().str(1, "meter"))
      expected.foreach { case (name, kind, value, count) =>
        val dp = kind match {
          case 0 => new Pb().str(1, name).msg(5, new Pb().msg(1,
            new Pb().fixed64(3, 1L).double(4, value)))
          case 1 => new Pb().str(1, name).msg(7, new Pb().msg(1,
            new Pb().fixed64(3, 1L).fixed64(6, count)).vint(2, 2))
          case _ => new Pb().str(1, name).msg(9, new Pb().msg(1,
            new Pb().fixed64(3, 1L).fixed64(4, count).double(5, value)).vint(2, 1))
        }
        sm = sm.msg(2, dp)
      }
      val req = new Pb().msg(1, new Pb()
        .msg(1, new Pb().msg(1, kv("h", sv("n")))).msg(2, sm))
      import spark.implicits._
      val rows = OtlpFlatten.metrics(
        spark.read.json(Seq(OtlpProto.toJson("metrics", req.build)).toDS)).collect()
      val byName = rows.map(r => r.getAs[String]("metric_name") -> r).toMap
      expected.foreach { case (name, kind, value, count) =>
        val r = byName(name)
        kind match {
          case 0 =>
            assert(r.getAs[String]("metric_type") == "gauge")
            assert(r.getAs[Double]("value_double") == value)
          case 1 =>
            assert(r.getAs[String]("metric_type") == "sum")
            assert(r.getAs[Long]("value_int") == count)
            assert(r.getAs[String]("aggregation_temporality") == "CUMULATIVE")
          case _ =>
            assert(r.getAs[String]("metric_type") == "histogram")
            assert(r.getAs[Long]("count") == count)
            assert(r.getAs[Double]("sum") == value)
        }
      }
    }
  }

  test("hostile payloads fail fast: truncated lengths and NaN doubles") {
    // length-delimited field claiming more bytes than exist
    val truncated = Array[Byte](0x0A, 0x7F, 0x01, 0x02)
    intercept[IllegalArgumentException](OtlpProto.toJson("logs", truncated))
    // NaN metric value renders as null, not invalid JSON
    val req = new Pb().msg(1, new Pb().msg(2, new Pb()
      .msg(2, new Pb().str(1, "m")
        .msg(5, new Pb().msg(1, new Pb()
          .fixed64(3, 1L).double(4, Double.NaN))))))
    val json = OtlpProto.toJson("metrics", req.build)
    assert(json.contains(""""asDouble":null"""))
  }

  test("unknown fields and exemplars are skipped, not fatal") {
    val withUnknown = new Pb().msg(1, new Pb()
      .msg(2, new Pb()
        .msg(1, new Pb().str(1, "logger"))
        .msg(2, new Pb().fixed64(1, 1L).str(3, "X")
          .str(99, "future-field")                // unknown LD field
          .vint(98, 7)                            // unknown varint field
          .fixed32(97, 5))))                      // unknown fixed32 field
    val json = OtlpProto.toJson("logs", withUnknown.build)
    assert(json.contains(""""severityText":"X""""))
    assert(!json.contains("future-field"))
  }
}
