package graft.sink

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sink.SinkMapper.ColumnMapping

/** Drives the ClickHouse NATIVE TCP protocol pair over real loopback
  * sockets: [[ClickHouseNativeTcp]] (client) against
  * [[MiniClickHouseTcpServer]] (fixture), which shares its table registry
  * and every per-type validator with the HTTP fixture — the same INSERT
  * faults produce the same ClickHouse error codes on both transports.
  * Covers the handshake (incl. auth failure as an Exception packet),
  * Ping/Pong, settings-as-strings framing, multi-block streaming INSERTs,
  * and poison-row isolation through [[ClickHouseSink]]'s batch handler. */
class NativeTcpSpec extends SparkSpec {
  import spark.implicits._

  private def withTcp(user: String = "default", pass: String = "")
                     (f: (MiniClickHouseServer, MiniClickHouseTcpServer) => Unit): Unit = {
    val brain = new MiniClickHouseServer(user, pass)
    brain.start()
    val tcp = new MiniClickHouseTcpServer(brain)
    tcp.start()
    try f(brain, tcp) finally { tcp.stop(); brain.stop() }
  }

  private def tcpCfg(tcp: MiniClickHouseTcpServer, table: String,
                     mappings: Seq[ColumnMapping],
                     user: String = "default", pass: String = ""): ClickHouseSink.Config =
    ClickHouseSink.Config(url = tcp.endpoint, database = "default",
      table = table, username = user, password = pass, mappings = mappings)

  test("handshake + ping: hello exchange negotiates the revision, Pong answers Ping") {
    withTcp() { (_, tcp) =>
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "t", Seq.empty))
      ClickHouseNativeTcp.ping(c) // throws on any framing/handshake fault
      assert(tcp.lastClientName == "graft-spark")
    }
  }

  test("wrong password: the handshake answers an Exception packet with code 516") {
    withTcp(pass = "secret") { (_, tcp) =>
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "t", Seq.empty, pass = "wrong"))
      val e = intercept[ClickHouseHttp.CHServerException](ClickHouseNativeTcp.ping(c))
      assert(e.code == 516)
      assert(ErrorClassifier.classify(e) == ErrorClassifier.Permanent)
    }
  }

  test("full type matrix round-trips over the native TCP wire") {
    withTcp() { (brain, tcp) =>
      val schema = Seq(
        "s" -> "String", "i64" -> "Int64", "f64" -> "Float64",
        "e" -> "Enum8('red' = 1, 'blue' = 2)", "dt64" -> "DateTime64(3)",
        "lc" -> "LowCardinality(String)", "ns" -> "Nullable(String)",
        "m" -> "Map(String, String)", "arr" -> "Array(Int32)",
        "dec" -> "Decimal(12, 3)", "day" -> "Date",
        "tup" -> "Tuple(a String, n Int32)", "ip4" -> "IPv4", "ip6" -> "IPv6")
      brain.createTable("default", "t", schema)
      val m = schema.map { case (n, t) => ColumnMapping(n, n, t) }
      val df = Seq((
        "héllo", 9000000000L, 2.25, "blue", "2025-02-21T07:45:48.123",
        "low", null.asInstanceOf[String], Map("k1" -> "v1"), Seq(1, 2, 3),
        BigDecimal("123456789.125"), java.sql.Date.valueOf("2025-06-01"),
        ("x", 7), "1.2.3.4", "2001:db8::1"))
        .toDF("s", "i64", "f64", "e", "dt64", "lc", "ns", "m", "arr",
          "dec", "day", "tup", "ip4", "ip6")
      ClickHouseSink.writeBatch(tcpCfg(tcp, "t", m))(df)
      assert(brain.rowCount("default", "t") == 1)
      val r = brain.rows("default", "t").head
      assert(r("s") == "héllo")
      assert(r("i64") == BigInt(9000000000L))
      assert(r("f64") == 2.25)
      assert(r("e") == "blue")
      val dtExpect = java.time.Instant.parse("2025-02-21T07:45:48Z")
        .getEpochSecond * 1000000L + 123000L
      assert(r("dt64") == dtExpect)
      assert(r("lc") == "low")
      assert(r("ns") == null)
      assert(r("m") == Map("k1" -> "v1"))
      assert(r("arr") == Vector(BigInt(1), BigInt(2), BigInt(3)))
      assert(r("dec") == BigDecimal("123456789.125"))
      assert(r("day") == java.time.LocalDate.parse("2025-06-01").toEpochDay)
      assert(r("tup") == Map("a" -> "x", "n" -> BigInt(7)))
      assert(r("ip4") == "1.2.3.4" && r("ip6") == "2001:db8::1")
      // the INSERT text really went over the TCP wire
      assert(tcp.receivedQueries.asScala.exists(_.contains("FORMAT Native")))
    }
  }

  test("one INSERT streams many blocks over a single connection") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "mb", Seq("id" -> "Int64"))
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "mb", Seq(ColumnMapping("id", "id", "Int64"))))
        .copy(maxRowsPerBlock = 1000)
      // 10k rows in ONE partition → 10 blocks through ONE INSERT query
      val df = spark.range(10000).toDF("id").coalesce(1)
      ClickHouseNativeTcp.write(c)(df)
      assert(brain.acceptedCount("default", "mb") == 10000L)
      // exactly one Query packet: the blocks streamed as framed packets,
      // not one INSERT per slab (the HTTP leg's cost this leg removes)
      assert(tcp.receivedQueries.size == 1)
    }
  }

  test("server row-data fault dead-letters the poison row alone; the rest land") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "iso", Seq("id" -> "Int32"))
      val m = Seq(ColumnMapping("id", "id", "Int32"))
      val df = Seq(1, 2, 3).toDF("id").coalesce(1)
      // fault 1 rejects the 3-row block (row-data class → row-wise replay
      // on a fresh connection); fault 2 rejects the FIRST replayed
      // single-row block → that row dead-letters, rows 2 and 3 land
      brain.failNext(321, "Value is out of range of data type")
      brain.failNext(321, "Value is out of range of data type")
      val dlq = new ConcurrentLinkedQueue[Row]
      ClickHouseSink.foreachBatchHandler(tcpCfg(tcp, "iso", m),
        d => d.collect().foreach(dlq.add))(df, 0L)
      assert(brain.rowCount("default", "iso") == 2)
      assert(brain.rows("default", "iso").map(_("id")).toSet ==
        Set(BigInt(2), BigInt(3)))
      assert(dlq.size == 1)
      assert(dlq.asScala.head.getAs[String]("error").contains("Code: 321"))
      assert(dlq.asScala.head.getAs[String]("original_message").contains("1"))
    }
  }

  test("client-side encoder reject (bad IP literal) is isolated without a round-trip") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "ip", Seq("id" -> "Int32", "addr" -> "IPv6"))
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint, tcpCfg(tcp, "ip",
        Seq(ColumnMapping("id", "id", "Int32"),
          ColumnMapping("addr", "addr", "IPv6"))))
      val df = Seq((1, "::1"), (2, "not-an-ip"), (3, "1.2.3.4"))
        .toDF("id", "addr").coalesce(1)
      val failed = ClickHouseNativeTcp.writeIsolating(c)(df).collect().toSeq
      assert(brain.rowCount("default", "ip") == 2)
      assert(brain.rows("default", "ip").map(_("addr")).toSet ==
        Set("::1", "::ffff:1.2.3.4"))
      assert(failed.size == 1 && failed.head._2.contains("Code: 441"))
      assert(failed.head._1.contains("not-an-ip"))
    }
  }

  test("injected retryable fault (241) retries through the budget and lands exactly once") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "rt", Seq("id" -> "Int64"))
      brain.failNext(241, "Memory limit (total) exceeded", times = 2)
      val df = Seq(1L, 2L, 3L).toDF("id").coalesce(1)
      val dlq = new ConcurrentLinkedQueue[Row]
      val handler = ClickHouseSink.foreachBatchHandler(
        tcpCfg(tcp, "rt", Seq(ColumnMapping("id", "id", "Int64"))),
        d => d.collect().foreach(dlq.add))
      var attempts = 0
      var done = false
      while (!done && attempts < 10) {
        attempts += 1
        try { handler(df, 5L); done = true } catch { case _: Throwable => () }
      }
      assert(done)
      assert(attempts == 3, "two injected 241s then success")
      assert(brain.acceptedCount("default", "rt") == 3L)
      assert(dlq.isEmpty)
    }
  }

  test("a rowful server Log packet (send_logs_level) is skipped, not fatal") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "lg", Seq("id" -> "Int64"))
      tcp.sendLogBlockOnInsert = true // server chats back a 2-row log block
      val df = Seq(1L, 2L, 3L).toDF("id").coalesce(1)
      ClickHouseSink.writeBatch(
        tcpCfg(tcp, "lg", Seq(ColumnMapping("id", "id", "Int64"))))(df)
      assert(brain.rowCount("default", "lg") == 3)
    }
  }

  test("per-query settings go over the wire in the Query packet's settings section") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "st", Seq("id" -> "Int64"))
      val c = tcpCfg(tcp, "st", Seq(ColumnMapping("id", "id", "Int64")))
        .copy(httpSettings = Map("async_insert" -> "1", "insert_deduplicate" -> "0"))
      ClickHouseSink.writeBatch(c)(Seq(1L).toDF("id"))
      assert(tcp.lastSettings == Map("async_insert" -> "1", "insert_deduplicate" -> "0"))
      assert(brain.rowCount("default", "st") == 1)
    }
  }

  test("unknown table answers Exception 60; the classifier calls it a data fault batch-wide") {
    withTcp() { (_, tcp) =>
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "nope", Seq(ColumnMapping("id", "id", "Int64"))))
      val conn = new ClickHouseNativeTcp.Conn(c)
      try {
        val e = intercept[ClickHouseHttp.CHServerException] {
          conn.insert(ClickHouseNativeTcp.insertQuery(c, Seq("id")), Iterator.empty)
        }
        assert(e.code == 60)
      } finally conn.close()
    }
  }

  test("Conn.select streams decoded blocks; Conn.describe needs no HTTP side-channel") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "sel_t",
        Seq("id" -> "Int64", "s" -> "Nullable(String)"))
      val cfg = tcpCfg(tcp, "sel_t", Seq(ColumnMapping("id", "id", "Int64"),
        ColumnMapping("s", "s", "Nullable(String)")))
      ClickHouseSink.writeBatch(cfg)(
        Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "s"))
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint, cfg)
      val conn = new ClickHouseNativeTcp.Conn(c)
      try {
        assert(conn.describe("default", "sel_t") ==
          Seq("id" -> "Int64", "s" -> "Nullable(String)"))
        val expect = Seq("id" -> graft.types.CHType.parse("Int64"),
          "s" -> graft.types.CHType.parse("Nullable(String)"))
        val rows = conn.select(
          "SELECT `id`, `s` FROM `default`.`sel_t` ORDER BY `id` ASC NULLS LAST",
          Some(expect)).flatMap(_._2).toVector
        assert(rows.map(_.getLong(0)) == Vector(1L, 2L, 3L))
        assert(rows(1).isNullAt(1))
        assert(rows(2).getUTF8String(1).toString == "c")
        // the connection is reusable after a fully-consumed SELECT
        val again = conn.select(
          "SELECT `id` FROM `default`.`sel_t` WHERE `id` > 1",
          Some(Seq("id" -> graft.types.CHType.parse("Int64"))))
          .flatMap(_._2).size
        assert(again == 2)
        // an unknown table answers a decoded Exception packet
        val e = intercept[ClickHouseHttp.CHServerException] {
          conn2Rows(conn, "SELECT `id` FROM `default`.`nope`")
        }
        assert(e.code == 60)
      } finally conn.close()
    }
  }

  private def conn2Rows(conn: ClickHouseNativeTcp.Conn, q: String): Int =
    conn.select(q, Some(Seq("id" -> graft.types.CHType.parse("Int64"))))
      .flatMap(_._2).size

  test("a server below the settings-as-strings revision floor is refused at handshake") {
    withTcp() { (_, tcp) =>
      tcp.serverRevision = 54300L // pre-strings settings layout
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "t", Seq.empty))
      val e = intercept[java.io.IOException](ClickHouseNativeTcp.ping(c))
      assert(e.getMessage.contains("below the supported minimum"), e.getMessage)
      assert(e.getMessage.contains("54300"), e.getMessage)
    }
  }

  // ------------------------------------------------------------------- TLS

  /** (server SSLContext, base64-of-PEM root CA) — keytool self-signed pair
    * with SAN=ip:127.0.0.1 so hostname verification is exercised (the
    * KafkaTlsSpec pattern). */
  private lazy val serverTls: (javax.net.ssl.SSLContext, String) = {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft-ch-tls")
    val ks = dir.resolve("ch.p12").toString
    val pem = dir.resolve("ch.pem")
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    assert(Seq(keytool, "-genkeypair", "-alias", "mini", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=ip:127.0.0.1", "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", "changeit", "-keypass", "changeit").! == 0, "keytool genkeypair failed")
    assert(Seq(keytool, "-exportcert", "-rfc", "-alias", "mini", "-keystore", ks,
      "-storepass", "changeit", "-file", pem.toString).! == 0, "keytool exportcert failed")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(ks))
    try store.load(in, "changeit".toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    (ctx, java.util.Base64.getEncoder.encodeToString(
      java.nio.file.Files.readAllBytes(pem)))
  }

  private def withTls(f: (MiniClickHouseServer, MiniClickHouseTcpServer) => Unit): Unit = {
    val brain = new MiniClickHouseServer()
    brain.start()
    val tcp = new MiniClickHouseTcpServer(brain, tls = Some(serverTls._1))
    tcp.start()
    try f(brain, tcp) finally { tcp.stop(); brain.stop() }
  }

  test("tcps://: verified TLS INSERT end-to-end with a base64-PEM root CA") {
    withTls { (brain, tcp) =>
      assert(tcp.endpoint.startsWith("tcps://"))
      brain.createTable("default", "sec", Seq("id" -> "Int64", "s" -> "String"))
      ClickHouseSink.writeBatch(
        tcpCfg(tcp, "sec", Seq(ColumnMapping("id", "id", "Int64"),
          ColumnMapping("s", "s", "String")))
          .copy(tlsRootCaPemB64 = Some(serverTls._2)))(
        Seq((1L, "enc"), (2L, "rypted")).toDF("id", "s"))
      assert(brain.rowCount("default", "sec") == 2)
    }
  }

  test("tcps://: an untrusted certificate is refused at the TLS handshake") {
    withTls { (_, tcp) =>
      val c = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint, tcpCfg(tcp, "t", Seq.empty))
      val e = intercept[Exception](ClickHouseNativeTcp.ping(c))
      val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain.exists(t => t.isInstanceOf[javax.net.ssl.SSLHandshakeException] ||
        Option(t.getMessage).exists(_.contains("PKIX"))),
        chain.map(_.toString).mkString(" | "))
    }
  }

  test("tcps://: skip-verify accepts the self-signed cert; plaintext against TLS fails cleanly") {
    withTls { (brain, tcp) =>
      val ok = ClickHouseNativeTcp.parseEndpoint(tcp.endpoint,
        tcpCfg(tcp, "t", Seq.empty).copy(tlsSkipVerify = true))
      ClickHouseNativeTcp.ping(ok) // must not throw
      // a plaintext client dialing the TLS port must fail loudly
      val plain = ClickHouseNativeTcp.parseEndpoint(
        tcp.endpoint.replace("tcps://", "tcp://"), tcpCfg(tcp, "t", Seq.empty))
      intercept[Exception](ClickHouseNativeTcp.ping(plain))
      ()
    }
  }

  test("LZ4 compression: INSERT and SELECT ride checksummed frames both ways") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "cz", Seq("id" -> "Int64", "s" -> "String"))
      val m = Seq(ColumnMapping("id", "id", "Int64"), ColumnMapping("s", "s", "String"))
      val cfg = tcpCfg(tcp, "cz", m).copy(tcpCompress = true)
      // ~1.5 MB of strings: the fixture's 64 KiB frames and the client's
      // 1 MiB frames BOTH split, so multi-frame blocks are exercised on
      // each side (and the two frame codecs are independent
      // implementations — a framing mistake cannot round-trip)
      val df = (1L to 3000L).map(i => (i, "payload-" * 64 + i.toString)).toDF("id", "s")
      ClickHouseSink.writeBatch(cfg)(df)
      assert(tcp.lastCompression == 1L, "the Query packet never advertised compression")
      assert(brain.rowCount("default", "cz") == 3000)
      assert(brain.rows("default", "cz").map(_("id")).toSet.size == 3000)
      // scan back through the read source with compress=lz4: DESCRIBE,
      // pushdown, stats probe and block decode all ride compressed frames
      val back = spark.read.format("graft-clickhouse")
        .option("url", tcp.endpoint).option("database", "default")
        .option("table", "cz").option("compress", "lz4").load()
      assert(back.count() == 3000)
      assert(back.filter($"id" <= 10L)
        .agg(org.apache.spark.sql.functions.sum($"id")).collect().head.getLong(0) == 55L)
      assert(tcp.lastCompression == 1L)
      // a rowful Log packet (send_logs_level) arrives PLAIN even though
      // the session negotiated compression — the real server writes Log
      // blocks to the uncompressed stream while Data rides the frames;
      // the fixture matches that split, so a client that wrongly read the
      // Log block through the frame reader would misparse and fail here
      tcp.sendLogBlockOnInsert = true
      try ClickHouseSink.writeBatch(cfg)(Seq((9001L, "x")).toDF("id", "s"))
      finally tcp.sendLogBlockOnInsert = false
      assert(brain.rowCount("default", "cz") == 3001)
    }
  }

  test("ZSTD compression: network_compression_method=zstd rides 0x90 frames both ways") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "cz3", Seq("id" -> "Int64", "s" -> "String"))
      val m = Seq(ColumnMapping("id", "id", "Int64"), ColumnMapping("s", "s", "String"))
      // client WRITES zstd frames; the setting makes the fixture (like a
      // real server with network_compression_method=zstd) ANSWER in zstd
      val cfg = tcpCfg(tcp, "cz3", m).copy(tcpCompress = true,
        tcpCompressMethod = "zstd",
        httpSettings = Map("network_compression_method" -> "zstd"))
      val df = (1L to 2000L).map(i => (i, "payload-" * 64 + i.toString)).toDF("id", "s")
      ClickHouseSink.writeBatch(cfg)(df)
      assert(tcp.lastCompression == 1L)
      assert(brain.rowCount("default", "cz3") == 2000)
      val back = spark.read.format("graft-clickhouse")
        .option("url", tcp.endpoint).option("database", "default")
        .option("table", "cz3").option("compress", "zstd")
        .option("settings.network_compression_method", "zstd").load()
      assert(back.count() == 2000)
      assert(back.filter($"id" <= 10L)
        .agg(org.apache.spark.sql.functions.sum($"id")).collect().head.getLong(0) == 55L)
      assert(tcp.lastSettings.get("network_compression_method").contains("zstd"))
    }
  }

  test("a corrupted compressed frame is refused loudly (CityHash mismatch), never decoded") {
    withTcp() { (brain, tcp) =>
      brain.createTable("default", "cz2", Seq("id" -> "Int64"))
      val m = Seq(ColumnMapping("id", "id", "Int64"))
      val cfg = tcpCfg(tcp, "cz2", m).copy(tcpCompress = true)
      ClickHouseSink.writeBatch(cfg)(Seq(1L, 2L, 3L).toDF("id"))
      tcp.corruptNextCompressedFrame = true
      val conn = new ClickHouseNativeTcp.Conn(
        ClickHouseNativeTcp.parseEndpoint(tcp.endpoint, cfg))
      try {
        val e = intercept[java.io.IOException] {
          conn.select("SELECT `id` FROM `default`.`cz2`", None)
            .foreach(_._2.foreach(_ => ()))
        }
        assert(e.getMessage.toLowerCase.contains("checksum"), e.getMessage)
      } finally conn.close()
    }
  }
}
