package graft.sink

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import SinkMapper.ColumnMapping

/** Drives the sink's REAL JDBC leg — `ClickHouseSink.writeBatch` /
  * `attach` with NO injected write — against an embedded Apache Derby
  * database (`jdbc:derby:memory:`), the one JDBC engine on this build's
  * classpath. Prior rounds proved the batching/mapping/retry logic through
  * an injected-writer seam only; these scenarios prove the leg the
  * reference exercises against a live ClickHouse
  * (glassflow-api/internal/sink/clickhouse.go:141-206, the reference's
  * tests/features/sink feature files): a real connection, typed multi-row
  * INSERT through a JDBC driver, per-schema-version batches, a genuine
  * SQLException surfacing into the DLQ route, and checkpoint-resume
  * without duplicate rows.
  *
  * Derby stands in for ClickHouse only at the wire: the SQL built by Spark's
  * JDBC writer (multi-row prepared INSERT, dialect-typed DDL) is the same
  * code path a `jdbc:ch://` URL takes — only the dialect differs.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def exec(db: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url(db))
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  private def readBack(db: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url(db)).option("dbtable", s"APP.$table").load()

  test("writeBatch INSERTs typed rows over a live JDBC connection") {
    val db = "graft_wb"
    exec(db, "CREATE TABLE events (event_id VARCHAR(64), n BIGINT, " +
      "score DOUBLE, ts TIMESTAMP)")
    val c = ClickHouseSink.Config(
      url = url(db), database = "APP", table = "events",
      mappings = Seq(
        ColumnMapping("id", "event_id", "String"),
        ColumnMapping("n", "n", "Int64"),
        ColumnMapping("score", "score", "Float64"),
        ColumnMapping("when", "ts", "DateTime")),
      idempotencyColumn = Some("id"))
    val batch = Seq(
      ("a", 1L, 0.5, "2025-06-01T10:00:00Z"),
      ("b", 2L, 1.5, "2025-06-01T10:00:01Z"),
      ("a", 1L, 0.5, "2025-06-01T10:00:00Z") // within-batch duplicate
    ).toDF("id", "n", "score", "when")
    ClickHouseSink.writeBatch(c)(batch)
    val rows = readBack(db, "events").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).toInstant.toString)).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("a", 1L, 0.5, "2025-06-01T10:00:00Z"),
      ("b", 2L, 1.5, "2025-06-01T10:00:01Z")))
  }

  test("per-schema-version batches issue one typed INSERT per version") {
    val db = "graft_ver"
    exec(db, "CREATE TABLE t (col_a VARCHAR(64), col_n BIGINT)")
    val c = ClickHouseSink.Config(url = url(db), database = "APP", table = "t",
      versionColumn = Some("ver"),
      versionMappings = Map(
        "v1" -> Seq(ColumnMapping("a", "col_a", "String")),
        "v2" -> Seq(ColumnMapping("a", "col_a", "String"),
          ColumnMapping("n", "col_n", "Int64"))))
    val df = Seq(("x", 1L, "v1"), ("y", 2L, "v2"), ("z", 3L, "v2"))
      .toDF("a", "n", "ver")
    ClickHouseSink.writeBatch(c)(df)
    val rows = readBack(db, "t").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString)))
      .sortBy(_._1)
    // v1 rows carry only col_a (col_n NULL); v2 rows carry both
    assert(rows.toSeq == Seq(
      ("x", None), ("y", Some("2")), ("z", Some("3"))))
  }

  test("a genuine SQLException from the driver routes the batch to the DLQ") {
    val db = "graft_err"
    exec(db, "CREATE TABLE narrow (a VARCHAR(8))")
    // a value wider than the column: the write fails inside Spark's JDBC
    // writer with a real driver SQLException (truncation); no "Code: NNN"
    // and no connection-ish words → Unknown → DLQ immediately, handler
    // keeps going (clickhouse.go:426-481 policy)
    val c = ClickHouseSink.Config(url = url(db), database = "APP",
      table = "narrow",
      mappings = Seq(ColumnMapping("a", "a", "String")))
    val dlqd = scala.collection.mutable.ArrayBuffer[String]()
    val handler = ClickHouseSink.foreachBatchHandler(
      c, df => dlqd += df.collect().head.getAs[String]("error"))
    handler(Seq(Tuple1("far-too-wide-for-varchar-8")).toDF("a"), 0L)
    assert(dlqd.length == 1)
    // the driver's own diagnostic reached the DLQ envelope
    assert(dlqd.head.toLowerCase.contains("truncat") ||
      dlqd.head.toLowerCase.contains("varchar"))
  }

  test("streaming attach: micro-batches land in the database; checkpoint resume does not duplicate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val db = "graft_stream"
    exec(db, "CREATE TABLE sunk (event_id VARCHAR(64), n BIGINT)")
    val c = ClickHouseSink.Config(url = url(db), database = "APP", table = "sunk",
      mappings = Seq(
        ColumnMapping("id", "event_id", "String"),
        ColumnMapping("n", "n", "Int64")),
      idempotencyColumn = Some("id"),
      maxDelaySeconds = 0)
    val ckpt = java.nio.file.Files.createTempDirectory("jdbc_sink_ckpt").toString
    val mem = MemoryStream[(String, Long)]
    def start() = ClickHouseSink.attach(
      mem.toDF.toDF("id", "n"), c, ckpt, _ => ()).start()
    mem.addData(("a", 1L), ("b", 2L))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint: already-committed offsets must not replay
    mem.addData(("c", 3L))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val rows = readBack(db, "sunk").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }
}
