package graft.sink

import graft.SparkSpec
import SinkMapper.ColumnMapping

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("error classification: retryable vs permanent vs unknown") {
    import ErrorClassifier._
    assert(classify(159) == Retryable) // timeout
    assert(classify(241) == Retryable) // memory limit
    assert(classify(242) == Retryable) // readonly table
    assert(classify(202) == Retryable) // too many queries
    assert(classify(6) == Permanent)   // parse
    assert(classify(16) == Permanent)  // no such column
    assert(classify(53) == Permanent)  // type mismatch
    assert(classify(349) == Permanent) // null in not-null
    assert(classify(777777) == Unknown)

    assert(classify(new RuntimeException("Code: 241. DB::Exception: Memory limit")) == Retryable)
    assert(classify(new RuntimeException("Code: 53. DB::Exception: Type mismatch")) == Permanent)
    assert(classify(new RuntimeException("connection refused")) == Retryable)
    assert(classify(new RuntimeException("something odd")) == Unknown)
    // the CH code is found through a wrapper (foreachBatch surfaces
    // executor errors wrapped in a SparkException)
    assert(classify(new RuntimeException("Job aborted",
      new RuntimeException("Code: 241. DB::Exception: Memory limit"))) == Retryable)
    // a stack trace EMBEDDED in the outer message must not keyword-match:
    // Derby/CH driver frames like ConnectionChild would otherwise turn a
    // permanent data fault into an infinite retry loop
    assert(classify(new RuntimeException(
      "Job aborted: truncation error\n\tat org.x.jdbc.ConnectionChild.handleException")) == Unknown)
  }

  test("insert sql uses mapping-declared column order") {
    val c = ClickHouseSink.Config(
      url = "jdbc:ch://h:8123", database = "db", table = "t",
      mappings = Seq(
        ColumnMapping("a", "col_a", "String"),
        ColumnMapping("b", "col_b", "Int64")))
    assert(ClickHouseSink.insertSql(c) == "INSERT INTO db.t (col_a, col_b)")
  }

  test("retry budget: retryable failures dead-letter after maxRetries, handler keeps going") {
    import org.apache.spark.sql.DataFrame
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t", maxRetries = 3)
    val dlqd = scala.collection.mutable.ArrayBuffer[String]()
    val capture = (df: DataFrame) => { dlqd += df.collect().head.getAs[String]("error"); () }
    val boom: DataFrame => Unit =
      _ => throw new RuntimeException("Code: 241. DB::Exception: Memory limit")
    val handler = ClickHouseSink.foreachBatchHandler(c, capture, Some(boom))
    val batch = Seq(("a", 1L)).toDF("id", "n")
    // attempts 1..maxRetries-1 rethrow (Spark would retry the batch from
    // the checkpoint on restart); the budget's last attempt dead-letters
    intercept[RuntimeException](handler(batch, 7L))
    intercept[RuntimeException](handler(batch, 7L))
    handler(batch, 7L)
    assert(dlqd.length == 1 && dlqd.head.contains("retry budget exhausted (3)"))
    // a different batch id has its own budget
    intercept[RuntimeException](handler(batch, 8L))
    // permanent errors skip the budget and dead-letter immediately
    val perm: DataFrame => Unit =
      _ => throw new RuntimeException("Code: 53. DB::Exception: Type mismatch")
    ClickHouseSink.foreachBatchHandler(c, capture, Some(perm))(batch, 0L)
    assert(dlqd.length == 2 && dlqd.last.contains("Code: 53"))
  }

  test("durable retry budget survives a handler rebuild (restart semantics)") {
    import org.apache.spark.sql.DataFrame
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t", maxRetries = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_budget").toString
    val dlqd = scala.collection.mutable.ArrayBuffer[String]()
    val capture = (df: DataFrame) => { dlqd += df.collect().head.getAs[String]("error"); () }
    val boom: DataFrame => Unit =
      _ => throw new RuntimeException("Code: 241. DB::Exception: Memory limit")
    val batch = Seq(("a", 1L)).toDF("id", "n")
    def fresh() = ClickHouseSink.foreachBatchHandler(c, capture, Some(boom), Some(dir))
    // two attempts on one handler, then the "driver restarts": a FRESH
    // handler must see the persisted count and dead-letter on attempt 3 —
    // an in-memory budget would reset and retry forever
    intercept[RuntimeException](fresh()(batch, 7L))
    intercept[RuntimeException](fresh()(batch, 7L))
    fresh()(batch, 7L)
    assert(dlqd.length == 1 && dlqd.head.contains("retry budget exhausted (3)"))
    // the exhausted batch's counter is cleared: a later retry cycle starts over
    intercept[RuntimeException](fresh()(batch, 7L))
    // success clears the persisted counter too
    val ok = ClickHouseSink.foreachBatchHandler(c, capture, Some((_: DataFrame) => ()), Some(dir))
    ok(batch, 7L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "7")))
  }

  test("retry budget over a live stream: sick batch dead-letters, stream continues") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t", maxRetries = 2)
    val dlqd = scala.collection.mutable.ArrayBuffer[Long]()
    // poison rows fail retryably; clean rows write fine
    val writer: DataFrame => Unit = { df =>
      if (df.filter(df.col("id") === "poison").count() > 0)
        throw new RuntimeException("Code: 159. DB::Exception: Timeout")
    }
    val handler = ClickHouseSink.foreachBatchHandler(c, df => dlqd += df.count(), Some(writer))
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
    val mem = MemoryStream[(String, Long)]
    def start() = mem.toDF.toDF("id", "n").writeStream
      .option("checkpointLocation", ckpt).foreachBatch(handler).start()
    mem.addData(("poison", 1L))
    // attempt 1 fails the query (restart-retries from checkpoint); attempt 2
    // exhausts the budget → DLQ, query stays alive
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    val q2 = start()
    q2.processAllAvailable()
    assert(dlqd.toSeq == Seq(1L))
    // the stream keeps processing after the dead-letter
    mem.addData(("clean", 2L))
    q2.processAllAvailable()
    q2.stop()
    assert(dlqd.toSeq == Seq(1L))
  }

  test("per-schema-version batching applies each version's own mapping") {
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t",
      versionColumn = Some("ver"),
      versionMappings = Map(
        "v1" -> Seq(ColumnMapping("a", "col_a", "String")),
        "v2" -> Seq(ColumnMapping("a", "col_a", "String"), ColumnMapping("n", "col_n", "Int64"))))
    val df = Seq(("x", 1L, "v1"), ("y", 2L, "v2"), ("z", 3L, "v2")).toDF("a", "n", "ver")
    val written = scala.collection.mutable.ArrayBuffer[(Seq[String], Long)]()
    ClickHouseSink.writeBatchWith(c, d => written += ((d.columns.toSeq, d.count())))(df)
    assert(written.toSeq == Seq(
      (Seq("col_a"), 1L),          // v1 shape
      (Seq("col_a", "col_n"), 2L)) // v2 shape
    )
  }

  test("per-schema-version batching over a live two-version stream") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // F3 (versioned transform) output carries a version id column; the sink
    // must issue one typed INSERT per version present in each micro-batch
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t",
      versionColumn = Some("ver"),
      versionMappings = Map(
        "v1" -> Seq(ColumnMapping("a", "col_a", "String")),
        "v2" -> Seq(ColumnMapping("a", "col_a", "String"), ColumnMapping("n", "col_n", "Int64"))))
    val written = scala.collection.mutable.ArrayBuffer[(Seq[String], Long)]()
    val handler = ClickHouseSink.foreachBatchHandler(c, _ => (),
      Some((d: DataFrame) => { written.synchronized { written += ((d.columns.toSeq, d.count())) }; () }))
    val mem = MemoryStream[(String, Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ver_ckpt").toString
    val q = mem.toDF.toDF("a", "n", "ver").writeStream
      .option("checkpointLocation", ckpt).foreachBatch(handler).start()
    mem.addData(("x", 1L, "v1"), ("y", 2L, "v2"), ("z", 3L, "v2"))
    q.processAllAvailable()
    q.stop()
    assert(written.toSeq == Seq(
      (Seq("col_a"), 1L),          // v1 rows in v1 shape
      (Seq("col_a", "col_n"), 2L)) // v2 rows in v2 shape
    )
  }

  test("F3 versioned transform chains into per-version sink batching") {
    import graft.operators.{TransformOp, VersionedTransform}
    val df = Seq(("x", 1L, "v1"), ("y", 2L, "v2")).toDF("a", "n", "ver")
    val routed = VersionedTransform("ver", Map(
      "v1" -> Seq(TransformOp.Rule("upper(a)", "a_u", "string")),
      "v2" -> Seq(TransformOp.Rule("upper(a)", "a_u", "string"),
        TransformOp.Rule("n * 10", "n10", "int64"))))(df)
    val c = ClickHouseSink.Config(url = "x", database = "db", table = "t",
      versionColumn = Some("ver"),
      versionMappings = Map(
        "v1" -> Seq(ColumnMapping("a_u", "col_a", "String")),
        "v2" -> Seq(ColumnMapping("a_u", "col_a", "String"), ColumnMapping("n10", "col_n", "Int64"))))
    val written = scala.collection.mutable.ArrayBuffer[(Seq[String], Seq[Seq[Any]])]()
    ClickHouseSink.writeBatchWith(c, d =>
      written += ((d.columns.toSeq, d.collect().toSeq.map(_.toSeq))))(routed)
    assert(written.toSeq == Seq(
      (Seq("col_a"), Seq(Seq("X"))),
      (Seq("col_a", "col_n"), Seq(Seq("Y", 20L)))))
  }

  test("dlq envelope wraps original rows as JSON") {
    val df = Seq(("x", 5L)).toDF("id", "n")
    val out = Dlq.envelope("sink", "Code: 53")(df).collect().head
    assert(out.getAs[String]("component") == "sink")
    assert(out.getAs[String]("error") == "Code: 53")
    assert(out.getAs[String]("original_message") == """{"id":"x","n":5}""")
  }
}
