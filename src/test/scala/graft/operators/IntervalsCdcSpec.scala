package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsCdcSpec extends SparkSpec {
  import spark.implicits._

  test("mergeIntervals: overlapping and touching intervals merge, gaps split") {
    // key 1: [0,10] [5,20] [20,30] all one island (touch joins); [40,50] apart
    // key 2: single interval
    val df = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      (2L, 7L, 9L)
    ).toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L), (2L, 7L, 9L, 1L)))
  }

  test("mergeIntervals: contained interval does not reopen an island") {
    // [0,100] then [10,20] (contained) then [50,60] (contained): one island
    val df = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 50L, 60L)).toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e").collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 0L && out.head.getLong(2) == 100L)
  }

  test("coverage sums island lengths") {
    val df = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 35L)).toDF("k", "s", "e")
    val out = Intervals.coverage(df, Seq("k"), "s", "e").collect()
    assert(out.head.getAs[Long]("covered") == 25L) // [0,20]=20 + [30,35]=5
    assert(out.head.getAs[Long]("n_islands") == 2L)
  }

  test("applyChangelog keeps latest upsert, drops deleted keys, survives repartition") {
    val log = Seq(
      (1L, 10L, false, "a"), (1L, 30L, false, "c"), (1L, 20L, false, "b"),
      (2L, 10L, false, "x"), (2L, 50L, true, "gone"),
      (3L, 5L, true, "never"), (3L, 9L, false, "alive")
    ).toDF("k", "seq", "del", "v")
    for (parts <- Seq(1, 7)) {
      val out = CdcMerge.applyChangelog(log.repartition(parts), Seq("k"),
          Seq("seq"), "del", Seq("v"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out.toSeq == Seq((1L, 30L, "c"), (3L, 9L, "alive")), s"parts=$parts")
    }
  }

  test("applyChangelog matches window-rn formulation on random logs") {
    val n = 500
    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, rnd.nextInt(5) == 0, s"v$i")
    }
    val df = rows.toDF("k", "seq", "del", "v")
    val got = CdcMerge.applyChangelog(df, Seq("k"), Seq("seq"), "del", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = rows.groupBy(_._1).toSeq
      .map { case (k, ch) => ch.maxBy(_._2) }
      .filter(!_._3)
      .map(t => (t._1, t._2, t._4))
      .sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("applyChangelogStreaming finalizes to the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // (key, tsMs, seq, del, payload-json) — arrival order scrambled
    val changes = Seq(
      (1L, 1000L, 1000L, false, """{"v":"a"}"""),
      (1L, 3000L, 3000L, false, """{"v":"c"}"""),
      (1L, 2000L, 2000L, false, """{"v":"b"}"""),
      (2L, 1500L, 1500L, false, """{"v":"x"}"""),
      (2L, 2500L, 2500L, true, """{"v":"gone"}""")
    )
    val ms = MemoryStream[(Long, Long, Long, Boolean, String)]
    ms.addData(changes)
    // sentinel far future to push the watermark past every key's timeout
    ms.addData((99L, 10L * 86400000L, 1L, true, "{}"))
    val df = ms.toDF.toDF("k", "tms", "seq", "del", "pay")
      .select(col("k"), timestamp_millis(col("tms")).as("ts"), col("seq"),
        col("del"), col("pay"))
    val out = CdcMerge.applyChangelogStreaming(df, "k", "ts", "seq", "del",
      "pay", gapMs = 1000L, watermarkDelay = "0 seconds")
    val qn = s"cdc_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val res = spark.table(qn).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(res.toSeq == Seq((1L, 3000L, """{"v":"c"}""")))
  }
  test("snapshotDiff emits I/U/D with null-safe attr compare, drops unchanged") {
    val old = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
    ).toDF("k", "t", "v")
    val neu = Seq(
      (1L, "a", 10L),           // unchanged -> dropped
      (2L, "B", 20L),           // attr change -> U
      (4L, "d", 41L),           // value change -> U
      (5L, "e", 50L)            // new key -> I; key 3 missing -> D
    ).toDF("k", "t", "v")
    for (parts <- Seq(1, 5)) {
      val out = CdcMerge.snapshotDiff(old.repartition(parts),
          neu.repartition(parts), Seq("k"), Seq("t", "v"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.toSeq == Seq((2L, "U"), (3L, "D"), (4L, "U"), (5L, "I")),
        s"parts=$parts")
    }
    // null -> value is a genuine update (null-safe compare)
    val o2 = Seq((1L, Option.empty[String], 1L)).toDF("k", "t", "v")
    val n2 = Seq((1L, Option("x"), 1L)).toDF("k", "t", "v")
    val u = CdcMerge.snapshotDiff(o2, n2, Seq("k"), Seq("t", "v")).collect()
    assert(u.length == 1 && u.head.getString(1) == "U")
    assert(u.head.getAs[String]("old_t") == null)
    assert(u.head.getAs[String]("new_t") == "x")
  }
}
