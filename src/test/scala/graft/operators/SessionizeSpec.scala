package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 10L * 1000000 // 10 s

  private def toEvents(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("user_id", "t_us", "value")
      .select(col("user_id"), timestamp_micros(col("t_us")).as("ts"), col("value"))

  test("batch: events within the gap merge, >= gap splits (session_window rule)") {
    val df = toEvents(Seq(
      (1L, 0L, 1.0), (1L, GapUs - 1, 1.0),     // merge: diff = gap-1
      (1L, 2 * GapUs - 1 + GapUs, 1.0),        // split: diff = gap exactly... see below
      (2L, 0L, 1.0), (2L, GapUs, 1.0)))        // split: diff = gap
    val out = Sessionize.batch(df, "user_id", "ts", GapUs)
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    // user 1: [0, gap-1] one session of 2, then a later singleton
    // user 2: two singletons (diff == gap splits, matching session_window)
    assert(out == Set((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("batch: exact cents totals and duration") {
    val df = toEvents(Seq((7L, 0L, 12.31), (7L, 5L * 1000000, 0.07)))
    val r = Sessionize.batch(df, "user_id", "ts", GapUs, valueCol = Some("value"))
      .select("n_events", "value_cents", "duration_us")
      .as[(Long, Long, Long)].head()
    assert(r == ((2L, 1238L, 5000000L)))
  }

  test("streaming session_window equals batch gaps-and-islands on the same data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 0L, 1.5), (1L, 3L * 1000000, 2.25), (1L, 20L * 1000000, 4.0),
      (2L, 1L * 1000000, 8.0), (2L, 30L * 1000000, 16.0), (2L, 31L * 1000000, 0.5),
      (3L, 100L * 1000000, 1.0))
    val stream = MemoryStream[(Long, Long, Double)]
    stream.addData(rows: _*)
    // watermark sentinel far in the future so every real session closes
    stream.addData((99L, 86400L * 1000000, 0.0))
    val events = stream.toDF().toDF("user_id", "t_us", "value")
      .select(col("user_id"), timestamp_micros(col("t_us")).as("ts"), col("value"))
    val q = Sessionize.streaming(events, "user_id", "ts", "10 seconds", "0 seconds",
        valueCol = Some("value"))
      .writeStream.format("memory").queryName("sess_par").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sess_par").filter(col("user_id") =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events", "value_cents",
        "duration_us")
      .collect().toSet
    val batch = Sessionize.batch(toEvents(rows), "user_id", "ts", GapUs,
        valueCol = Some("value"))
      .select("user_id", "session_start", "session_end", "n_events", "value_cents",
        "duration_us")
      .collect().toSet
    assert(streamed == batch)
  }

  test("batch sessionize matches an in-memory model on random streams") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 400).map { _ =>
        (rnd.nextInt(6).toLong, rnd.nextLong(200L * 1000000), rnd.nextInt(1000) / 100.0)
      }
      val got = Sessionize.batch(toEvents(rows).repartition(7), "user_id", "ts", GapUs,
          valueCol = Some("value"))
        .select("user_id", "n_events", "value_cents", "duration_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(identity).view.mapValues(_.size).toMap
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        val sorted = evs.map(e => (e._2, e._3)).sorted
        val sessions = sorted.foldLeft(List.empty[List[(Long, Double)]]) {
          case (acc, e) => acc match {
            case cur :: rest if e._1 - cur.head._1 < GapUs => (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }
        sessions.map { sess =>
          val ts = sess.map(_._1)
          (u, sess.size.toLong,
            sess.map(e => math.round(e._2 * 100)).sum,
            ts.max - ts.min)
        }
      }.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expect, s"seed $seed")
    }
  }
}
