package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: replicate the declared streaming queries' MemoryStream
  * harness and print per-micro-batch duration breakdowns
  * (StreamingQueryProgress.durationMs) — where does the fixed ~2-3.5 s
  * per streaming oracle query actually go? */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    Seq("8", "4", "2", "8", "4", "2").zipWithIndex.foreach { case (np, attempt) =>
      val rows = graft.Tables.events(spark, sfDir)
        .select(col("user_id"), expr("ts_ns div 1000").as("tus"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val maxTus = rows.map(_._2).max
      val gapUs = 12L * 3600 * 1000000
      val ms = MemoryStream[(Long, Long, Double)]
      ms.addData(rows.toSeq)
      ms.addData((-1L, maxTus + 3 * gapUs, 0.0))
      val events = ms.toDF.toDF("user_id", "tus", "value")
        .select(col("user_id"), timestamp_micros(col("tus")).as("ts"),
          col("value"))
      val sessions = graft.operators.Sessionize.streaming(
        events, "user_id", "ts", "12 hours", "0 seconds",
        valueCol = Some("value"))
      val qn = s"probe_$attempt"
      val prior = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", np)
      val t0 = System.nanoTime()
      val q = sessions.writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", s"/dev/shm/$qn")
        .outputMode("append").start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prior)
      println(f"== parts=$np attempt $attempt: wall $wall%.2f s, " +
        s"${q.recentProgress.length} progress entries")
      q.recentProgress.foreach { p =>
        println(s"   batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(s"/dev/shm/$qn"))
    }
    spark.stop()
  }
}
