package graft

import org.apache.spark.sql.SparkSession

/** Benchmark contract: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A warm-up pass (flagship on sf0.001) runs first so the first timed query
  * doesn't absorb session/codegen start-up cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q_a,q_b limits the run (profiling aid); the driver
    // never sets it, so round benches always cover every query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // BASELINE.md parity metric: ingest-only pipeline (1.5 KB telemetry
    // JSON parse+validate+typed-map) events/sec on this host. Warm-up run
    // first: the JSON parse path needs JIT/codegen warm-up, and timing the
    // first pass under-reports steady-state by ~3×.
    val ingestRate =
      try {
        // drop caches the query sweep left behind — ingest should measure
        // the parse+map path, not the sweep's GC debt
        spark.catalog.clearCache()
        System.gc()
        IngestBench.run(spark, 100000L)
        IngestBench.run(spark, 2000000L)
      }
      catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      f""""ingest_events_per_sec":$ingestRate%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
