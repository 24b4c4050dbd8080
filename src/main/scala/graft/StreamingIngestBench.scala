package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sink.SinkMapper
import graft.sources.JsonIngest
import graft.types.EngineSchema

/** Streaming-mode ingest throughput: the same ~1.5 KB telemetry-JSON
  * pipeline as [[IngestBench]], but run as a real Structured Streaming
  * query — rate source → JSON synth → parse/validate → typed mapping →
  * noop streaming sink — because the reference IS a streaming system and
  * batch-path numbers alone overstate comparability.
  * The source is `rate-micro-batch`: a FIXED row count per micro-batch, so
  * every batch does identical work and rows/trigger-second is the max
  * sustainable throughput with micro-batch overheads included. (The plain
  * `rate` source accumulates backlog when provisioned above the service
  * rate — batch durations grow geometrically and a slow host can finish
  * zero steady-state batches inside the measurement window, which is
  * exactly how round 4/5 runs lost this number.) Reported: steady-state
  * events/s with the first data batch (JIT/codegen warm-up) dropped.
  */
object StreamingIngestBench {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(80)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"),
        "graft-sibench-").toString
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 2000000L)
      .option("numPartitions", cpus.toInt)
      .load()
      .select(col("value").as("id"))
    val declared = EngineSchema.structFor(IngestBench.fields)
    val (valid, _) = JsonIngest.ingest(IngestBench.jsonFor(rate), "value", declared)
    val q = SinkMapper(IngestBench.mappings)(valid)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("0 seconds")) // back-to-back batches
      .start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress
    val failure = q.exception
    q.stop()
    spark.stop()
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(ckpt)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: Throwable => () }
    // A dead query must be loud: the value -1 alone cost round 4 its
    // streaming parity number with no trace of why.
    failure.foreach { e =>
      System.err.println(s"streaming query FAILED: ${e.message}")
      e.getCause match { case null => () case c => c.printStackTrace() }
    }
    if (progress.count(_.numInputRows > 0) <= 1)
      System.err.println(
        s"streaming bench produced ${progress.length} progress updates, " +
          s"${progress.count(_.numInputRows > 0)} with data — too few for a " +
          "steady-state rate (need >= 2 data batches)")
    progress.foreach(p => System.err.println(
      s"batch rows=${p.numInputRows} ms=${p.durationMs.get("triggerExecution")}"))
    // steady state: drop the first DATA batch (cold JIT/codegen), then
    // rate = rows / trigger-exec time over what completed
    val steady = progress.filter(_.numInputRows > 0).drop(1)
    val rows = steady.map(_.numInputRows).sum
    val secs = steady.map(_.durationMs.get("triggerExecution").toLong).sum / 1000.0
    val rps = if (secs > 0) rows / secs else -1.0
    println(f"""{"metric":"streaming_ingest_throughput","value":$rps%.0f,""" +
      s""""unit":"events_per_sec","batches":${steady.length},""" +
      s""""rows":$rows,""" +
      """"note":"steady-state Structured Streaming micro-batch rate (rate-micro-batch source, fixed 2M rows/batch; warm-up batch dropped); same 35-field full-schema validation as the batch bench"}""")
  }
}
