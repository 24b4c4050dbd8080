package graft.api

import org.apache.spark.sql.SparkSession

import graft.pipeline.PipelineService

/** Standalone API server: `tools/run.sh graft.api.ApiMain [port] [dlqRoot]`.
  * DLQ endpoints stay disabled unless a DLQ root is given (arg 2 or
  * GRAFT_DLQ_ROOT) — they expose filesystem reads/deletes confined to it. */
object ApiMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val dlqRoot = args.drop(1).headOption.orElse(sys.env.get("GRAFT_DLQ_ROOT"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RocksDB state store: stateful operators (dedup TTL state, temporal
      // join buffers) keep state off-heap/on-disk instead of on the JVM
      // heap — the production default for long-TTL, hot-key state at scale
      // (HDFSBackedStateStore holds every key in executor memory).
      // Compatibility with our flatMapGroupsWithState operators is
      // asserted in DedupSpec/JoinSpec.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new ApiServer(spark, new PipelineService(spark, dlqRoot))
    val bound = server.start(port)
    println(s"graft api listening on 127.0.0.1:$bound")
    Thread.currentThread().join()
  }
}
