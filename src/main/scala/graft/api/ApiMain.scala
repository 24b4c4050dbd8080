package graft.api

import org.apache.spark.sql.SparkSession

import graft.pipeline.PipelineService

/** Standalone API server: `tools/run.sh graft.api.ApiMain [port]`. */
object ApiMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new ApiServer(spark, new PipelineService(spark))
    val bound = server.start(port)
    println(s"graft api listening on 127.0.0.1:$bound")
    Thread.currentThread().join()
  }
}
