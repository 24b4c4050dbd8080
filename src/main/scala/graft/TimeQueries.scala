package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual driver queries in a warm session —
  * `tools/run.sh graft.TimeQueries <sfDir> <q1> [q2 ...]` (each query runs
  * twice; the second, warm measurement is what matters for plan work —
  * the first pays JVM/codegen warmup). Not part of the driver contract.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(SparkEntry.queries(q)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
