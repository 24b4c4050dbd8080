package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not part of the driver contract): does a localCheckpoint'ed
  * frame keep its HashPartitioning, so a downstream groupBy on the same
  * key plans without an Exchange? Decides the k-core loop representation.
  */
object PartitioningProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 100000).map(i => (i % 997L, i.toLong)).toDF("u", "v")
      .repartition(col("u"))
      .persist()
    println("== groupBy(u) over checkpointed repartition(u) ==")
    val agg = df.groupBy("u").count()
    agg.collect()
    println(agg.queryExecution.executedPlan.toString.take(2000))
    println("== after a broadcast left_semi join, then groupBy(u) ==")
    val keep = df.groupBy("u").count().filter(col("count") > 50)
      .select(col("u"))
    val next = df.join(broadcast(keep), Seq("u"), "left_semi")
      .persist()
    val agg2 = next.groupBy("u").count()
    agg2.collect()
    println(agg2.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
