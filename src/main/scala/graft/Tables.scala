package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All queries take the scale-factor directory as a runtime argument so the
  * same plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench).
  * Reads go through `spark.read.parquet` so Catalyst pushes filters and prunes
  * columns down to the scan — at 100 TB these tables would be partitioned
  * (e.g. by date) and the same code would get partition pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.parquet` has shipped `ts` in three encodings across driver
    * regenerations: parquet TIMESTAMP(NANOS) (read as a long — exact, no
    * float round-trip), naive micros (Spark infers TIMESTAMP_NTZ), and
    * UTC-adjusted micros (TIMESTAMP). Normalize all three to the same two
    * columns: `ts_ns: Long` (exact nanos, for windowed/stateful integer
    * arithmetic) and `ts: Timestamp` (micros — matching DuckDB's TIMESTAMP).
    * The NTZ→TIMESTAMP cast is instant-preserving because every session in
    * this project pins spark.sql.session.timeZone=UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
