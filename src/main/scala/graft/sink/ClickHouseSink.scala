package graft.sink

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sink.SinkMapper.ColumnMapping

/** ClickHouse batch sink — the reference's sink component
  * (glassflow-api/internal/sink/clickhouse.go): buffer micro-batches, map to
  * typed columns, INSERT, classify failures.
  *
  * Spark shape: `writeStream.foreachBatch` + `Trigger.ProcessingTime(max
  * delay)` replaces the count/time dual-trigger buffer (clickhouse.go:
  * 141-206); within-batch idempotency (reference batch/clickhouse/batch.go)
  * is `dropDuplicates` on the source offset column; cross-restart
  * exactly-once comes from checkpointing + idempotent insert keys.
  */
object ClickHouseSink {

  final case class Config(
    url: String,                        // jdbc:clickhouse://host:8123/db or jdbc:ch://...
    database: String,
    table: String,
    username: String = "default",
    password: String = "",
    mappings: Seq[ColumnMapping] = Nil,
    maxBatchSize: Long = 100000,
    maxDelaySeconds: Int = 60,          // reference default flush delay (constants.go:238)
    maxRetries: Int = 10,               // reference MaxDeliver (constants.go:157-166)
    idempotencyColumn: Option[String] = None) // e.g. kafka offset

  /** `INSERT INTO db.table (c1, c2, ...)` column list — deterministic order
    * from the mapping config (reference clickhouse.go:701-718). */
  def insertColumns(c: Config): Seq[String] = c.mappings.map(_.column)

  def insertSql(c: Config): String =
    s"INSERT INTO ${c.database}.${c.table} (${insertColumns(c).mkString(", ")})"

  /** Write one micro-batch via JDBC (requires the ClickHouse JDBC driver on
    * the cluster classpath). Used from foreachBatch. */
  def writeBatch(c: Config)(df: DataFrame): Unit = {
    val deduped = c.idempotencyColumn.fold(df)(col => df.dropDuplicates(col))
    val mapped = if (c.mappings.nonEmpty) SinkMapper(c.mappings)(deduped) else deduped
    mapped.write
      .format("jdbc")
      .option("url", c.url)
      .option("dbtable", s"${c.database}.${c.table}")
      .option("user", c.username)
      .option("password", c.password)
      .option("batchsize", c.maxBatchSize.toString)
      .option("isolationLevel", "NONE")
      .mode("append")
      .save()
  }

  /** foreachBatch handler with the reference's error policy: retryable →
    * rethrow (Spark retries the batch from the checkpoint), permanent /
    * unknown → DLQ writer, stream continues. */
  def foreachBatchHandler(c: Config, dlq: DataFrame => Unit)(batch: DataFrame, batchId: Long): Unit = {
    try writeBatch(c)(batch)
    catch {
      case t: Throwable => ErrorClassifier.classify(t) match {
        case ErrorClassifier.Retryable => throw t
        case _ => dlq(Dlq.envelope("sink", t.getMessage)(batch))
      }
    }
  }

  /** Attach the sink to a streaming DataFrame: micro-batch cadence is the
    * reference's max_delay_time. */
  def attach(df: DataFrame, c: Config, checkpoint: String, dlq: DataFrame => Unit): DataStreamWriter[Row] =
    df.writeStream
      .trigger(Trigger.ProcessingTime(s"${c.maxDelaySeconds} seconds"))
      .option("checkpointLocation", checkpoint)
      .foreachBatch(foreachBatchHandler(c, dlq) _)
}
