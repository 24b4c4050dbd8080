package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dead-letter queue envelope — every stage wraps failed rows as
  * `{component, error, original_message}` (reference
  * glassflow-api/internal/models/dlq.go:23-43; middleware
  * internal/processor/dlq_processor.go:13-69). The DLQ is just another
  * sink (Kafka topic / table); re-consuming it is a normal source read.
  */
object Dlq {

  /** Wrap failed rows in the DLQ envelope. The original row is JSON-encoded
    * whole, matching the reference's original_message payload. */
  def envelope(component: String, error: String)(df: DataFrame): DataFrame =
    df.select(
      lit(component).as("component"),
      lit(error).as("error"),
      to_json(struct(df.columns.map(col): _*)).as("original_message"),
      current_timestamp().as("failed_at"))

  /** Append a DLQ frame to a parquet/delta path (batch flows). */
  def writeParquet(path: String)(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
}
