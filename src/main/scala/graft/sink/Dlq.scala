package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Append a DLQ frame to a parquet path, stamping each row with a
    * monotonic `seq` (contiguous from 1 across appends, tracked in a
    * hidden side file). Consumers page by seq RANGE — a filter + top-n —
    * instead of re-sorting the whole queue per page. In-batch order is the
    * total column order (deterministic); appends to one DLQ path are
    * serialized through the owning query's foreachBatch, which is what
    * makes the read-stamp-advance below safe. */
  def writeParquet(path: String)(df: DataFrame): Unit = synchronized {
    val start = readSeq(path)
    val n = df.count()
    val w = Window.orderBy(df.columns.map(col): _*)
    df.withColumn("seq", row_number().over(w).cast("long") + lit(start - 1))
      .write.mode("append").parquet(path)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(seqPath(path), (start + n).toString.getBytes("UTF-8"))
  }

  private def seqPath(path: String) =
    java.nio.file.Paths.get(path, ".graft_dlq_seq")

  /** Next sequence number to stamp (1-based). */
  def readSeq(path: String): Long =
    try new String(java.nio.file.Files.readAllBytes(seqPath(path)), "UTF-8").trim.toLong
    catch { case _: Exception => 1L }
}
