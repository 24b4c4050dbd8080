package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Stream health metrics — I5 (the reference samples JetStream depth/ratio
  * gauges, glassflow-api/internal/stream/sampler.go:16-60). Spark surfaces
  * the equivalent through StreamingQueryListener progress events:
  * input rate, processing rate, batch duration, state rows.
  */
object Metrics {

  final case class Progress(
    queryName: String,
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    stateRows: Long)

  /** Attach a listener that records per-batch progress (bounded buffer). */
  def attach(spark: SparkSession, keep: Int = 1000): StreamListener = {
    val l = new StreamListener(keep)
    spark.streams.addListener(l)
    l
  }

  final class StreamListener(keep: Int) extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[Progress]()

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val stateRows = Option(p.stateOperators)
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      buf.add(Progress(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        nan0(p.inputRowsPerSecond), nan0(p.processedRowsPerSecond), stateRows))
      while (buf.size > keep) buf.poll()
    }

    private def nan0(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

    def snapshot: Seq[Progress] = {
      val it = buf.iterator()
      val out = Seq.newBuilder[Progress]
      while (it.hasNext) out += it.next()
      out.result()
    }
  }
}
