package graft.sources.kafka

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("graft-kafka")` — a DataSource V2 Kafka reader speaking the real
  * wire protocol via [[WireClient]], with the SAME output schema as the
  * stock Kafka source (key/value binary, topic, partition, offset,
  * timestamp, timestampType), so pipelines written against `format("kafka")`
  * port by changing only the format string. Exists because this build
  * environment carries no Kafka connector artifact; the protocol is public
  * and small, and a source driven over a REAL socket (offset planning →
  * Fetch → CRC-verified record batches → checkpoint commit) verifies the
  * reference's front door (glassflow-api/internal/kafka/consumer.go) far
  * beyond an options-builder unit test.
  *
  * Options: `brokers` (host:port[,host:port…] — first is used for control
  * requests), `topic`, `startingOffsets` (earliest|latest, micro-batch
  * default earliest), `maxOffsetsPerTrigger` (admission control: per-batch
  * row cap distributed over partitions proportional to lag, the stock
  * source's policy).
  *
  * Scale shape: one [[InputPartition]] per Kafka partition per batch; each
  * Spark task opens its own socket and fetch-loops over its offset range
  * only — reads parallelize by topic partition exactly as the stock source,
  * and nothing about a partition's data ever passes through the driver
  * (the driver sees offsets only: int64s per partition).
  */
final class KafkaWireSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KafkaWireSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaWireTable(properties.asScala.toMap)
}

object KafkaWireSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private[kafka] final case class Endpoint(host: String, port: Int)

  private[kafka] def parseOptions(opts: Map[String, String]): (Endpoint, String) = {
    val ci = opts.map { case (k, v) => k.toLowerCase -> v }
    val brokers = ci.getOrElse("brokers",
      throw new IllegalArgumentException("graft-kafka: 'brokers' option is required"))
    val topic = ci.getOrElse("topic",
      throw new IllegalArgumentException("graft-kafka: 'topic' option is required"))
    val first = brokers.split(',').head.trim
    val (h, p) = first.lastIndexOf(':') match {
      case -1 => throw new IllegalArgumentException(s"graft-kafka: broker '$first' is not host:port")
      case i => (first.substring(0, i), first.substring(i + 1).toInt)
    }
    (Endpoint(h, p), topic)
  }

  /** {"0":12,"7":3} — partition → next offset to read. Hand-rolled because
    * the shape is flat and the checkpoint format must stay stable. */
  private[kafka] def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  private[kafka] def offsetsFromJson(s: String): Map[Int, Long] =
    """"(\d+)":(\d+)""".r.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap
}

private[kafka] final class KafkaWireTable(opts: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-kafka:${opts.getOrElse("topic", "?")}"
  override def schema(): StructType = KafkaWireSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = opts ++ options.asScala
    new ScanBuilder { override def build(): Scan = new KafkaWireScan(merged) }
  }
}

private[kafka] final class KafkaWireScan(opts: Map[String, String]) extends Scan {
  override def readSchema(): StructType = KafkaWireSource.Schema
  override def description(): String = "graft-kafka wire-protocol scan"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaWireMicroBatchStream(opts)
  override def toBatch: Batch = new KafkaWireBatch(opts)
}

/** Streaming offsets: partition → NEXT offset to read (exclusive end of
  * what's been planned), the stock source's convention. */
private[kafka] final case class KafkaWireOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = KafkaWireSource.offsetsToJson(offsets)
}

private[kafka] final class KafkaWireMicroBatchStream(opts: Map[String, String])
  extends MicroBatchStream with SupportsAdmissionControl {

  private val (endpoint, topic) = KafkaWireSource.parseOptions(opts)
  private val startingOffsets =
    opts.map { case (k, v) => k.toLowerCase -> v }.getOrElse("startingoffsets", "earliest")
  private val maxOffsetsPerTrigger =
    opts.map { case (k, v) => k.toLowerCase -> v }.get("maxoffsetspertrigger").map(_.toLong)

  // Control-plane client: driver-side only, offsets in/out — never records.
  private lazy val client = new WireClient(endpoint.host, endpoint.port)

  private def partitions(): Seq[Int] = {
    val meta = client.metadata(topic)
    if (meta.errorCode != 0)
      throw new java.io.IOException(s"graft-kafka: metadata error ${meta.errorCode} for $topic")
    meta.partitions.map(_.partition).sorted
  }

  override def initialOffset(): Offset = {
    val parts = partitions()
    val ts = if (startingOffsets == "latest") -1L else -2L
    KafkaWireOffset(client.listOffsets(topic, parts, ts))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[KafkaWireOffset].offsets
    val latest = client.listOffsets(topic, partitions(), -1L)
    limit match {
      case mr: ReadMaxRows =>
        // Distribute the row cap over partitions proportional to lag —
        // the stock source's rate-limit policy: a hot partition gets more
        // of the budget but no partition is starved outright.
        val lags = latest.map { case (p, end) =>
          p -> math.max(0L, end - startMap.getOrElse(p, end))
        }
        val total = lags.values.sum
        val cap = mr.maxRows()
        if (total <= cap) KafkaWireOffset(latest)
        else KafkaWireOffset(latest.map { case (p, end) =>
          val lag = lags(p)
          val share = if (total == 0) 0L else cap * lag / total
          p -> math.min(end, startMap.getOrElse(p, end) + share)
        })
      case _ => KafkaWireOffset(latest)
    }
  }

  override def deserializeOffset(json: String): Offset =
    KafkaWireOffset(KafkaWireSource.offsetsFromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaWireOffset].offsets
    val e = end.asInstanceOf[KafkaWireOffset].offsets
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, endOff)
      if (endOff > startOff)
        Some(KafkaWirePartition(endpoint.host, endpoint.port, topic, p, startOff, endOff): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = KafkaWireReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = try client.close() catch { case _: Throwable => () }
}

private[kafka] final class KafkaWireBatch(opts: Map[String, String]) extends Batch {
  private val (endpoint, topic) = KafkaWireSource.parseOptions(opts)
  override def planInputPartitions(): Array[InputPartition] = {
    val client = new WireClient(endpoint.host, endpoint.port)
    try {
      val parts = client.metadata(topic).partitions.map(_.partition).sorted
      val earliest = client.listOffsets(topic, parts, -2L)
      val latest = client.listOffsets(topic, parts, -1L)
      parts.flatMap { p =>
        val (s, e) = (earliest(p), latest(p))
        if (e > s) Some(KafkaWirePartition(endpoint.host, endpoint.port, topic, p, s, e): InputPartition)
        else None
      }.toArray
    } finally client.close()
  }
  override def createReaderFactory(): PartitionReaderFactory = KafkaWireReaderFactory
}

private[kafka] final case class KafkaWirePartition(
  host: String, port: Int, topic: String, partition: Int,
  startOffset: Long, endOffset: Long) extends InputPartition

private[kafka] object KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaWirePartitionReader(partition.asInstanceOf[KafkaWirePartition])
}

/** Executor-side fetch loop over [startOffset, endOffset): one socket per
  * task, records surfaced in offset order, CRC verified in the codec. */
private[kafka] final class KafkaWirePartitionReader(p: KafkaWirePartition)
  extends PartitionReader[InternalRow] {

  private val client = new WireClient(p.host, p.port)
  private val topicUtf8 = UTF8String.fromString(p.topic)
  private var buffer: Iterator[Records.Record] = Iterator.empty
  private var nextOffset = p.startOffset
  private var current: Records.Record = _

  override def next(): Boolean = {
    while (!buffer.hasNext && nextOffset < p.endOffset) {
      val res = client.fetch(p.topic, p.partition, nextOffset)
      if (res.records.isEmpty) {
        // Range was planned from a live log-end offset, so data below
        // endOffset must exist; an empty fetch below the HWM means the
        // requested offset aged out (retention) — surface it, don't spin.
        if (nextOffset < res.highWatermark)
          throw new java.io.IOException(
            s"graft-kafka: empty fetch at offset $nextOffset below hwm ${res.highWatermark} " +
              s"(partition ${p.partition}) — data lost to retention?")
        return false
      }
      // A fetch may return records below the requested offset (batch
      // granularity) or beyond our planned end — trim to the range.
      buffer = res.records.iterator
        .filter(r => r.offset >= nextOffset && r.offset < p.endOffset)
      nextOffset = math.max(nextOffset, res.records.map(_.offset).max + 1)
    }
    if (buffer.hasNext) { current = buffer.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = current
    InternalRow(
      r.key,
      r.value,
      topicUtf8,
      p.partition,
      r.offset,
      r.timestampMs * 1000L, // ms → µs
      0)                     // CreateTime
  }

  override def close(): Unit = client.close()
}
