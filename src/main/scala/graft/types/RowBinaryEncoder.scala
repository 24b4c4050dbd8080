package graft.types

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Row

/** ClickHouse RowBinary encoder — the public column-order binary INSERT
  * format (varint-length strings, little-endian fixed-width numerics,
  * uint32 DateTime / int64 DateTime64 ticks, UUID as two little-endian
  * u64 halves, varint-counted Array/Map, Nullable flag byte). The
  * reference's native-protocol batch append
  * (internal/batch/clickhouse/batch.go:60-80) is the same columnar-binary
  * idea; RowBinary is its documented HTTP-interface equivalent and
  * roughly halves wire volume vs JSONEachRow — at 100 TB the INSERT
  * bytes are the sink's network bill.
  *
  * Values come from [[graft.sink.SinkMapper]] output, so each column's
  * Spark type is exactly `CHType.sparkType`; a null in a non-Nullable
  * column encodes the ClickHouse column default (the server's
  * input_format_null_as_default contract, mirrored client-side). */
object RowBinaryEncoder {

  def encode(row: Row, types: Seq[CHType]): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    var i = 0
    while (i < types.length) {
      writeValue(out, types(i), if (row.isNullAt(i)) null else row.get(i))
      i += 1
    }
    out.toByteArray
  }

  private def writeValue(out: ByteArrayOutputStream, t: CHType, v: Any): Unit = {
    import CHType._
    t match {
      case CHNullable(inner) =>
        if (v == null) out.write(1)
        else { out.write(0); writeValue(out, inner, v) }
      case CHLowCardinality(inner) => writeValue(out, inner, v)
      case CHString =>
        str(out, if (v == null) "" else String.valueOf(v))
      case CHFixedString(n) =>
        val b = (if (v == null) "" else String.valueOf(v)).getBytes(UTF_8)
        if (b.length > n)
          throw new IllegalArgumentException(
            s"Code: 131. DB::Exception: String too long for type FixedString($n)")
        out.write(b, 0, b.length)
        var pad = n - b.length
        while (pad > 0) { out.write(0); pad -= 1 }
      case CHBool => out.write(if (v == java.lang.Boolean.TRUE) 1 else 0)
      case CHInt(8) => out.write(if (v == null) 0 else v.asInstanceOf[Byte].toInt)
      case CHInt(16) => le(out, if (v == null) 0L else v.asInstanceOf[Short].toLong, 2)
      case CHInt(32) => le(out, if (v == null) 0L else v.asInstanceOf[Int].toLong, 4)
      case CHInt(_) => le(out, if (v == null) 0L else v.asInstanceOf[Long], 8)
      case CHUInt(8) => out.write(if (v == null) 0 else v.asInstanceOf[Short].toInt & 0xff)
      case CHUInt(16) => le(out, if (v == null) 0L else v.asInstanceOf[Int].toLong, 2)
      case CHUInt(32) => le(out, if (v == null) 0L else v.asInstanceOf[Long], 4)
      case CHUInt(_) =>
        val big = if (v == null) java.math.BigInteger.ZERO
          else v.asInstanceOf[java.math.BigDecimal].toBigInteger
        le(out, big.longValue, 8) // low 64 bits: full u64 range round-trips
      case CHFloat32 =>
        le(out, java.lang.Float.floatToIntBits(
          if (v == null) 0f else v.asInstanceOf[Float]).toLong, 4)
      case CHFloat64 =>
        le(out, java.lang.Double.doubleToLongBits(
          if (v == null) 0d else v.asInstanceOf[Double]), 8)
      case CHEnum(bits, values) =>
        val s = if (v == null) values.minByOption(_._2).map(_._1).getOrElse("") else String.valueOf(v)
        val id = values.getOrElse(s,
          throw new IllegalArgumentException(
            s"Code: 691. DB::Exception: Unknown element '$s' for enum"))
        if (bits == 8) out.write(id) else le(out, id.toLong, 2)
      case CHUUID =>
        val u =
          if (v == null) new java.util.UUID(0L, 0L)
          else java.util.UUID.fromString(String.valueOf(v))
        le(out, u.getMostSignificantBits, 8)
        le(out, u.getLeastSignificantBits, 8)
      case CHDateTime(_) =>
        val sec = v match {
          case null => 0L
          case ts: java.sql.Timestamp => ts.getTime / 1000L
          case i: java.time.Instant => i.getEpochSecond
        }
        le(out, sec & 0xffffffffL, 4)
      case CHDateTime64(p, _) =>
        val micros = v match {
          case null => 0L
          case ts: java.sql.Timestamp =>
            ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
          case i: java.time.Instant =>
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        val ticks =
          if (p <= 6) micros / math.pow(10, (6 - p).toDouble).toLong
          else micros * math.pow(10, (p - 6).toDouble).toLong
        le(out, ticks, 8)
      case CHMap(_, vt) =>
        val m = if (v == null) Map.empty[Any, Any]
          else v.asInstanceOf[scala.collection.Map[Any, Any]]
        varint(out, m.size.toLong)
        m.foreach { case (k, mv) =>
          str(out, String.valueOf(k))
          writeValue(out, vt, mv)
        }
      case CHArray(inner) =>
        val xs = if (v == null) Seq.empty[Any] else v.asInstanceOf[scala.collection.Seq[Any]]
        varint(out, xs.size.toLong)
        xs.foreach(e => writeValue(out, inner, e))
    }
  }

  private def str(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    varint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def le(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
}
