package graft.types

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `FORMAT Native` DECODER — the read-side inverse of
  * [[NativeEncoder]]: a server response body (one or more columnar
  * blocks: `varint n_cols, varint n_rows`, then per column its name,
  * declared type text, and column-major data) decoded straight into
  * Catalyst [[InternalRow]]s, with values in the representations Spark's
  * execution layer expects (UTF8String, micros-since-epoch longs, days
  * ints, [[Decimal]], GenericArrayData / ArrayBasedMapData). The
  * CHType → Spark type contract is `CHType.sparkType` — the same mapping
  * the sink tier validates against, so a table written through
  * [[graft.sink.ClickHouseSink]] reads back with the schema the writer
  * declared.
  *
  * Per-value scalar layouts equal RowBinary's (the Native format's
  * documented property); the structural differences — grouped null
  * masks, u64 offset arrays for Array/Map, element columns back to back
  * for Tuple — are handled here. LowCardinality columns arrive as their
  * full inner type when the client does not advertise dictionary support
  * (we never do — `low_cardinality_allow_in_native_format` stays at the
  * plain-column behavior for INSERT symmetry).
  *
  * Map columns decode to Map(String, String) — the engine-wide Map
  * contract the sink tier coerces to (reference mapper/types.go:238-276)
  * — so a round-trip through write + read is value-stable.
  */
object NativeDecoder {

  /** Decode every block in `body`. Column order follows the BLOCK header
    * (the SELECT list order), checked against `expect` by name so a
    * server answering columns in a different order cannot silently
    * misalign values. */
  def decode(body: Array[Byte], expect: Seq[(String, CHType)]): Iterator[InternalRow] = {
    val in = new Reader(body)
    new Iterator[InternalRow] {
      private var rows: Iterator[InternalRow] = Iterator.empty
      private def advance(): Unit =
        while (!rows.hasNext && in.hasMore) rows = decodeBlock(in, expect)
      def hasNext: Boolean = { advance(); rows.hasNext }
      def next(): InternalRow = { advance(); rows.next() }
    }
  }

  private def decodeBlock(in: Reader, expect: Seq[(String, CHType)]): Iterator[InternalRow] = {
    val ncols = in.varint().toInt
    val nrows = in.varint().toInt
    if (ncols == 0 && nrows == 0) return Iterator.empty
    if (ncols != expect.length)
      throw new IllegalArgumentException(
        s"Native block has $ncols columns, expected ${expect.length}")
    val cols = new Array[Array[Any]](ncols)
    var c = 0
    while (c < ncols) {
      val name = in.str()
      in.str() // declared type text: the expected CHType drives the decode
      if (name != expect(c)._1)
        throw new IllegalArgumentException(
          s"Native block column $c is '$name', expected '${expect(c)._1}'")
      cols(c) = readColumn(in, expect(c)._2, nrows)
      c += 1
    }
    (0 until nrows).iterator.map { r =>
      val vals = new Array[Any](ncols)
      var i = 0
      while (i < ncols) { vals(i) = cols(i)(r); i += 1 }
      new GenericInternalRow(vals)
    }
  }

  /** One column's values, already in Catalyst representation. */
  private def readColumn(in: Reader, t: CHType, n: Int): Array[Any] = {
    import CHType._
    t match {
      case CHLowCardinality(inner) => readColumn(in, inner, n)
      case CHNullable(inner) =>
        val mask = new Array[Boolean](n)
        var i = 0
        while (i < n) { mask(i) = in.u8() == 1; i += 1 }
        val vals = readColumn(in, inner, n)
        i = 0
        while (i < n) { if (mask(i)) vals(i) = null; i += 1 }
        vals
      case CHArray(inner) =>
        val offs = new Array[Int](n)
        var i = 0
        while (i < n) { offs(i) = in.i64().toInt; i += 1 }
        val flat = readColumn(in, inner, if (n == 0) 0 else offs(n - 1))
        var prev = 0
        val out = new Array[Any](n)
        i = 0
        while (i < n) {
          out(i) = new GenericArrayData(java.util.Arrays.copyOfRange(
            flat.asInstanceOf[Array[AnyRef]], prev, offs(i)))
          prev = offs(i)
          i += 1
        }
        out
      case CHMap(_, vt) =>
        val offs = new Array[Int](n)
        var i = 0
        while (i < n) { offs(i) = in.i64().toInt; i += 1 }
        val total = if (n == 0) 0 else offs(n - 1)
        val keys = new Array[Any](total)
        i = 0
        while (i < total) { keys(i) = UTF8String.fromBytes(in.take(in.varint().toInt)); i += 1 }
        // engine Map contract is Map(String, String): values render to text
        val vals = readColumn(in, vt, total).map(v =>
          if (v == null) null else UTF8String.fromString(renderMapValue(vt, v)))
        var prev = 0
        val out = new Array[Any](n)
        i = 0
        while (i < n) {
          out(i) = new ArrayBasedMapData(
            new GenericArrayData(java.util.Arrays.copyOfRange(
              keys.asInstanceOf[Array[AnyRef]], prev, offs(i))),
            new GenericArrayData(java.util.Arrays.copyOfRange(
              vals.asInstanceOf[Array[AnyRef]], prev, offs(i))))
          prev = offs(i)
          i += 1
        }
        out
      case CHTuple(elems) =>
        val byElem = elems.map(e => readColumn(in, e._2, n))
        val out = new Array[Any](n)
        var r = 0
        while (r < n) {
          val vals = new Array[Any](elems.length)
          var e = 0
          while (e < elems.length) { vals(e) = byElem(e)(r); e += 1 }
          out(r) = new GenericInternalRow(vals)
          r += 1
        }
        out
      case scalar => Array.tabulate[Any](n)(_ => readScalar(in, scalar))
    }
  }

  /** A decoded Map value back to its engine-tier text form. Catalyst
    * values render through Spark-compatible formatting (Decimal via
    * toBigDecimal so trailing scale digits survive). */
  private def renderMapValue(t: CHType, v: Any): String = v match {
    case s: UTF8String => s.toString
    case d: Decimal => d.toBigDecimal.bigDecimal.toPlainString
    case other => String.valueOf(other)
  }

  private def readScalar(in: Reader, t: CHType): Any = {
    import CHType._
    t match {
      case CHString => UTF8String.fromBytes(in.take(in.varint().toInt))
      case CHFixedString(w) =>
        // strip the server's NUL padding (the engine-tier text form)
        val b = in.take(w)
        var end = w
        while (end > 0 && b(end - 1) == 0) end -= 1
        UTF8String.fromBytes(b, 0, end)
      case CHBool => in.u8() != 0
      case CHInt(8) => in.u8().toByte
      case CHInt(16) => in.i16().toShort
      case CHInt(32) => in.i32()
      case CHInt(_) => in.i64()
      case CHUInt(8) => in.u8().toShort
      case CHUInt(16) => (in.i16() & 0xffff)
      case CHUInt(32) => in.i32() & 0xffffffffL
      case CHUInt(_) =>
        Decimal(BigDecimal(java.lang.Long.toUnsignedString(in.i64())), 20, 0)
      case CHFloat32 => java.lang.Float.intBitsToFloat(in.i32())
      case CHFloat64 => java.lang.Double.longBitsToDouble(in.i64())
      case CHDecimal(p, s) =>
        val width = if (p <= 9) 4 else if (p <= 18) 8 else 16
        val be = in.take(width).reverse
        Decimal(BigDecimal(BigInt(new java.math.BigInteger(be)), s), p, s)
      case CHDate => in.i16() & 0xffff // days since epoch (IntegerType)
      case CHDate32 => in.i32()
      case CHEnum(bits, values) =>
        val id = if (bits == 8) in.u8().toByte.toInt else in.i16()
        values.find(_._2 == id).map(l => UTF8String.fromString(l._1))
          .getOrElse(throw new IllegalArgumentException(s"Unknown enum id $id"))
      case CHDateTime(_) => (in.i32() & 0xffffffffL) * 1000000L // micros
      case CHDateTime64(p, _) =>
        val ticks = in.i64()
        if (p <= 6) {
          var unit = 1L
          var i = p
          while (i < 6) { unit *= 10; i += 1 }
          ticks * unit
        } else {
          var div = 1L
          var i = 6
          while (i < p) { div *= 10; i += 1 }
          Math.floorDiv(ticks, div)
        }
      case CHUUID =>
        val hi = in.i64(); val lo = in.i64()
        UTF8String.fromString(new java.util.UUID(hi, lo).toString)
      case CHIPv4 => UTF8String.fromString(IpCodec.formatV4(in.i32() & 0xffffffffL))
      case CHIPv6 => UTF8String.fromString(IpCodec.formatV6(in.take(16)))
      case other =>
        throw new IllegalArgumentException(s"Native decode: unsupported scalar $other")
    }
  }

  /** Little-endian cursor over a response body, bounds-checked so a
    * truncated response fails loudly instead of zero-padding. */
  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasMore: Boolean = pos < buf.length
    def u8(): Int = {
      if (pos >= buf.length) throw new IndexOutOfBoundsException("truncated Native response")
      val v = buf(pos) & 0xff; pos += 1; v
    }
    def i16(): Int = u8() | (u8() << 8)
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def i64(): Long = (i32() & 0xffffffffL) | (i32().toLong << 32)
    def varint(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length)
        throw new IndexOutOfBoundsException("truncated Native response")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    def str(): String = new String(take(varint().toInt), UTF_8)
  }
}
