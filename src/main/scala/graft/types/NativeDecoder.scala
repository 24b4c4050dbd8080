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
  * for Tuple — are handled here. LowCardinality columns decode their
  * documented DICTIONARY serialization (version, flags, dict block,
  * narrow keys — see the readColumn branch), which is what a real server
  * sends by default and the reason LC exists: the dictionary ships once
  * per block, the rows as u8/u16 keys. A server converting LC to
  * ordinary (`low_cardinality_allow_in_native_format=0`) declares the
  * inner type in the block header and decodes on the plain path.
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
  def decode(body: Array[Byte], expect: Seq[(String, CHType)]): Iterator[InternalRow] =
    decode(new java.io.ByteArrayInputStream(body), expect)

  /** STREAMING decode: blocks are pulled off the live InputStream one at a
    * time as the iterator advances — peak memory is ONE block's decoded
    * columns (the server bounds block size via max_block_size), never the
    * whole response. This is what lets a scan partition cover gigabytes
    * of table without materializing them: the Native format is
    * block-framed precisely so clients can decode off the socket. The
    * caller owns closing the stream (a [[org.apache.spark.sql.connector.read.PartitionReader]]
    * closes it in its own close()). */
  def decode(in: java.io.InputStream, expect: Seq[(String, CHType)]): Iterator[InternalRow] = {
    val reader = new Reader(in)
    new Iterator[InternalRow] {
      private var rows: Iterator[InternalRow] = Iterator.empty
      private def advance(): Unit =
        while (!rows.hasNext && reader.hasMore) rows = decodeBlock(reader, expect)
      def hasNext: Boolean = { advance(); rows.hasNext }
      def next(): InternalRow = { advance(); rows.next() }
    }
  }

  /** Decode exactly ONE block off the stream (the native-TCP leg frames
    * one block per Data packet — the caller owns the packet walk). With
    * `expect` given, names and declared types are verified as in
    * [[decode]]; with None the block decodes by its DECLARED types (for
    * metadata queries like DESCRIBE, where the caller has no prior
    * expectation). Returns the block's columns and its rows — (Nil,
    * empty) for the 0×0 terminal/structure block. */
  def decodeOneBlock(in: java.io.InputStream, expect: Option[Seq[(String, CHType)]])
      : (Seq[(String, CHType)], Iterator[InternalRow]) =
    decodeBlockGeneric(new Reader(in), expect)

  private def decodeBlock(in: Reader, expect: Seq[(String, CHType)]): Iterator[InternalRow] =
    decodeBlockGeneric(in, Some(expect))._2

  private def decodeBlockGeneric(in: Reader, expect: Option[Seq[(String, CHType)]])
      : (Seq[(String, CHType)], Iterator[InternalRow]) = {
    val ncols = in.varint().toInt
    val nrows = in.varint().toInt
    if (ncols == 0 && nrows == 0) return (Nil, Iterator.empty)
    expect.foreach { e =>
      if (ncols != e.length)
        throw new IllegalArgumentException(
          s"Native block has $ncols columns, expected ${e.length}")
    }
    val outCols = Seq.newBuilder[(String, CHType)]
    val cols = new Array[Array[Any]](ncols)
    var c = 0
    while (c < ncols) {
      val name = in.str()
      val declaredText = in.str()
      // the header's declared type must agree STRUCTURALLY with what the
      // decode expects — any server-side type surprise (an unexpected
      // aggregate rewrite, a mid-scan ALTER) must fail loudly here, never
      // misframe every byte that follows. LowCardinality wrappers,
      // timezone parameters and tuple element names don't change the wire
      // layout and are normalized away before comparing.
      val declared =
        try CHType.parse(declaredText)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"Native block column '$name' declares unparseable type " +
              s"'$declaredText': ${e.getMessage}")
        }
      expect.foreach { e =>
        if (name != e(c)._1)
          throw new IllegalArgumentException(
            s"Native block column $c is '$name', expected '${e(c)._1}'")
        if (wireShape(declared) != wireShape(e(c)._2))
          throw new IllegalArgumentException(
            s"Native block column '$name' declares type '$declaredText' but the " +
              s"reader expects '${CHType.render(e(c)._2)}' — refusing to decode")
      }
      // decode by the DECLARED type: it names the actual wire layout (a
      // server may legally answer an LC column dictionary-encoded OR as
      // its converted inner type depending on
      // low_cardinality_allow_in_native_format; both differ from the
      // expected spelling only in ways the structural check above proves
      // value-identical — LC wrapper, timezone text, tuple element names)
      outCols += (name -> declared)
      cols(c) = readColumn(in, declared, nrows)
      c += 1
    }
    (outCols.result(), (0 until nrows).iterator.map { r =>
      val vals = new Array[Any](ncols)
      var i = 0
      while (i < ncols) { vals(i) = cols(i)(r); i += 1 }
      new GenericInternalRow(vals)
    })
  }

  /** A type reduced to what determines VALUE compatibility between the
    * declared and expected spellings: LowCardinality stripped (dictionary
    * vs plain is a layout difference the decode-by-declared rule handles;
    * the VALUES are the inner type's either way), timezone names dropped
    * (values are epoch-based either way), tuple element names erased
    * (elements are positional on the wire). */
  private def wireShape(t: CHType): CHType = {
    import CHType._
    t match {
      case CHLowCardinality(i) => wireShape(i)
      case CHNullable(i) => CHNullable(wireShape(i))
      case CHArray(i) => CHArray(wireShape(i))
      case CHMap(k, v) => CHMap(wireShape(k), wireShape(v))
      case CHTuple(elems) => CHTuple(elems.map { case (_, et) => (None, wireShape(et)) })
      case CHDateTime(_) => CHDateTime(None)
      case CHDateTime64(p, _) => CHDateTime64(p, None)
      case other => other
    }
  }

  /** One column's values, already in Catalyst representation. The column
    * data starts with the serialization PREFIXES of every dictionary-form
    * LC anywhere in the declared type tree (ClickHouse writes state
    * prefixes for the whole substream tree before any bulk data — for
    * Array(LowCardinality(String)) the u64 version comes BEFORE the
    * array offsets), then the bulk in substream order. */
  private def readColumn(in: Reader, t: CHType, n: Int): Array[Any] = {
    if (n > 0) readLcPrefixes(in, t)
    readColumnBody(in, t, n)
  }

  /** Consume the u64 keys-serialization version of each LC in prefix
    * (declaration) order. A 0-row block carries NO column bytes at all
    * (NativeWriter's if-rows guard), prefixes included — callers gate on
    * n > 0. */
  private def readLcPrefixes(in: Reader, t: CHType): Unit = {
    import CHType._
    t match {
      case CHLowCardinality(_) =>
        val version = in.i64()
        if (version != 1L)
          throw new IllegalArgumentException(
            s"LowCardinality keys-serialization version $version unsupported (expected 1)")
      case CHNullable(i) => readLcPrefixes(in, i)
      case CHArray(i) => readLcPrefixes(in, i)
      case CHMap(k, v) => readLcPrefixes(in, k); readLcPrefixes(in, v)
      case CHTuple(elems) => elems.foreach(e => readLcPrefixes(in, e._2))
      case _ => ()
    }
  }

  /** Column bulk data, prefixes already consumed ([[readLcPrefixes]]). */
  private def readColumnBody(in: Reader, t: CHType, n: Int): Array[Any] = {
    import CHType._
    t match {
      // the documented LowCardinality serialization: the dictionary ships
      // ONCE per block plus narrow per-row keys — the reason LC exists
      // (an LC(String) event_type column of a billion rows ships one
      // small dictionary + u8/u16 indices, not a billion strings).
      //   u64 keys-serialization version — a state PREFIX, consumed by
      //     [[readLcPrefixes]] before any bulk (for nested LC it precedes
      //     the enclosing array's offsets)
      //   u64 flags: low byte = key width (0:u8 1:u16 2:u32 3:u64),
      //              bit8 NeedGlobalDictionary, bit9 HasAdditionalKeys,
      //              bit10 NeedUpdateDictionary
      //   u64 dict size, dict column data (inner type, Nullable STRIPPED —
      //     for Nullable inners index 0 is the reserved NULL slot and
      //     dict[0] a default placeholder)
      //   u64 keys count (= values in this column: block rows top-level,
      //     flattened element count under an Array), then the keys
      case CHLowCardinality(inner) =>
        if (n == 0) new Array[Any](0)
        else {
          val flags = in.i64()
          if ((flags & 512L) == 0L || (flags & 256L) != 0L)
            throw new IllegalArgumentException(
              f"LowCardinality flags 0x$flags%x: only additional-keys " +
                "blocks without a global dictionary decode")
          val (base, nullable) = inner match {
            case CHNullable(i) => (i, true)
            case o => (o, false)
          }
          val dictSize = in.i64().toInt
          if (dictSize < 0)
            throw new IllegalArgumentException(s"negative LowCardinality dictionary size")
          val dict = readColumnBody(in, base, dictSize)
          val cnt = in.i64().toInt
          if (cnt != n)
            throw new IllegalArgumentException(
              s"LowCardinality keys count $cnt != expected values $n")
          val out = new Array[Any](n)
          var i = 0
          while (i < n) {
            val idx = (flags & 0xffL).toInt match {
              case 0 => in.u8()
              case 1 => in.i16() & 0xffff
              case 2 => in.i32()
              case 3 => in.i64().toInt // one block's dict never exceeds Int
              case w => throw new IllegalArgumentException(
                s"LowCardinality key width code $w unsupported")
            }
            if (idx < 0 || idx >= dictSize)
              throw new IllegalArgumentException(
                s"LowCardinality key $idx outside dictionary of $dictSize entries")
            out(i) = if (nullable && idx == 0) null else dict(idx)
            i += 1
          }
          out
        }
      case CHNullable(inner) =>
        val mask = new Array[Boolean](n)
        var i = 0
        while (i < n) { mask(i) = in.u8() == 1; i += 1 }
        val vals = readColumnBody(in, inner, n)
        i = 0
        while (i < n) { if (mask(i)) vals(i) = null; i += 1 }
        vals
      case CHArray(inner) =>
        val offs = new Array[Int](n)
        var i = 0
        while (i < n) { offs(i) = in.i64().toInt; i += 1 }
        val flat = readColumnBody(in, inner, if (n == 0) 0 else offs(n - 1))
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
      case CHMap(kt, vt) =>
        val offs = new Array[Int](n)
        var i = 0
        while (i < n) { offs(i) = in.i64().toInt; i += 1 }
        val total = if (n == 0) 0 else offs(n - 1)
        // keys decode by their declared type (String, or its dictionary
        // form when the server answers Map(LowCardinality(String), ...));
        // engine Map contract is Map(String, String) either way
        val keys = readColumnBody(in, kt, total).map(k =>
          if (k == null) null else UTF8String.fromString(renderMapValue(kt, k)))
        val vals = readColumnBody(in, vt, total).map(v =>
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
        val byElem = elems.map(e => readColumnBody(in, e._2, n))
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

  /** Little-endian cursor over a live stream, bounds-checked so a
    * truncated response fails loudly instead of zero-padding. Holds at
    * most ONE buffered look-ahead byte (for [[hasMore]]) beyond what the
    * decode has consumed — the memory bound is the caller's per-block
    * arrays, never the response. */
  private final class Reader(in: java.io.InputStream) {
    /** -2 = no look-ahead buffered; -1 = EOF observed; else the byte. */
    private var peeked: Int = -2

    /** True when at least one more byte exists (peeks without consuming). */
    def hasMore: Boolean = {
      if (peeked == -2) peeked = in.read()
      peeked >= 0
    }

    def u8(): Int = {
      val v = if (peeked != -2) { val p = peeked; peeked = -2; p } else in.read()
      if (v < 0) throw new IndexOutOfBoundsException("truncated Native response")
      v
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
      if (n < 0) throw new IndexOutOfBoundsException("negative Native length")
      val a = new Array[Byte](n)
      var off = 0
      if (n > 0 && peeked >= 0) { a(0) = peeked.toByte; peeked = -2; off = 1 }
      while (off < n) {
        val k = in.read(a, off, n - off)
        if (k < 0) throw new IndexOutOfBoundsException("truncated Native response")
        off += k
      }
      a
    }
    def str(): String = new String(take(varint().toInt), UTF_8)
  }
}
