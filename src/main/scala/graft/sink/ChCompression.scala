package graft.sink

import java.io.{InputStream, OutputStream}

/** ClickHouse native-protocol block compression — the documented frame
  * layout both the TCP port and compressed files use:
  *
  * {{{
  *   [16B CityHash128 v1.0.2 of everything after it]
  *   [1B method: 0x02 None | 0x82 LZ4 | 0x90 ZSTD]
  *   [4B LE compressed_size  — INCLUDES this 9-byte header]
  *   [4B LE decompressed_size]
  *   [compressed payload]
  * }}}
  *
  * The checksum covers the 9-byte header plus the payload. LZ4 payloads
  * are raw LZ4 BLOCK format (lz4-java, the implementation already on
  * Spark's classpath). Frames carry at most [[MaxFrameRaw]] uncompressed
  * bytes (the server's max_compress_block_size default, 1 MiB), so a
  * large Native block spans several frames and neither side ever holds
  * more than one frame of compressed state.
  *
  * Why this exists: the TCP leg is the high-throughput transport, and at
  * 100 TB an uncompressed wire is a 3-5× bandwidth tax on every INSERT
  * block and every scan response. This is the write/read codec the
  * production client uses; the test fixture carries its OWN frame
  * walker (only [[CityHash102]] is shared — see its validation note).
  */
private[graft] object ChCompression {
  val MethodNone = 0x02
  val MethodLz4 = 0x82
  val MethodZstd = 0x90
  /** Header bytes covered by the checksum (method + two sizes). */
  val HeaderLen = 9
  /** Max UNCOMPRESSED bytes per frame (max_compress_block_size default). */
  val MaxFrameRaw: Int = 1 << 20

  private lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** LZ4-compress `data` as one or more frames onto `out`. */
  def compress(data: Array[Byte], out: OutputStream): Unit =
    compress(data, out, MaxFrameRaw, MethodLz4)

  /** Compress `data` as one or more frames of `method` (0x82 LZ4 —
    * the default everywhere — or 0x90 ZSTD, the server's
    * `network_compression_method=zstd` codec; level 1, matching the
    * server's default zstd level for network frames). Distinct name: an
    * Int overload of compress would be ambiguous with the frame-size
    * test hook below. */
  def compressAs(data: Array[Byte], out: OutputStream, method: Int): Unit =
    compress(data, out, MaxFrameRaw, method)

  private[sink] def compress(data: Array[Byte], out: OutputStream,
                             frameRaw: Int, method: Int = MethodLz4): Unit = {
    var off = 0
    // an empty block still ships one (empty) frame: the receiving side
    // frames its reads per block, so "no bytes" must still be a frame
    do {
      val n = math.min(frameRaw, data.length - off)
      val frame = method match {
        case MethodLz4 =>
          val comp = lz4.fastCompressor()
          val max = comp.maxCompressedLength(n)
          val f = new Array[Byte](HeaderLen + max)
          val compLen = comp.compress(data, off, n, f, HeaderLen, max)
          java.util.Arrays.copyOf(f, HeaderLen + compLen)
        case MethodZstd =>
          val max = com.github.luben.zstd.Zstd.compressBound(n.toLong).toInt
          val f = new Array[Byte](HeaderLen + max)
          val compLen = com.github.luben.zstd.Zstd.compressByteArray(
            f, HeaderLen, max, data, off, n, 1)
          if (com.github.luben.zstd.Zstd.isError(compLen))
            throw new java.io.IOException(
              s"ZSTD compression failed: ${com.github.luben.zstd.Zstd.getErrorName(compLen)}")
          java.util.Arrays.copyOf(f, HeaderLen + compLen.toInt)
        case other =>
          throw new IllegalArgumentException(
            f"unsupported compression method byte 0x$other%02x")
      }
      frame(0) = method.toByte
      putIntLE(frame, 1, frame.length)
      putIntLE(frame, 5, n)
      val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
      val sum = new Array[Byte](16)
      putLongLE(sum, 0, lo)
      putLongLE(sum, 8, hi)
      out.write(sum)
      out.write(frame, 0, frame.length)
      off += n
    } while (off < data.length)
  }

  /** A decompressing view over a frame sequence: frames are pulled
    * LAZILY off `in` as the consumer reads, each verified against its
    * CityHash128 before a single payload byte is surfaced — a corrupt
    * frame is an IOException, never silently-wrong bytes. Created per
    * block; [[buffered]] lets the caller assert the block consumed its
    * frames EXACTLY (a frame spanning a block boundary would desync the
    * packet stream). */
  final class FrameInput(in: InputStream) extends InputStream {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    /** Decompressed bytes pulled but not yet read. */
    def buffered: Int = buf.length - pos

    private def refill(): Boolean = {
      val head = new Array[Byte](16 + HeaderLen)
      var got = 0
      while (got < head.length) {
        val k = in.read(head, got, head.length - got)
        if (k < 0) {
          if (got == 0) return false // clean EOF between frames
          throw new java.io.EOFException("truncated compressed frame header")
        }
        got += k
      }
      val method = head(16) & 0xff
      val compSize = getIntLE(head, 17)
      val rawSize = getIntLE(head, 21)
      if (compSize < HeaderLen || compSize > (1 << 30) || rawSize < 0 || rawSize > (1 << 30))
        throw new java.io.IOException(
          s"implausible compressed frame: compressed_size=$compSize raw_size=$rawSize")
      val body = new Array[Byte](compSize)
      System.arraycopy(head, 16, body, 0, HeaderLen)
      var o = HeaderLen
      while (o < compSize) {
        val k = in.read(body, o, compSize - o)
        if (k < 0) throw new java.io.EOFException("truncated compressed frame body")
        o += k
      }
      val (lo, hi) = CityHash102.cityHash128(body, 0, compSize)
      if (lo != getLongLE(head, 0) || hi != getLongLE(head, 8))
        throw new java.io.IOException(
          "compressed frame checksum mismatch (CityHash128) — refusing corrupt data")
      buf = method match {
        case MethodNone =>
          // the declared raw size must agree with the payload extent —
          // the checksum proves the BYTES, not the header's internal
          // consistency, and the LZ4/ZSTD branches already enforce it
          if (rawSize != compSize - HeaderLen)
            throw new java.io.IOException(
              s"uncompressed frame size mismatch: raw_size=$rawSize but " +
                s"payload is ${compSize - HeaderLen} bytes")
          java.util.Arrays.copyOfRange(body, HeaderLen, compSize)
        case MethodLz4 =>
          val out = new Array[Byte](rawSize)
          val n = lz4.safeDecompressor()
            .decompress(body, HeaderLen, compSize - HeaderLen, out, 0)
          if (n != rawSize)
            throw new java.io.IOException(
              s"LZ4 frame decompressed to $n bytes, header declared $rawSize")
          out
        case MethodZstd =>
          // a server configured with network_compression_method=zstd
          // answers 0x90 frames regardless of what the client sent —
          // accept them (zstd-jni is already on Spark's classpath)
          val out = new Array[Byte](rawSize)
          val n = com.github.luben.zstd.Zstd.decompressByteArray(
            out, 0, rawSize, body, HeaderLen, compSize - HeaderLen)
          if (com.github.luben.zstd.Zstd.isError(n) || n != rawSize)
            throw new java.io.IOException(
              s"ZSTD frame decompressed to $n bytes, header declared $rawSize")
          out
        case other =>
          throw new java.io.IOException(
            f"unsupported compression method byte 0x$other%02x")
      }
      pos = 0
      true
    }

    override def read(): Int = {
      while (pos >= buf.length) if (!refill()) return -1
      val b = buf(pos) & 0xff
      pos += 1
      b
    }

    override def read(a: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (pos >= buf.length) if (!refill()) return -1
      val n = math.min(len, buf.length - pos)
      System.arraycopy(buf, pos, a, off, n)
      pos += n
      n
    }
  }

  private def putIntLE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >> 8) & 0xff).toByte
    a(off + 2) = ((v >> 16) & 0xff).toByte
    a(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putLongLE(a: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { a(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def getIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def getLongLE(a: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (a(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
}
