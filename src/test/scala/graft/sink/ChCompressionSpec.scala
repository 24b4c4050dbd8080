package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** The production compressed-frame codec in isolation: byte-exact
  * round-trips (incl. empty and multi-frame payloads), loud refusal of
  * corrupted frames, the method-0x02 (None) passthrough, and branch
  * coverage of the CityHash128 v1.0.2 port across every input-length
  * regime (0–16, murmur ≤128, long path ≥128, tail chunks). The
  * client↔fixture integration tests in [[NativeTcpSpec]] add the
  * cross-implementation check (fixture frames are a separate codec). */
class ChCompressionSpec extends AnyFunSuite {

  private def compressed(data: Array[Byte], frameRaw: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ChCompression.compress(data, out, frameRaw)
    out.toByteArray
  }

  private def decompress(wire: Array[Byte]): Array[Byte] = {
    val fi = new ChCompression.FrameInput(new java.io.ByteArrayInputStream(wire))
    val got = fi.readAllBytes()
    assert(fi.buffered == 0)
    got
  }

  test("round-trips payloads byte-exactly, including empty and multi-frame") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 9, 4096, 70000, 300000)) {
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      // 64 KiB frames: the 300 KB case spans five frames
      assert(java.util.Arrays.equals(decompress(compressed(data, 64 * 1024)), data),
        s"round-trip broke at n=$n")
    }
    // compressible data genuinely shrinks on the wire (the point of the leg)
    val text = ("the same telemetry line over and over " * 2000).getBytes
    assert(compressed(text, 1 << 20).length < text.length / 5)
  }

  test("a flipped payload byte fails the CityHash128 check loudly") {
    val data = "some block content that matters".getBytes
    val wire = compressed(data, 1 << 20)
    wire(wire.length - 1) = (wire(wire.length - 1) ^ 0x1).toByte
    val e = intercept[java.io.IOException](decompress(wire))
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("a flipped HEADER byte (declared raw size) fails loudly too") {
    val data = "header integrity is covered by the checksum".getBytes
    val wire = compressed(data, 1 << 20)
    wire(16 + 5) = (wire(16 + 5) ^ 0x1).toByte // raw_size low byte
    val e = intercept[java.io.IOException](decompress(wire))
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("method 0x02 (None) frames pass through uncompressed") {
    val payload = "uncompressed frame".getBytes
    val frame = new Array[Byte](9 + payload.length)
    frame(0) = ChCompression.MethodNone.toByte
    def le32(a: Array[Byte], off: Int, v: Int): Unit =
      (0 until 4).foreach(i => a(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    le32(frame, 1, frame.length)
    le32(frame, 5, payload.length)
    System.arraycopy(payload, 0, frame, 9, payload.length)
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    val wire = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(i => wire.write(((lo >>> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i => wire.write(((hi >>> (8 * i)) & 0xff).toInt))
    wire.write(frame)
    assert(new String(decompress(wire.toByteArray)) == "uncompressed frame")
  }

  test("a None frame whose raw_size disagrees with its payload extent is refused") {
    // the checksum proves the BYTES, not the header's internal
    // consistency — a sender bug declaring raw_size != payload length
    // must fail as loudly as a bad LZ4/ZSTD length would
    val payload = "size-inconsistent".getBytes
    val frame = new Array[Byte](9 + payload.length)
    frame(0) = ChCompression.MethodNone.toByte
    def le32(a: Array[Byte], off: Int, v: Int): Unit =
      (0 until 4).foreach(i => a(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    le32(frame, 1, frame.length)
    le32(frame, 5, payload.length + 3) // lie about the raw size
    System.arraycopy(payload, 0, frame, 9, payload.length)
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    val wire = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(i => wire.write(((lo >>> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i => wire.write(((hi >>> (8 * i)) & 0xff).toInt))
    wire.write(frame)
    val e = intercept[java.io.IOException](decompress(wire.toByteArray))
    assert(e.getMessage.contains("size mismatch"), e.getMessage)
  }

  test("ZSTD (0x90) frames from a zstd-configured server decode too") {
    // network_compression_method=zstd makes a real server answer 0x90
    // frames regardless of what the client sent — the reader must accept
    val payload = ("zstd frame content " * 200).getBytes
    val comp = com.github.luben.zstd.Zstd.compress(payload)
    val frame = new Array[Byte](9 + comp.length)
    frame(0) = ChCompression.MethodZstd.toByte
    def le32(a: Array[Byte], off: Int, v: Int): Unit =
      (0 until 4).foreach(i => a(off + i) = ((v >>> (8 * i)) & 0xff).toByte)
    le32(frame, 1, frame.length)
    le32(frame, 5, payload.length)
    System.arraycopy(comp, 0, frame, 9, comp.length)
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    val wire = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(i => wire.write(((lo >>> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i => wire.write(((hi >>> (8 * i)) & 0xff).toInt))
    wire.write(frame)
    assert(java.util.Arrays.equals(decompress(wire.toByteArray), payload))
  }

  test("an unknown method byte is refused, not guessed") {
    val data = "x".getBytes
    val wire = compressed(data, 1 << 20)
    // method byte lives right after the 16-byte checksum; changing it
    // invalidates the checksum first — so craft a VALID frame with a bad
    // method instead
    val frame = java.util.Arrays.copyOfRange(wire, 16, wire.length)
    frame(0) = 0x33.toByte
    val (lo, hi) = CityHash102.cityHash128(frame, 0, frame.length)
    val out = new java.io.ByteArrayOutputStream()
    (0 until 8).foreach(i => out.write(((lo >>> (8 * i)) & 0xff).toInt))
    (0 until 8).foreach(i => out.write(((hi >>> (8 * i)) & 0xff).toInt))
    out.write(frame)
    val e = intercept[java.io.IOException](decompress(out.toByteArray))
    assert(e.getMessage.contains("method"), e.getMessage)
  }

  private def fxDecompress(wire: Array[Byte]): Array[Byte] = {
    val r = new MiniClickHouseTcpServer.FxFrames.Reader(
      new java.io.ByteArrayInputStream(wire))
    val got = r.readAllBytes()
    assert(r.leftover == 0)
    got
  }

  private def fxCompressed(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    MiniClickHouseTcpServer.FxFrames.write(data, out, corruptFirst = false)
    out.toByteArray
  }

  test("CROSS-CODEC frame-boundary fuzz: production and fixture codecs agree on 1k+ random payloads") {
    // the two codecs are deliberately independent implementations of the
    // same public frame layout; driving each one's output through the
    // OTHER's reader is the strongest in-sandbox check the layout has —
    // a framing mistake (off-by-one header math, boundary split bug)
    // cannot round-trip invisibly through a second implementation.
    val rnd = new scala.util.Random(1402)
    // deterministic boundary cases at the PRODUCTION frame cap: empty,
    // one byte, cap-1 / cap / cap+1 (the exact split points), two frames
    // + tail
    val cap = ChCompression.MaxFrameRaw
    val boundaries = Seq(0, 1, 9, cap - 1, cap, cap + 1, 2 * cap, 2 * cap + 17)
    for (n <- boundaries) {
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      assert(java.util.Arrays.equals(fxDecompress(compressed(data, cap)), data),
        s"production->fixture broke at boundary n=$n")
      assert(java.util.Arrays.equals(decompress(fxCompressed(data)), data),
        s"fixture->production broke at boundary n=$n")
      // the ZSTD codec (0x90) crosses implementations at the same splits
      val zOut = new java.io.ByteArrayOutputStream()
      ChCompression.compressAs(data, zOut, ChCompression.MethodZstd)
      assert(java.util.Arrays.equals(fxDecompress(zOut.toByteArray), data),
        s"production-zstd->fixture broke at boundary n=$n")
      val fzOut = new java.io.ByteArrayOutputStream()
      MiniClickHouseTcpServer.FxFrames.write(data, fzOut,
        corruptFirst = false, method = 0x90)
      assert(java.util.Arrays.equals(decompress(fzOut.toByteArray), data),
        s"fixture-zstd->production broke at boundary n=$n")
    }
    // 1000 random cases: size, content class (compressible text vs
    // incompressible noise), and the production frame size all vary —
    // the fixture's 64 KiB frames stay fixed, so frame boundaries land
    // at DIFFERENT offsets on the two legs of every case
    for (i <- 0 until 1000) {
      val n = rnd.nextInt(192 * 1024)
      val data =
        if (rnd.nextBoolean()) {
          val d = new Array[Byte](n); rnd.nextBytes(d); d
        } else Array.fill(n)(('a' + rnd.nextInt(4)).toByte)
      val frameRaw = 1 + rnd.nextInt(96 * 1024)
      assert(java.util.Arrays.equals(fxDecompress(compressed(data, frameRaw)), data),
        s"production(frameRaw=$frameRaw)->fixture broke at case $i (n=$n)")
      assert(java.util.Arrays.equals(decompress(fxCompressed(data)), data),
        s"fixture->production broke at case $i (n=$n)")
    }
  }

  test("CityHash128 v1.0.2 port: every length regime is exercised, deterministic, collision-free here") {
    val rnd = new scala.util.Random(7)
    val data = new Array[Byte](1024)
    rnd.nextBytes(data)
    // lengths crossing each algorithmic boundary: 0..16 short path,
    // 8-byte seed branch, CityMurmur (<128), the 128-byte loop and its
    // 1..4 tail chunks
    val lens = (0 to 17) ++ Seq(31, 32, 63, 64, 100, 127, 128, 129, 159,
      160, 191, 192, 255, 256, 300, 511, 512, 1000, 1024)
    val seen = scala.collection.mutable.Map[(Long, Long), Int]()
    for (n <- lens) {
      val h1 = CityHash102.cityHash128(data, 0, n)
      val h2 = CityHash102.cityHash128(data, 0, n)
      assert(h1 == h2, s"non-deterministic at n=$n")
      seen.get(h1).foreach(prev => fail(s"collision between n=$prev and n=$n"))
      seen(h1) = n
      // offset independence: the same bytes at a different offset hash equal
      if (n > 0 && n < 1000) {
        val shifted = new Array[Byte](n + 3)
        System.arraycopy(data, 0, shifted, 3, n)
        assert(CityHash102.cityHash128(shifted, 3, n) == h1, s"offset-sensitive at n=$n")
      }
      // single-bit sensitivity
      if (n > 0) {
        val mut = java.util.Arrays.copyOf(data, data.length)
        mut(n - 1) = (mut(n - 1) ^ 1).toByte
        assert(CityHash102.cityHash128(mut, 0, n) != h1, s"insensitive at n=$n")
      }
    }
  }
}
