package graft.sink

/** CityHash128, version 1.0.2 — the EXACT historical revision ClickHouse
  * pins for its compressed-frame checksums. The algorithm changed
  * incompatibly in CityHash 1.1 (k3 removed, different short-input mix);
  * ClickHouse vendors 1.0.2 forever for wire stability, so this port
  * follows the public cityhash-1.0.2 release (city.cc / city.h, MIT
  * licensed, Google 2011) line for line: the k3-seeded length≥16 entry,
  * the length∈[8,16) NULL-seeded entry and the RotateByAtLeast1-based
  * HashLen0to16 are the 1.0.2 signatures.
  *
  * All arithmetic is unsigned 64-bit modular, which Scala's Long gives
  * natively for add/multiply/xor/shift-left; right shifts are logical
  * (`>>>`) throughout.
  *
  * Validation status: both protocol ends in this repo (client + fixture)
  * share this one implementation — frame round-trips therefore prove the
  * framing, not the hash constants. Cross-validation against ClickHouse's
  * own copy runs in the CH_URL-gated real-server suite (a compressed
  * INSERT is rejected with CHECKSUM_DOESNT_MATCH by a real server on any
  * divergence, loudly). Until that has run, native-protocol compression
  * stays opt-in.
  */
private[graft] object CityHash102 {
  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) | ((s(i + 1) & 0xffL) << 8) | ((s(i + 2) & 0xffL) << 16) |
      ((s(i + 3) & 0xffL) << 24) | ((s(i + 4) & 0xffL) << 32) |
      ((s(i + 5) & 0xffL) << 40) | ((s(i + 6) & 0xffL) << 48) |
      ((s(i + 7) & 0xffL) << 56)

  @inline private def fetch32(s: Array[Byte], i: Int): Long =
    (s(i) & 0xffL) | ((s(i + 1) & 0xffL) << 8) | ((s(i + 2) & 0xffL) << 16) |
      ((s(i + 3) & 0xffL) << 24)

  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  /** 1.0.2's RotateByAtLeast1 — callers guarantee 1 <= shift <= 63. */
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 (city.h): the 128→64 mix HashLen16 delegates to. */
  @inline private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * kMul
    a ^= (a >>> 47)
    var b = (v ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long =
    if (len > 8) {
      val a = fetch64(s, off)
      val b = fetch64(s, off + len - 8)
      hashLen16(a, rotateByAtLeast1(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, off)
      hashLen16(len + (a << 3), fetch32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xffL
      val b = s(off + (len >> 1)) & 0xffL
      val c = s(off + len - 1) & 0xffL
      val y = a + (b << 8)
      val z = len + (c << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2

  /** WeakHashLen32WithSeeds over 32 bytes at s[off..]. Returns (a', b'). */
  private def weakHashLen32WithSeeds(s: Array[Byte], off: Int,
                                     a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, off)
    val x = fetch64(s, off + 8)
    val y = fetch64(s, off + 16)
    val z = fetch64(s, off + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  /** CityMurmur — the <128-byte path of CityHash128WithSeed. */
  private def cityMurmur(s: Array[Byte], off: Int, len: Int,
                         seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    val l = len - 16
    if (l <= 0) { // len <= 16
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(s, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(s, off) else c))
    } else { // len > 16
      c = hashLen16(fetch64(s, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(s, off + len - 16))
      a += d
      var p = off
      var rem = l
      while (rem > 0) {
        a ^= shiftMix(fetch64(s, p) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(s, p + 8) * k1) * k1
        c *= k1
        d ^= c
        p += 16
        rem -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  private def cityHash128WithSeed(s: Array[Byte], off0: Int, len0: Int,
                                  seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(s, off0, len0, seedLo, seedHi)
    var off = off0
    var len = len0
    var x = seedLo
    var y = seedHi
    var z = len.toLong * k1
    var v1 = rotate(y ^ k1, 49) * k1 + fetch64(s, off)
    var v2 = rotate(v1, 42) * k1 + fetch64(s, off + 8)
    var w1 = rotate(y + z, 35) * k1 + x
    var w2 = rotate(x + fetch64(s, off + 88), 53) * k1
    do {
      var i = 0
      while (i < 2) { // the manually-unrolled pair of 64-byte halves
        x = rotate(x + y + v1 + fetch64(s, off + 16), 37) * k1
        y = rotate(y + v2 + fetch64(s, off + 48), 42) * k1
        x ^= w2
        y ^= v1
        z = rotate(z ^ w1, 33)
        val v = weakHashLen32WithSeeds(s, off, v2 * k1, x + w1)
        val w = weakHashLen32WithSeeds(s, off + 32, z + w2, y)
        v1 = v._1; v2 = v._2
        w1 = w._1; w2 = w._2
        val t = z; z = x; x = t
        off += 64
        i += 1
      }
      len -= 128
    } while (len >= 128)
    y += rotate(w1, 37) * k0 + z
    x += rotate(v1 + z, 49) * k0
    // 0 < len < 128: up to 4 chunks of 32 bytes from the END of s
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + v2
      w1 += fetch64(s, off + len - tailDone + 16)
      x = rotate(x, 49) * k0 + w1
      w1 += v1
      val v = weakHashLen32WithSeeds(s, off + len - tailDone, v1, v2)
      v1 = v._1; v2 = v._2
    }
    x = hashLen16(x, v1)
    y = hashLen16(y, w1)
    (hashLen16(x + v2, w2) + y, hashLen16(x + w2, y + v2))
  }

  /** (low64, high64) of CityHash128 v1.0.2 over s[off, off+len). */
  def cityHash128(s: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(s, off + 16, len - 16,
        fetch64(s, off) ^ k3, fetch64(s, off + 8))
    else if (len >= 8)
      // 1.0.2 hashes the EMPTY tail with a length-mixed seed here
      cityHash128WithSeed(s, off, 0,
        fetch64(s, off) ^ (len.toLong * k0), fetch64(s, off + len - 8) ^ k1)
    else
      cityHash128WithSeed(s, off, len, k0, k1)
}
