package graft.types

/** Pure IPv4/IPv6 text codecs for the sink's IP column types.
  *
  * Deliberately NOT `java.net.InetAddress`: `getByName` falls back to a
  * DNS lookup for anything that isn't an address literal, which would
  * turn a malformed value in a 100M-row batch into a network call per
  * row (and a data-dependent egress). These are pure string parsers.
  *
  * Wire forms (public ClickHouse formats):
  *  - IPv4 is a UInt32 of the dotted quad (`a.b.c.d` → `a<<24|…|d`),
  *    serialized little-endian like any UInt32.
  *  - IPv6 is 16 bytes in network order (the FixedString(16) layout).
  *
  * Canonical text forms match the server's output: dotted quad without
  * leading zeros for IPv4; RFC 5952 for IPv6 (lowercase hex, longest
  * zero-run compressed with `::`, ties to the leftmost run, no single
  * group compressed). IPv4-mapped addresses (`::ffff:a.b.c.d`) keep the
  * dotted tail, as the server prints them.
  */
object IpCodec {

  /** Parse a dotted-quad IPv4 literal → unsigned 32-bit value, or None.
    * Strict: exactly four decimal octets 0-255, no leading '+', no
    * whitespace; leading zeros are accepted on input (the server parses
    * them) but never re-emitted. */
  def parseV4(s: String): Option[Long] = {
    var acc = 0L
    var octet = -1L // -1 = no digit seen yet in this group
    var groups = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        octet = (if (octet < 0) 0L else octet) * 10 + (c - '0')
        if (octet > 255) return None
      } else if (c == '.') {
        if (octet < 0 || groups == 3) return None
        acc = (acc << 8) | octet
        octet = -1
        groups += 1
      } else return None
      i += 1
    }
    if (octet < 0 || groups != 3) None
    else Some((acc << 8) | octet)
  }

  def formatV4(v: Long): String = {
    val u = v & 0xffffffffL
    s"${(u >> 24) & 0xff}.${(u >> 16) & 0xff}.${(u >> 8) & 0xff}.${u & 0xff}"
  }

  /** Parse an IPv6 literal (full, `::`-compressed, or with an embedded
    * IPv4 tail) → 16 network-order bytes, or None. A plain IPv4 literal
    * is NOT accepted here — the caller decides whether to map it. */
  def parseV6(s: String): Option[Array[Byte]] = {
    if (s.isEmpty) return None
    // split on "::" (at most one)
    val dcol = s.indexOf("::")
    if (dcol >= 0 && s.indexOf("::", dcol + 1) >= 0) return None
    val (headStr, tailStr) =
      if (dcol < 0) (s, null)
      else (s.substring(0, dcol), s.substring(dcol + 2))

    def groupsOf(part: String, allowV4Tail: Boolean): Option[Vector[Int]] = {
      if (part == null || part.isEmpty) return Some(Vector.empty)
      val raw = part.split(":", -1)
      if (raw.exists(_.isEmpty)) return None // stray ':' beyond the '::'
      val out = Vector.newBuilder[Int]
      var i = 0
      while (i < raw.length) {
        val g = raw(i)
        if (allowV4Tail && i == raw.length - 1 && g.contains('.')) {
          // embedded IPv4 tail = two trailing groups
          parseV4(g) match {
            case Some(v4) =>
              out += ((v4 >> 16) & 0xffff).toInt
              out += (v4 & 0xffff).toInt
            case None => return None
          }
        } else {
          if (g.length > 4) return None
          var v = 0
          var j = 0
          while (j < g.length) {
            val d = Character.digit(g.charAt(j), 16)
            if (d < 0) return None
            v = (v << 4) | d
            j += 1
          }
          if (g.isEmpty) return None
          out += v
        }
        i += 1
      }
      Some(out.result())
    }

    for {
      // a dotted-quad tail is only legal at the very END of the address
      head <- groupsOf(headStr, allowV4Tail = dcol < 0)
      tail <- groupsOf(tailStr, allowV4Tail = true)
      total = head.length + tail.length
      // '::' must stand for at least one group; without it, exactly 8
      if (dcol >= 0 && total <= 7) || (dcol < 0 && total == 8)
    } yield {
      val groups = head ++ Vector.fill(8 - total)(0) ++ tail
      val b = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        b(2 * i) = ((groups(i) >> 8) & 0xff).toByte
        b(2 * i + 1) = (groups(i) & 0xff).toByte
        i += 1
      }
      b
    }
  }

  /** RFC 5952 canonical text of 16 network-order bytes. */
  def formatV6(b: Array[Byte]): String = {
    require(b.length == 16, s"IPv6 needs 16 bytes, got ${b.length}")
    val g = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    // IPv4-mapped ::ffff:a.b.c.d prints with the dotted tail
    if (g.take(5).forall(_ == 0) && g(5) == 0xffff)
      return s"::ffff:${(g(6) >> 8) & 0xff}.${g(6) & 0xff}.${(g(7) >> 8) & 0xff}.${g(7) & 0xff}"
    // longest zero run (>= 2 groups), leftmost on ties
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    if (bestLen < 2) g.map(Integer.toHexString).mkString(":")
    else {
      val head = g.take(bestStart).map(Integer.toHexString).mkString(":")
      val tail = g.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      s"$head::$tail"
    }
  }

  /** Canonicalize an IPv4 literal, or None if malformed. */
  def canonicalV4(s: String): Option[String] = parseV4(s).map(formatV4)

  /** Canonicalize an IPv6 literal (accepts a plain IPv4 literal as its
    * IPv4-mapped form, as the server's IPv6 parse does), or None. */
  def canonicalV6(s: String): Option[String] =
    parseV6(s).map(formatV6).orElse(parseV4(s).map(v4 => formatV6(mapV4(v4))))

  /** The IPv4-mapped IPv6 bytes (`::ffff:a.b.c.d`) of a u32 IPv4. */
  def mapV4(v4: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    b(10) = 0xff.toByte; b(11) = 0xff.toByte
    b(12) = ((v4 >> 24) & 0xff).toByte
    b(13) = ((v4 >> 16) & 0xff).toByte
    b(14) = ((v4 >> 8) & 0xff).toByte
    b(15) = (v4 & 0xff).toByte
    b
  }
}
