package graft.types

import org.scalatest.funsuite.AnyFunSuite

class IpCodecSpec extends AnyFunSuite {

  test("IPv4 parse/format round-trip and strictness") {
    assert(IpCodec.parseV4("1.2.3.4").contains(0x01020304L))
    assert(IpCodec.parseV4("255.255.255.255").contains(0xffffffffL))
    assert(IpCodec.parseV4("0.0.0.0").contains(0L))
    assert(IpCodec.parseV4("010.2.3.4").contains(0x0a020304L)) // leading zeros parse
    assert(IpCodec.canonicalV4("010.002.003.004").contains("10.2.3.4")) // but never re-emit
    Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "1..2.3", "1.2.3.4 ", "a.b.c.d",
      "", "1.2.3.-4").foreach(s => assert(IpCodec.parseV4(s).isEmpty, s))
    assert(IpCodec.formatV4(0x01020304L) == "1.2.3.4")
  }

  test("IPv6 parse accepts full, compressed and v4-embedded forms") {
    def bytesOf(s: String) = IpCodec.parseV6(s).map(_.toSeq)
    assert(bytesOf("::1").contains(Seq.fill(15)(0.toByte) :+ 1.toByte))
    assert(bytesOf("::").contains(Seq.fill(16)(0.toByte)))
    assert(bytesOf("2001:db8::1") == bytesOf("2001:0db8:0000:0000:0000:0000:0000:0001"))
    assert(bytesOf("::ffff:1.2.3.4") ==
      bytesOf("0:0:0:0:0:ffff:102:304")) // embedded v4 = last two groups
    Seq("1:2:3:4:5:6:7", "1:2:3:4:5:6:7:8:9", ":::", "1::2::3", "12345::",
      "g::1", "1.2.3.4", "").foreach(s => assert(IpCodec.parseV6(s).isEmpty, s))
  }

  test("IPv6 canonical text is RFC 5952") {
    def canon(s: String) = IpCodec.canonicalV6(s).get
    assert(canon("2001:0db8:0000:0000:0000:0000:0000:0001") == "2001:db8::1")
    assert(canon("0:0:0:0:0:0:0:0") == "::")
    assert(canon("0:0:0:0:0:0:0:1") == "::1")
    // longest zero run wins; ties go to the LEFTMOST run
    assert(canon("1:0:0:2:0:0:0:3") == "1:0:0:2::3")
    assert(canon("1:0:0:2:0:0:3:4") == "1::2:0:0:3:4")
    // a single zero group is NOT compressed
    assert(canon("1:0:2:3:4:5:6:7") == "1:0:2:3:4:5:6:7")
    // lowercase hex, no leading zeros
    assert(canon("2001:0DB8:AAAA:0000:0000:0000:0000:000F") == "2001:db8:aaaa::f")
    // IPv4-mapped keeps the dotted tail; a plain v4 literal maps into it
    assert(canon("::ffff:1.2.3.4") == "::ffff:1.2.3.4")
    assert(canon("1.2.3.4") == "::ffff:1.2.3.4")
  }

  test("parse∘format is identity over random 16-byte addresses") {
    val r = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val b = new Array[Byte](16)
      r.nextBytes(b)
      // bias toward zero runs so compression paths dominate
      (0 until r.nextInt(12)).foreach(_ => b(r.nextInt(16)) = 0)
      val text = IpCodec.formatV6(b)
      assert(IpCodec.parseV6(text).exists(_.sameElements(b)), text)
    }
  }
}
