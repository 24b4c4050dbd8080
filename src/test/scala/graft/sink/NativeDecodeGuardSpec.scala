package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import graft.types.{CHType, NativeDecoder}

/** The decoder's block-header type guard: a server whose declared column
  * type disagrees with what the reader expects must fail LOUDLY before a
  * single value byte is consumed — a silent misframe would corrupt every
  * remaining column (the countOrNull hazard: a global
  * aggregate_functions_null_for_empty rewrite turns count()'s UInt64 into
  * Nullable(UInt64), whose leading null-mask bytes would otherwise be
  * decoded as count values). Wire-irrelevant spellings — LowCardinality
  * wrappers, timezone parameters, tuple element names — must NOT trip
  * the guard. */
class NativeDecodeGuardSpec extends AnyFunSuite {

  private def block(cols: Seq[(String, String)], rows: Seq[Map[String, Any]]): Array[Byte] =
    MiniChSelect.encodeNative(cols, rows)

  private def decodeAll(body: Array[Byte], expect: Seq[(String, CHType)]) =
    NativeDecoder.decode(body, expect).toVector

  test("declared-vs-expected type mismatch fails loudly, not garbage") {
    // the exact countOrNull shape: wire says Nullable(UInt64), reader
    // expects plain Int64 — one extra mask byte per row would shift the
    // whole decode
    val body = block(Seq("n" -> "Nullable(UInt64)"), Seq(Map("n" -> BigInt(7))))
    val err = intercept[IllegalArgumentException] {
      decodeAll(body, Seq("n" -> CHType.parse("Int64")))
    }
    assert(err.getMessage.contains("declares type 'Nullable(UInt64)'"), err.getMessage)
    assert(err.getMessage.contains("Int64"), err.getMessage)
  }

  test("narrower integer declared than expected fails (width misframe)") {
    val body = block(Seq("v" -> "Int32"), Seq(Map("v" -> BigInt(1))))
    val err = intercept[IllegalArgumentException] {
      decodeAll(body, Seq("v" -> CHType.parse("Int64")))
    }
    assert(err.getMessage.contains("declares type 'Int32'"), err.getMessage)
  }

  test("unparseable declared type fails with the type text in the message") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1); out.write(1) // 1 col, 1 row (varints < 128)
    def str(s: String): Unit = { out.write(s.length); out.write(s.getBytes("UTF-8")) }
    str("c"); str("AggregateFunction(sum, UInt64)")
    out.write(Array.fill[Byte](8)(0), 0, 8)
    val err = intercept[IllegalArgumentException] {
      decodeAll(out.toByteArray, Seq("c" -> CHType.parse("Int64")))
    }
    assert(err.getMessage.contains("AggregateFunction"), err.getMessage)
  }

  test("wire-irrelevant spellings pass: LC wrapper, timezone, tuple names") {
    // server declares the plain inner type; reader expects the LC raw text
    val lc = block(Seq("t" -> "String"), Seq(Map("t" -> "x")))
    assert(decodeAll(lc, Seq("t" -> CHType.parse("LowCardinality(String)")))
      .head.getUTF8String(0).toString == "x")
    // timezone parameter differs
    val dt = block(Seq("d" -> "DateTime('UTC')"), Seq(Map("d" -> 1700000000000000L)))
    assert(decodeAll(dt, Seq("d" -> CHType.parse("DateTime")))
      .head.getLong(0) == 1700000000000000L)
    // tuple element names differ (elements are positional on the wire)
    val tup = block(Seq("p" -> "Tuple(a String, b Int32)"),
      Seq(Map("p" -> Map("a" -> "x", "b" -> BigInt(5)))))
    val row = decodeAll(tup, Seq("p" -> CHType.parse("Tuple(x String, y Int32)"))).head
    assert(row.getStruct(0, 2).getUTF8String(0).toString == "x")
    assert(row.getStruct(0, 2).getInt(1) == 5)
  }

  test("decode is STREAMING: rows flow before the response is drained, one block buffered") {
    val cols = Seq("id" -> "Int64")
    val rows1 = (1 to 50).map(i => Map[String, Any]("id" -> BigInt(i)))
    val rows2 = (51 to 100).map(i => Map[String, Any]("id" -> BigInt(i)))
    val b1 = block(cols, rows1)
    val body = b1 ++ block(cols, rows2)
    var consumed = 0
    val in = new java.io.FilterInputStream(new java.io.ByteArrayInputStream(body)) {
      override def read(): Int = { val v = super.read(); if (v >= 0) consumed += 1; v }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val k = super.read(b, off, len); if (k > 0) consumed += k; k
      }
    }
    val it = NativeDecoder.decode(in, Seq("id" -> CHType.parse("Int64")))
    assert(it.next().getLong(0) == 1L)
    assert(consumed < body.length,
      s"decode materialized the whole response up front ($consumed of ${body.length})")
    assert(consumed <= b1.length,
      s"decode pulled past the first block before its rows were asked for ($consumed > ${b1.length})")
    assert(it.map(_.getLong(0)).toVector == (2L to 100L).toVector)
  }

  test("a truncated stream fails loudly mid-iteration, never zero-pads") {
    val cols = Seq("id" -> "Int64")
    val full = block(cols, (1 to 10).map(i => Map[String, Any]("id" -> BigInt(i))))
    val cut = full.take(full.length - 4)
    val it = NativeDecoder.decode(new java.io.ByteArrayInputStream(cut),
      Seq("id" -> CHType.parse("Int64")))
    intercept[IndexOutOfBoundsException] { it.toVector }
  }

  test("genuinely different structure under a same-width spelling fails (Date32 vs IPv4)") {
    val body = block(Seq("v" -> "IPv4"), Seq(Map("v" -> "1.2.3.4")))
    val err = intercept[IllegalArgumentException] {
      decodeAll(body, Seq("v" -> CHType.parse("Date32")))
    }
    assert(err.getMessage.contains("refusing to decode"), err.getMessage)
  }
}
