package graft.exprs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the bit-by-bit reference across the range") {
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7fffffffL, 0x7fffffffL)) ++
      (0 until 200).map(_ => (rnd.nextLong().abs & 0x7fffffffL,
        rnd.nextLong().abs & 0x7fffffffL))
    cases.foreach { case (x, y) =>
      assert(ZOrderFunctions.interleave(x, y) == refInterleave(x, y), s"($x,$y)")
    }
  }

  test("z-order preserves locality: nearby points share high bits") {
    val z1 = ZOrderFunctions.interleave(100, 200)
    val z2 = ZOrderFunctions.interleave(101, 200)
    val z3 = ZOrderFunctions.interleave(100000, 900000)
    assert((z1 ^ z2) < (z1 ^ z3))
  }

  test("expression evaluates in column API and SQL, codegen and interpreted") {
    val df = Seq((3L, 5L), (1023L, 2047L)).toDF("x", "y")
    val viaApi = df.select(ZOrder.interleaveBits(col("x"), col("y"))).as[Long].collect()
    assert(viaApi.toSeq == Seq(refInterleave(3, 5), refInterleave(1023, 2047)))
    ZOrder.register(spark)
    val viaSql = df.selectExpr("interleave_bits(x, y)").as[Long].collect()
    assert(viaSql.toSeq == viaApi.toSeq)
    // interpreted path (eval): codegen fallback produces the same values
    val interp = InterleaveBits(
      org.apache.spark.sql.catalyst.expressions.Literal(3L),
      org.apache.spark.sql.catalyst.expressions.Literal(5L)).eval(null)
    assert(interp == refInterleave(3, 5))
  }

  test("null inputs yield null") {
    val df = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
    val out = df.select(ZOrder.interleaveBits(col("x"), col("y"))).collect()
    assert(out.head.isNullAt(0))
  }
}
