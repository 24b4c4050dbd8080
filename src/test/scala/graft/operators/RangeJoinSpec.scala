package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomCase(seed: Int, nIv: Int, nPt: Int, maxLen: Long) = {
    val rnd = new Random(seed)
    val iv = (0 until nIv).map { i =>
      val s = rnd.nextLong(1000000L)
      (i.toLong, s, s + 1 + rnd.nextLong(maxLen)) // end > start
    }.toDF("iv_id", "s", "e")
    val pt = (0 until nPt).map { i =>
      (10000L + i, rnd.nextLong(1100000L))
    }.toDF("pt_id", "p")
    (iv, pt)
  }

  private def brute(iv: org.apache.spark.sql.DataFrame,
                    pt: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    iv.crossJoin(pt).filter(col("p") >= col("s") && col("p") < col("e"))
      .select(col("iv_id"), col("pt_id")).as[(Long, Long)].collect().toSet

  private def bucketed(iv: org.apache.spark.sql.DataFrame,
                       pt: org.apache.spark.sql.DataFrame,
                       w: Long): Seq[(Long, Long)] =
    RangeJoin.pointInInterval(iv, pt, "s", "e", "p", w)
      .select(col("iv_id"), col("pt_id")).as[(Long, Long)].collect().toSeq

  test("matches brute force exactly, each pair exactly once, any bucket width") {
    for (seed <- 1 to 3) {
      val (iv, pt) = randomCase(seed, nIv = 80, nPt = 300, maxLen = 50000L)
      val truth = brute(iv, pt)
      // widths below, at, and far above the max interval length
      for (w <- Seq(1000L, 50001L, 1000000L)) {
        val got = bucketed(iv, pt, w)
        assert(got.size == got.distinct.size, s"duplicate pairs at width $w")
        assert(got.toSet == truth, s"mismatch at width $w seed $seed")
      }
    }
  }

  test("inverted and empty intervals match nothing") {
    val iv = Seq((1L, 100L, 100L), (2L, 200L, 150L), (3L, 0L, 1000L))
      .toDF("iv_id", "s", "e")
    val pt = Seq((10L, 100L), (11L, 175L), (12L, 500L)).toDF("pt_id", "p")
    val got = bucketed(iv, pt, 64L)
    assert(got.toSet == Set((3L, 10L), (3L, 11L), (3L, 12L)))
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val iv = Seq((1L, 10L, 20L)).toDF("iv_id", "s", "e")
    val pt = Seq((1L, 9L), (2L, 10L), (3L, 19L), (4L, 20L)).toDF("pt_id", "p")
    assert(bucketed(iv, pt, 10L).map(_._2).sorted == Seq(2L, 3L))
  }

  test("rejects colliding column names and non-positive widths") {
    val iv = Seq((1L, 1L, 2L)).toDF("id", "s", "e")
    val pt = Seq((1L, 1L)).toDF("id", "p")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(iv, pt, "s", "e", "p", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(iv.withColumnRenamed("id", "iv_id"), pt, "s", "e", "p", 0L)
    }
  }
}
