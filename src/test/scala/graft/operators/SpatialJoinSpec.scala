package graft.operators

import scala.util.Random

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= r * r
    } yield (ai, bi, d2)).sorted

  test("radiusPairs equals brute force on random points, incl. negative coords") {
    val rnd = new Random(97)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextLong(2000) - 1000, rnd.nextLong(2000) - 1000))
    for (cw <- Seq(60L, 100L, 250L)) {
      val got = SpatialJoin.radiusPairs(pts.toDF("id", "x", "y"),
          "id", "x", "y", radius = 60L, cellWidth = cw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(got == brute(pts, 60L), s"cellWidth=$cw")
    }
  }

  test("each qualifying pair is emitted exactly once (same cell and cross cell)") {
    val pts = Seq((1L, 0L, 0L), (2L, 5L, 5L), (3L, 99L, 0L), (4L, 101L, 0L))
    val got = SpatialJoin.radiusPairs(pts.toDF("id", "x", "y"),
        "id", "x", "y", radius = 10L, cellWidth = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // (1,2) same cell; (3,4) straddles the cell boundary at x=100
    assert(got == Seq((1L, 2L), (3L, 4L)))
  }

  test("cellWidth below radius is rejected") {
    intercept[IllegalArgumentException] {
      SpatialJoin.radiusPairs(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        "id", "x", "y", radius = 10L, cellWidth = 5L)
    }
  }
}
