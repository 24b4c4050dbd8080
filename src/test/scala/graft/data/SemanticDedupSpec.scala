package graft.data

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toVecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("assignments are bit-identical across partitionings (exact-integer centroids)") {
    val rnd = new Random(5)
    val rows = (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val a = SemanticDedup.kmeansAssign(toVecs(rows).repartition(1), "vec_id", "embedding", 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SemanticDedup.kmeansAssign(toVecs(rows).repartition(13), "vec_id", "embedding", 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.size == 200 && a == b)
  }

  test("planted near-copies land in one cluster and the larger id is dropped") {
    val rnd = new Random(9)
    def unit(seed: Int) = {
      val r = new Random(seed)
      val v = Seq.fill(16)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 40 well-separated random vectors + near-copies of 0 and 7
    val base = (0L until 40L).map(i => (i, unit(i.toInt + 100)))
    val copies = Seq(0L, 7L).map(i =>
      (1000L + i, base(i.toInt)._2.map(x => x * 0.999f)))
    val out = SemanticDedup.semanticDedup(
        toVecs(base ++ copies), "vec_id", "embedding", 4, 2, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(r => r._1 -> r).toMap
    Seq(0L, 7L).foreach { i =>
      assert(byId(1000L + i)._2 == byId(i)._2, s"copy of $i in same cluster")
      assert(!byId(1000L + i)._3, s"copy of $i dropped")
      assert(byId(i)._3, s"original $i kept")
    }
    assert(out.count(!_._3) == 2) // nothing else is that similar
  }

  test("a cluster that loses all members keeps its centroid (no crash, full cover)") {
    // ids 0,1 identical; tie-breaks route every nearby vector to cluster 0,
    // starving cluster 1 through both update rounds
    val rows = Seq[(Long, Seq[Float])](
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0.9f, 0.1f)), (4L, Seq(0.1f, 0.9f)), (5L, Seq(0.95f, 0.05f)))
    val out = SemanticDedup.kmeansAssign(toVecs(rows), "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 6)
    assert(out(1L) == 0L || out(1L) == 1L) // assigned somewhere sane
    assert(out.values.toSet.subsetOf(Set(0L, 1L, 2L)))
  }
}
