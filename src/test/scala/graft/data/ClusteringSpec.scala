package graft.data

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Default path: small edge sets take the driver union-find. */
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** localThreshold=0 forces the distributed star rounds. */
  private def ccDist(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b",
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find for cross-checking. */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // roots after full path compression are the component minima
    nodes.foreach(find)
    nodes.map(n => n -> find(n)).toMap
  }

  test("two disjoint components and a chain resolve to component minima") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (9L, 7L))
    val got = cc(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 7L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (log rounds, not diameter rounds)") {
    // path 0-1-2-...-200: diameter 200; must still resolve within the
    // default 25-round cap — only possible with star contraction
    val edges = (0L until 200L).map(i => (i, i + 1))
    val got = ccDist(edges)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("matches union-find on a seeded random graph (both paths)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    assert(cc(edges) == bruteCC(edges))
    assert(ccDist(edges) == bruteCC(edges))
  }

  test("self-loops ignored; duplicate and reversed edges collapse") {
    val edges = Seq((1L, 1L), (2L, 4L), (4L, 2L), (2L, 4L))
    val got = cc(edges)
    assert(got == Map(2L -> 2L, 4L -> 2L))
  }

  test("assignClusters covers every doc, singletons self-clustered, min-id representative") {
    val docs = (0L to 9L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((7L, 2L, 0.9), (2L, 5L, 0.85)).toDF("id_a", "id_b", "jaccard")
    val out = Clustering.assignClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val clustered = Set((2L, 2L, true), (5L, 2L, false), (7L, 2L, false))
    val singles = (0L to 9L).filterNot(Set(2L, 5L, 7L))
      .map(i => (i, i, true)).toSet
    assert(out == clustered ++ singles)
  }
}
