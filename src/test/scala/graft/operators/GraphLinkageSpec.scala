package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FuzzyJoin (edit-distance linkage with length-band blocking) and
  * PageRank (integer fixed point) — the two round-6 graph/linkage ops. */
class GraphLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy join: banded result equals exhaustive levenshtein truth") {
    // randomized corpus with planted near-dups: base words + small edits
    val rnd = new scala.util.Random(42)
    val bases = Vector("analytics", "pipeline", "streaming", "catalyst", "shuffle")
    val rows = (0L until 120L).map { i =>
      val b = bases(rnd.nextInt(bases.size))
      val mutated = rnd.nextInt(4) match {
        case 0 => b                                   // exact dup
        case 1 => b.dropRight(1)                      // deletion
        case 2 => b + ('a' + rnd.nextInt(26)).toChar  // insertion
        case _ => b.updated(rnd.nextInt(b.length), ('a' + rnd.nextInt(26)).toChar)
      }
      (i, mutated)
    } ++ Seq( // shorter than k=3 segments: exercises the brute branch
      (900L, "ab"), (901L, "a"), (902L, "ac"), (903L, "b"), (904L, ""))
    val df = rows.toDF("id", "t")
    val banded = FuzzyJoin.selfJoin(df, "id", "t", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exhaustive truth
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      d = lev(ta, tb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(truth.nonEmpty, "fixture must plant near-dup pairs")
    assert(banded == truth, "length banding must be lossless for dist <= maxDist")
  }

  test("pagerank: fixed point matches hand-rolled iteration on a small graph") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 4 dangling (in-links only)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = PageRank.fixedPoint(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the exact integer arithmetic: n=4, r0 = 250000 each
    val n = 4L
    val tele = 150000L / n
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      val deg = Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
      val contrib = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
        }
      (1L to 4L).map(id => id -> (tele + 85L * contrib.getOrElse(id, 0L) / 100L)).toMap
    }
    val expected = step(step((1L to 4L).map(_ -> 1000000L / n).toMap))
    assert(out == expected)
    // mass conservation (within truncation loss): total <= 1e6, positive ranks
    assert(out.values.sum <= 1000000L && out.values.forall(_ > 0))
    // sink node 4 collects; source-only node 1 ends at pure teleport
    assert(out(1L) == tele)
    assert(out(4L) > out(1L))
  }

  test("tfidf top-k: scores and ranks on a tiny corpus") {
    val docs = Seq(
      (1L, "spark spark fast engine"),
      (2L, "spark query engine"),
      (3L, "slow turtle walks")).toDF("doc_id", "text")
    val out = graft.data.Relevance.tfidfTopK(docs, "doc_id", "text", k = 2, minDf = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    // df>=2 terms: spark (docs 1,2), engine (docs 1,2); n=3
    val idf = math.log(4.0 / 3.0) + 1.0
    def milli(tf: Long) = math.round(1000.0 * tf * idf)
    assert(out((1L, "spark")) == ((2L, milli(2), 1)))
    assert(out((1L, "engine")) == ((1L, milli(1), 2)))
    assert(out((2L, "spark"))._3 <= 2 && out((2L, "engine"))._3 <= 2)
    // doc 3 has no df>=2 terms: absent entirely
    assert(!out.keys.exists(_._1 == 3L))
  }

  test("BFS distances: frontier layers, shortest wins, depth bound, unreached absent") {
    // path 0-1-2-3-4 plus shortcut 0-3; undirected
    val e0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (7L, 8L))
      .toDF("u", "v")
    val e = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
    val seeds = Seq(0L).toDF("id")
    val got = Bfs.distances(e, "u", "v", seeds, "id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 3 via the shortcut (dist 1), 4 via shortcut+1 (dist 2); 2 at dist 2
    assert(got == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
    // depth bound: maxDepth 1 stops after the first layer
    val shallow = Bfs.distances(e, "u", "v", seeds, "id", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(shallow == Map(0L -> 0L, 1L -> 1L, 3L -> 1L))
    // disconnected component (7,8) never appears
    assert(!got.contains(7L) && !got.contains(8L))
  }

  test("BFS deep traversal: depth-20+ chain, bounded plans, frontier drain") {
    // a 25-hop chain: lineage without the periodic localCheckpoint grows a
    // union/anti-join chain 25 deep and analysis time explodes; with it the
    // traversal is round-bounded. maxDepth far beyond the diameter must
    // cost nothing extra (frontier drains at depth 25, loop exits early).
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("u", "v")
    val seeds = Seq(0L).toDF("id")
    val got = Bfs.distances(chain, "u", "v", seeds, "id", maxDepth = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L to 25L).map(i => i -> i).toMap)
  }

  test("bounded-hop weighted SSSP: multi-hop beats direct edge, hop bound binds, parallel edges relax") {
    // 0→1 direct costs 10; 0→2→1 costs 1+2=3 but needs 2 hops; a parallel
    // 0→2 edge at weight 5 must lose to the weight-1 edge
    val e = Seq((0L, 1L, 10L), (0L, 2L, 1L), (0L, 2L, 5L), (2L, 1L, 2L),
      (7L, 8L, 1L)).toDF("u", "v", "w")
    val seeds = Seq(0L).toDF("id")
    def run(r: Int) = Bfs.ssspBounded(e, "u", "v", "w", seeds, "id", r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // 1 round: only direct edges relaxed
    assert(run(1) == Map(0L -> 0L, 1L -> 10L, 2L -> 1L))
    // 2 rounds: the cheaper 2-hop path wins; disconnected (7,8) absent
    assert(run(2) == Map(0L -> 0L, 1L -> 3L, 2L -> 1L))
  }
}
