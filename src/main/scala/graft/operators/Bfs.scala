package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first shortest distance over an edge frame —
  * the graph-traversal primitive beside the fixed-point tier
  * ([[PageRank]], label propagation, connected components): "how many
  * hops is every node from the seed set", bounded to `maxDepth`.
  * Unweighted BFS layers are exact integers, so the result is
  * partition-invariant and an unrolled SQL oracle replays it.
  *
  * Scale shape (100 TB): FRONTIER expansion, not whole-set relaxation —
  * each round joins only the nodes settled in the previous round against
  * the edge frame (hash join on the node key), dedups the expansion, and
  * anti-joins the already-settled set so a node is emitted exactly once
  * at its first (= shortest) depth. Work per round is proportional to
  * the frontier's out-edges, the textbook level-synchronous distributed
  * BFS; the settled set only ever grows by append (union), never
  * rescans. Edges are reused every round — at scale, persist/bucket the
  * edge frame by `src` so the per-round join is co-located.
  */
object Bfs {

  /** Distances 0..maxDepth from `seeds(id)` over DIRECTED
    * `edges(srcCol, dstCol)` (feed both directions for an undirected
    * graph); returns `(id, dist)` for every reached node.
    *
    * The deduped edge frame is persisted for the duration of the loop
    * (it is re-joined every round — without the persist, the dedup
    * SHUFFLE replays once per depth under lazy lineage) and unpersisted
    * before returning. Every `checkpointEvery` rounds, settled/frontier
    * are `localCheckpoint`ed (the [[graft.data.Clustering]] fixpoint
    * pattern) so plan depth stays bounded for deep traversals, and the
    * loop exits early once the frontier drains — `maxDepth` far above
    * the graph's diameter costs nothing past the drain point. */
  /** Round bound under which [[ssspBounded]] builds as ONE lazy plan (no
    * per-round actions) — the r16 PageRank lesson: a linear per-round
    * lineage (each round = one groupBy over the previous round's output)
    * plans as a single physical DAG whose per-round aggregate exchanges
    * are each consumed twice (relax join + union) and shared by
    * reference, so the whole query runs as one job instead of
    * 2-3 driver jobs per round. A/B at sf0.1 (alternating, 2 windows):
    * 3.3-3.9 s lazy vs 5.2-7.1 s eager, taskCpu 5 s vs 13-23 s. Only for
    * small fixed round counts — plan size grows per round. [[distances]]
    * deliberately does NOT take this path (measured: jobs 29 → 62, wall
    * par-to-worse) because its state is a growing union-of-layers that
    * later anti-joins re-reference, which the lazy DAG re-derives per
    * reference. */
  private val LazyDepthCap = 8

  def distances(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, seedCol: String,
                maxDepth: Int, checkpointEvery: Int = 4): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // NO edge dedup: duplicate (u,v) rows only produce duplicate expansion
    // rows, and the per-round distinct() on the expansion collapses those
    // anyway — a distinct here would pay an extra aggregate over the full
    // edge set for nothing (measured ~2s of the old 8s at sf0.1).
    // NOTE (r17, measured): the ssspBounded-style LAZY unroll was A/B'd
    // here and REGRESSED (jobs 29 → 62, wall par-to-worse): BFS's state is
    // a GROWING UNION of layers that every later round's anti-join also
    // references, so the lazy DAG re-derives each layer once per
    // downstream reference (sssp's state is one linear groupBy chain and
    // wins lazy — see below). The eager per-layer checkpoint stays.
    // Persist partitioned by the join key: the cached relation carries
    // HashPartitioning(u), so every round's frontier join reuses it and
    // exchanges only the frontier.
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Level-synchronous = each layer MATERIALIZES before the next expands.
    // Every round's frontier (and the seed layer) is localCheckpoint'ed
    // eagerly: under lazy lineage, round N's plan would otherwise replay
    // rounds 1..N-1 — including the caller's whole edge build hiding in
    // the seed frame's lineage — once per remaining round (measured ×3-4
    // recompute at depth 3, and quadratic beyond). A frontier is one
    // node-layer, the cheap thing in BFS; the edges are what must not be
    // re-materialized, and they sit in the cache above.
    var settled = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = settled.select("id")
    var depth = 1
    var drained = false
    while (depth <= maxDepth && !drained) {
      val next = frontier.join(e, col("id") === col("u"))
        .select(col("v").as("id")).distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      settled = settled.unionByName(next.withColumn("dist", lit(depth.toLong)))
      // settled is a union of materialized layers — cheap — but a deep
      // traversal would still grow the union node per round; fold it flat
      // every few rounds
      if (depth % checkpointEvery == 0) settled = settled.localCheckpoint(true)
      frontier = next
      drained = frontier.isEmpty // free: the layer was just materialized
      depth += 1
    }
    // settled references only checkpointed layers, never `e`
    e.unpersist(false)
    settled
  }

  /** Bounded-hop WEIGHTED shortest distances: `rounds` unrolled
    * Bellman-Ford relaxations from `seeds(id)` over DIRECTED
    * `edges(srcCol, dstCol, weightCol)` — "cheapest way to reach each
    * node using at most k hops". Exact integer distances (weights cast
    * to long), so the result is partition-invariant and an unrolled SQL
    * oracle replays it; k-hop-bounded is the CONTRACT, not an
    * approximation, so there is no convergence probe to pay for.
    *
    * Scale shape (100 TB): per round ONE hash join of the node-sized
    * distance frame against the cached edge frame (partitioned by the
    * join key — only the distance side exchanges) and ONE keyed min
    * aggregate with map-side combine (the shuffle carries one candidate
    * per node per map task, not the relaxation fan-out). The distance
    * frame localCheckpoints each round — same lineage argument as
    * [[distances]]. Parallel edges need no dedup: the min-aggregate is
    * exactly the relaxation, so extra candidates only add combine work. */
  def ssspBounded(edges: DataFrame, srcCol: String, dstCol: String,
                  weightCol: String, seeds: DataFrame, seedCol: String,
                  rounds: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    if (rounds <= LazyDepthCap) {
      // LAZY bounded relaxation (see [[distances]]): k unrolled rounds as
      // one plan, one job at the caller's action. Each round's min
      // aggregate is an exchange the next round's join and union both
      // reference — shared, not recomputed — and the checkpointed edge
      // frame ships through one reused exchange.
      val e = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w")).localCheckpoint()
      var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
        .withColumn("dist", lit(0L))
      (1 to rounds).foreach { _ =>
        val relaxed = dist.join(e, col("id") === col("u"))
          .select(col("v").as("id"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy("id").agg(min(col("dist")).as("dist"))
      }
      return dist
    }
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w"))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val relaxed = dist.join(e, col("id") === col("u"))
        .select(col("v").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    e.unpersist(false)
    dist
  }
}
