package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge frame — the
  * local-clustering signal (spam farms and link rings are triangle-dense;
  * organic link neighborhoods are not) that complements [[PageRank]]'s
  * global authority score in a link-graph curation pass.
  *
  * Algorithm: degree-ordered edge orientation (Cohen 2009, "Graph twiddling
  * in a MapReduce world"; also Suri/Vassilvitskii WWW'11) followed by the
  * EDGE-ITERATOR count: every undirected edge is oriented from the endpoint
  * with (degree, id)-smaller rank to the larger, turning the graph into a
  * DAG in which each triangle {u,v,w} appears as exactly one wedge u→v,
  * v→w closed by u→w — equivalently, once at edge (u,v) for each common
  * out-neighbor w ∈ N⁺(u) ∩ N⁺(v). We build per-node sorted out-adjacency
  * arrays, join them onto the edge set, and intersect scan-locally.
  *
  * Why not the two-hash-join wedge formulation (oriented ⋈ oriented ⋈
  * oriented)? That plan MATERIALIZES the wedge set — Σ outdeg², O(m^1.5)
  * rows — through a shuffle before the closing join throws almost all of
  * it away. On the dense part-co-occurrence graph at sf0.1 (~20k nodes,
  * ~10⁶ edges) that is ~10⁸ shuffled wedge rows and was measured at 17 s;
  * the edge-iterator form does the same O(Σ_edges outdeg) comparison work
  * inside the scan, shuffles nothing wider than the edge set itself, and
  * measured 6× faster. Degree orientation still caps every adjacency
  * array at O(√m) under any skew (a node only points at neighbors of
  * degree ≥ its own, and there are ≤ 2m/d of those), so the per-edge
  * intersect is O(√m) worst case and the carried arrays stay small.
  *
  * The adjacency frame is one partial-agg'd groupBy of the edge set (≤ n
  * rows, Σ|array| = m values total); at local/benchmark scale AQE
  * broadcasts it into both edge joins. At 100 TB-graph scale, where n·√m
  * exceeds the broadcast ceiling, the same plan degrades gracefully to
  * two sort-merge joins keyed by node id — still never materializing a
  * wedge row.
  */
object Graph {

  /** k-core decomposition (Seidman 1983): the maximal subgraph in which
    * every node has degree ≥ k, computed by iterated peeling — drop all
    * nodes with degree < k, recompute degrees, repeat to fixpoint.
    * Returns `(id, deg)` for every surviving node with its in-core
    * degree. The spam-farm / dense-community signal that complements
    * [[triangleCounts]]' local clustering and PageRank's global
    * authority.
    *
    * Scale shape: each round is one partial-agg'd degree aggregate over
    * the surviving edge set plus two semi-joins against the keep set
    * (node-sized — broadcast at dimension scale, shuffle-keyed beyond);
    * the edge frame only ever SHRINKS. The per-round fixpoint check is a
    * 1-row driver action — the Pregel-loop shape shared with
    * [[graft.data.Clustering]]'s large-star rounds; round count is
    * bounded by the peel depth (log-ish in practice), never by |V|. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxRounds: Int = 100): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // DELTA peeling (r16 optimization; same unique fixpoint, different
    // loop invariant). The original loop REWROTE the edge frame every
    // round — two semi-joins over all surviving edges plus a full-edge
    // localCheckpoint per round, so a 14-deep peel checkpointed the edge
    // set 14 times and scanned it twice per round. But peeling only ever
    // needs (a) current degrees and (b) which nodes just dropped: the
    // edge set itself is STATIC. So: cache the symmetric edge list once,
    // hash-partitioned by u (persist preserves the partitioning, so the
    // initial degree aggregate plans with no Exchange — probed, see
    // OPTIMIZATION_r16.md), and iterate on the NODE-sized degree frame:
    // each round broadcasts the just-removed set, counts each survivor's
    // removed neighbors from one scan-local pass over the cached edges
    // (the only shuffle is the partial-agg'd per-node decrement — bounded
    // by nodes, not edges), and subtracts. Per-round work is
    // O(edges incident to removed) + node-sized updates, against the old
    // O(surviving edges) rewrite+checkpoint; the per-round checkpoint is
    // the 20k-row degree frame, not the million-row edge frame. Each
    // edge decrements a given endpoint at most once (when its OTHER
    // endpoint is removed; removed→removed edges die with the anti-join),
    // so the maintained degree is exactly the degree within the surviving
    // subgraph — the original invariant. Broadcasts are node-sized; at
    // billions of surviving nodes swap them for keyed shuffles, as the
    // old form documented.
    // NOT width-pinned (r17, measured): pinning this build's exchanges at
    // the session shuffle width the way triangleCounts does REGRESSED
    // kCore ~60% in an isolated alternating A/B — a 32-partition cached
    // edge list multiplies per-round task-launch overhead across the peel
    // rounds, and the rounds' work is node-sized. AQE's narrow layout is
    // the right one for a frame scanned many times cheaply.
    val sym = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()
      .select(explode(array(
        struct(col("lo").as("u"), col("hi").as("v")),
        struct(col("hi").as("u"), col("lo").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // degree = row count per u in the symmetric list; node-sized, and the
    // per-round lineage is truncated by the cheap NODE-frame checkpoint
    var deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("id"), col("deg"))
      .localCheckpoint()
    // Per-round driver round-trips cut from ~4 to 2 (r17): the removed
    // set was probed with isEmpty (job 1) and then BROADCAST twice (the
    // semi and the anti sides — two more collect jobs over the same
    // node-sized frame). It is node-sized and already funnels through
    // the driver inside those broadcast builds, so collect it ONCE: the
    // emptiness check is free, and broadcasting the resulting
    // LocalRelation builds driver-side with no job at all. Same
    // at-billions caveat as before — swap broadcasts for keyed shuffles
    // when the node frame outgrows the driver.
    val session = edges.sparkSession
    var rounds = 0
    while (rounds < maxRounds) {
      val removedIds = deg.filter(col("deg") < k).select(col("id"))
        .collect().map(_.getLong(0))
      if (removedIds.isEmpty) {
        sym.unpersist(false)
        return deg
      }
      import session.implicits._
      val removed = removedIds.toSeq.toDF("id")
      val decr = sym
        .join(broadcast(removed.withColumnRenamed("id", "u")), Seq("u"),
          "left_semi")
        .groupBy(col("v")).agg(count(lit(1)).as("dec"))
      deg = deg
        .join(broadcast(removed), Seq("id"), "left_anti")
        .join(broadcast(decr.withColumnRenamed("v", "id")), Seq("id"), "left")
        .select(col("id"),
          (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
        .localCheckpoint()
      rounds += 1
    }
    throw new IllegalStateException(s"k-core did not converge in $maxRounds rounds")
  }

  /** Synchronous label propagation (Raghavan et al. 2007, Phys. Rev. E 76)
    * over an undirected edge frame — near-linear-time community detection,
    * the coarse-community signal between connected components (too coarse)
    * and k-core / triangles (local density only). Every node starts
    * labeled with its own id; each round, every node adopts the label
    * carried by the plurality of its neighbors. Ties resolve
    * DETERMINISTICALLY to the smallest label among the maximal-count
    * candidates (classic LPA breaks ties randomly, which would make
    * results partition-dependent; with min-label ties this is a pure
    * function of the graph and the round count).
    *
    * Runs a FIXED `rounds` of synchronous updates (asynchronous LPA is
    * inherently order-dependent and unreproducible distributed). Returns
    * `(id, label)` per node.
    *
    * Scale shape: per round ONE hash join of the symmetric edge list
    * against the node-sized label frame plus two partial-agg'd aggregates
    * ((u, label) counts, then per-u argmax) — the shuffle carries at most
    * the edge list, and the label frame stays |V|-sized. The label frame
    * is EXPLICITLY broadcast into that join: each round's labels are
    * localCheckpoint'ed (lineage truncation, the [[kCore]] Pregel-loop
    * shape), which leaves AQE without stats — unhinted it plans a
    * sort-merge join of the full edge list EVERY round (hint + the
    * round-1 fast path below measured ~2.4× faster end-to-end at sf0.1).
    * |V| ≤ tens of millions fits a broadcast; beyond that drop the hint
    * and take the keyed shuffle.
    * Round 1 from identity labels needs no join at all: every neighbor
    * carries its own id, all counts are 1, so the plurality-min rule
    * degenerates to min(neighbor) — one aggregate instead of
    * join+count+argmax. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      rounds: Int): DataFrame = {
    // not width-pinned (r17, measured — see kCore): the pinned variant
    // read ~10% slower in an isolated A/B; per-round scans of the cached
    // list favor AQE's narrow layout
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()
    // Symmetrize in ONE pass (explode, not union — a union of two selects
    // over `und` duplicates the distinct's whole subtree and runs it
    // twice), then hash-partition by u and persist: every round's
    // (u,label)-count and per-u argmax below require only
    // ClusteredDistribution(u), which HashPartitioning(u) satisfies, and
    // the label frame joins in as a broadcast — so with the edge list
    // pre-partitioned by u the per-round plan carries ZERO exchanges
    // (guide §2.4: operations keyed the same way share one exchange; the
    // one shuffle happens here, once, instead of once per round).
    import org.apache.spark.storage.StorageLevel
    val sym = und
      .select(explode(array(
        struct(col("lo").as("u"), col("hi").as("v")),
        struct(col("hi").as("u"), col("lo").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .repartition(col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // identity-label round: distinct neighbors ⇒ all counts 1 ⇒ min(v)
    var labels = sym.groupBy(col("u")).agg(min(col("v")).as("label"))
      .select(col("u").as("id"), col("label"))
      .localCheckpoint()
    var r = 1
    while (r < rounds) {
      labels = sym
        .join(broadcast(labels.withColumnRenamed("id", "v")), Seq("v"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        // struct max on (count, −label): plurality label, ties to SMALLEST
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("mx"))
        .select(col("u").as("id"), (-col("mx.nl")).as("label"))
        .localCheckpoint()
      r += 1
    }
    // every round's labels frame is eagerly checkpointed, so nothing
    // downstream re-reads the cached edge list
    sym.unpersist(false)
    labels
  }

  /** Per-node triangle participation counts over `edges(aCol, bCol)`
    * (direction and duplicates ignored, self-loops dropped). Returns
    * `(id, n_triangles)` for every node with ≥1 triangle. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // Deliberately NOT materialized even though `und` feeds the degree
    // aggregate and both orientation joins: BOTH forms were measured —
    // caching `oriented` (MEMORY_AND_DISK, earlier wedge formulation) ran
    // 50% slower, and an r16 same-window A/B of localCheckpoint(und) read
    // 4.9 → 5.7 s at sf0.1 — eager materialization here blocks AQE's
    // runtime-stats replanning of the downstream joins and costs more
    // than recomputing the O(m) normalize+distinct. Recompute-with-AQE
    // stays the right default; a caller iterating many rounds over a
    // static graph can persist upstream.
    val width = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      // pinned (r17): the distinct's read stage carries the degree explode
      // and both orientation join probes — profiled at 3-4 AQE-coalesced
      // tasks over ~5 MB while CPU-dense
      .repartition(width, col("lo"), col("hi"))
      .distinct()

    // (degree, id) total order; orient every edge small-rank → large-rank.
    // One-pass explode symmetrize — a self-union would scan `und` twice.
    val deg = und
      .select(explode(array(col("lo"), col("hi"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.withColumnRenamed("id", "lo").withColumnRenamed("deg", "dlo"), "lo")
      .join(deg.withColumnRenamed("id", "hi").withColumnRenamed("deg", "dhi"), "hi")
      .select(
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("lo"))
          .otherwise(col("hi")).as("u"),
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")), col("hi"))
          .otherwise(col("lo")).as("v"))

    // Sorted out-adjacency per node; Σ|nbrs| = m, each |nbrs| = O(√m).
    // Pinned exchange width (r17; the IntervalJoin lesson): the stage
    // that reads this aggregate's shuffle is where the per-edge sorted
    // intersect runs — cost QUADRATIC-ish per byte (profiled at sf0.1:
    // 5.9 s of task CPU squeezed into 4 AQE-coalesced tasks over a 5 MB
    // shuffle). An explicitly-numbered repartition by the same key is
    // not AQE-coalescible, satisfies the aggregate's distribution (no
    // extra exchange), and rides spark.sql.shuffle.partitions — the
    // deployment-scaled knob.
    val adj = oriented.repartition(width, col("u"))
      .groupBy(col("u").as("id"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))

    // Edge (u,v) closes one triangle per w ∈ N⁺(u) ∩ N⁺(v); the DAG
    // orientation guarantees {u,v,w} is counted at exactly one edge.
    // Re-deriving the edge list by exploding the adjacency rows hands every
    // edge its tail's array N⁺(u) for free — no join needed on the u side —
    // and the head side is ONE broadcast join against the adjacency frame
    // (n rows, Σ|array| = m values ≈ 8·m bytes: a few MB even for
    // billion-edge graphs after the co-occurrence distinct). The
    // intersection then runs scan-locally; nothing wedge-shaped is ever
    // shuffled, and the edge set itself is never re-shuffled either. An
    // edge whose head v has no out-neighbors can close no triangle, so the
    // inner join dropping it is correct.
    // sorted_intersect: codegen'd two-pointer merge over the pre-sorted
    // adjacency arrays — array_intersect would build a hash set per EDGE,
    // and this intersection runs |E| times.
    val withCommon = adj
      .select(col("id").as("u"), col("nbrs").as("nu"),
        explode(col("nbrs")).as("v"))
      .join(broadcast(adj.select(col("id").as("v"), col("nbrs").as("nv"))),
        Seq("v"))
      .select(graft.exprs.NativeExpressions.sortedIntersect(
          col("nu"), col("nv")).as("common"),
        col("u"), col("v"))
      .filter(size(col("common")) > 0)

    // Per closing edge: u and v each participate in |common| triangles,
    // every w in the intersection in one. One explode emits all three
    // contribution streams in a single scan of the join output.
    withCommon
      .select(explode(concat(
        array(
          struct(col("u").as("id"), size(col("common")).cast("long").as("c")),
          struct(col("v").as("id"), size(col("common")).cast("long").as("c"))),
        transform(col("common"), w => struct(w.as("id"), lit(1L).as("c"))))).as("s"))
      .groupBy(col("s.id").as("id")).agg(sum(col("s.c")).as("n_triangles"))
  }
}
