package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge frame — the
  * local-clustering signal (spam farms and link rings are triangle-dense;
  * organic link neighborhoods are not) that complements [[PageRank]]'s
  * global authority score in a link-graph curation pass.
  *
  * Algorithm: degree-ordered edge orientation (Cohen 2009, "Graph twiddling
  * in a MapReduce world"; also Suri/Vassilvitskii WWW'11). Every undirected
  * edge is oriented from the endpoint with (degree, id)-smaller rank to the
  * larger, turning the graph into a DAG in which each triangle {u,v,w}
  * appears as EXACTLY one wedge u→v, v→w closed by u→w. Counting is then
  * two hash joins:
  *
  *   wedges  = oriented ⋈_{mid} oriented   (u→v joined v→w)
  *   closed  = wedges   ⋈_{(u,w)} oriented
  *
  * The orientation is the scale guarantee: out-degree under degree order is
  * O(√m) for any graph (a node of degree d only points at neighbors of
  * degree ≥ d, and there are ≤ 2m/d of those), so the wedge set — the only
  * super-linear intermediate — is bounded by Σ outdeg² = O(m^1.5)
  * regardless of skew. Orienting by raw id instead would put a celebrity
  * node's full d² wedge fan in one partition.
  */
object Graph {

  /** Per-node triangle participation counts over `edges(aCol, bCol)`
    * (direction and duplicates ignored, self-loops dropped). Returns
    * `(id, n_triangles)` for every node with ≥1 triangle. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()

    // (degree, id) total order; orient every edge small-rank → large-rank.
    // Deliberately NOT persisted even though `oriented` is referenced three
    // times below: measured at sf0.1, caching it (MEMORY_AND_DISK) ran 50%
    // SLOWER (29.9 s vs 19.5 s solo) — the InMemoryRelation blocks AQE's
    // runtime-stats replanning of the wedge/closure joins and adds the
    // cache build, which costs more than recomputing the O(m) orientation
    // per reference. Recompute-with-AQE is the right default; a caller
    // iterating many rounds over a static graph can persist upstream.
    val deg = und.select(col("lo").as("id")).union(und.select(col("hi")))
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

    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val closed = wedges
      .join(oriented.as("e3"),
        col("x") === col("e3.u") && col("z") === col("e3.v"))
      .select(col("x"), col("y"), col("z"))

    closed
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }
}
