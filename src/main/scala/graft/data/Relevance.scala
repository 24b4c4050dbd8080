package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: BM25 (Robertson/Spärck Jones probabilistic
  * retrieval ranking function) of every document against a fixed query
  * term set.
  *
  * Scale shape: the term-frequency build is the classic inverted-index
  * pass — explode tokens, FILTER TO QUERY TERMS BEFORE THE SHUFFLE (the
  * predicate sits on the exploded term, so the groupBy shuffle carries
  * only query-term postings, not the corpus vocabulary), then one keyed
  * aggregate with map-side combine. Document frequencies reduce to
  * |terms| rows and broadcast back; document length is scan-local. Per-doc
  * scores are summed as integer milli-points so the result is
  * order-independent and engine-portable (float addition order never
  * matters).
  */
object Relevance {

  /** Top-k TF-IDF terms per document — the classic keyword/signature
    * extraction pass (smoothed idf = ln((N+1)/(df+1)) + 1, scores as
    * integer milli-points for engine-portable, order-independent sums).
    *
    * Scale shape: term frequencies partial-aggregate map-side before the
    * (id, term) shuffle; document frequencies are one keyed rollup with a
    * `minDf` cutoff that drops the hapax tail (most of an open vocabulary)
    * BEFORE the score join — and that join is left to Catalyst/AQE rather
    * than a broadcast hint because a 100 TB corpus vocabulary does not fit
    * an executor. The per-doc top-k runs as the mergeable k-item heap
    * aggregate ([[graft.exprs.TopKBy]], ObjectHashAggregate): the final
    * shuffle carries at most k rows per (doc, map task), never the full
    * posting list. Ties break by term DESCENDING (one total order for the
    * heap's struct comparison: score desc, then term desc). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int, minDf: Long = 2L): DataFrame = {
    // spread the single-task scan before tokenizing (guide §2.5), and
    // checkpoint the (id, term, tf) frame: both the df aggregate and the
    // scoring join read it, and each re-ran the tokenize+explode
    val base = Spread.byKey(docs, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
    val n = base.count()
    val tf = base.select(col("id"), explode(col("toks")).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .withColumn("idf", log((lit(n.toDouble) + 1.0) / (col("df") + 1.0)) + 1.0)
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf_milli",
        round(lit(1000.0) * col("tf") * col("idf")).cast("long"))
    val top = graft.exprs.TopKBy.topKBy(
      struct(col("tfidf_milli"), col("term")),
      struct(col("term"), col("tf"), col("tfidf_milli")), k)
    scored.groupBy(col("id")).agg(top.as("top"))
      .select(col("id"), posexplode(col("top")))
      .select(col("id").as(idCol), col("col.term").as("term"),
        col("col.tf").as("tf"), col("col.tfidf_milli").as("tfidf_milli"),
        (col("pos") + 1).as("rk"))
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val dl = base.select(col("id"), size(col("toks")).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head()
    val n = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / n
    val tf = base
      .select(col("id"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*)) // pre-shuffle pushdown
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "id")
      .withColumn("score_milli",
        round(lit(1000) * col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))).cast("long"))
      .groupBy(col("id")).agg(sum(col("score_milli")).as("bm25_milli"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("bm25_milli"), lit(0L)).as("bm25_milli"))
  }
}
