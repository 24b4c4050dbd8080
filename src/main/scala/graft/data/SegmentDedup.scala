package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Segment-level (line-level) corpus deduplication.
  *
  * Web-scale training pipelines dedup below document granularity: the same
  * boilerplate line/paragraph (cookie banners, navigation, license headers)
  * appears across millions of otherwise-distinct pages, and removing repeated
  * SEGMENTS — keeping only their first occurrence corpus-wide — is a standard
  * curation pass (CCNet's line-dedup, RefinedWeb/Gopher line filters). The
  * reference engine has no sub-document operator (its dedup is keyed whole
  * events, `glassflow-api/internal/deduplication/badger/deduplication.go`);
  * this is part of the beyond-reference training-data tier.
  *
  * Segmentation is pluggable: by delimiter (real paragraphs/lines) or by
  * fixed token windows (for unstructured text, and the deterministic shape
  * the oracle checks). "First occurrence" is a total order — min
  * (docId, segIdx) over every occurrence of the segment's fingerprint — so
  * the result is unique regardless of partitioning or arrival order.
  *
  * Scale shape: one shuffle keyed by segment fingerprint (row_number over
  * fp; fingerprints are near-unique so per-key sorts are tiny), then one
  * groupBy(docId) to reassemble. Both shuffles carry segment text once —
  * inherent to "rebuild each document from its kept segments". Nothing is
  * ever broadcast or collected; work distributes by fingerprint and by
  * document, so hot segments cost one winner row each, not a hot partition.
  */
object SegmentDedup {

  /** Explode text into fixed token-window segments: tokens = `\s+` split of
    * trimmed text, segment i = tokens [i·w, i·w + w) joined by one space.
    * Emits (idCol, seg_idx, seg); empty/whitespace-only text yields no rows
    * (`sequence` guarded — Spark's sequence(0,-1) would descend). */
  def tokenWindowSegments(df: DataFrame, idCol: String, textCol: String,
                          windowTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val toks = split(trim(col(textCol)), "\\s+")
    val nw = ceil(size(toks) / lit(windowTokens.toDouble)).cast(LongType)
    val segArr = when(size(toks) === 0 || (size(toks) === 1 && element_at(toks, 1) === ""),
        array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0L), nw - 1),
        i => array_join(
          slice(toks, (i * windowTokens + 1).cast("int"), lit(windowTokens)), " ")))
    df.select(col(idCol), posexplode(segArr).as(Seq("seg_idx", "seg")))
      .withColumn("seg_idx", col("seg_idx").cast(LongType))
  }

  /** Corpus-wide segment dedup over pre-segmented rows (idCol, idxCol,
    * segCol): keep a segment occurrence iff it is the first — minimum
    * (id, idx) — for its fingerprint; rebuild each document from its kept
    * segments in original order. Returns one row per document that produced
    * at least one segment:
    * (idCol, n_segments, n_kept, dedup_text); a document whose every
    * segment appeared earlier elsewhere survives with n_kept = 0 and empty
    * text, so downstream length filters can drop it explicitly. */
  def dedupSegments(segs: DataFrame, idCol: String, idxCol: String,
                    segCol: String): DataFrame = {
    val byFp = Window.partitionBy(md5(col(segCol)))
      .orderBy(col(idCol), col(idxCol))
    segs
      .withColumn("__keep", row_number().over(byFp) === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls from non-kept rows; array_sort on
        // struct orders by idx (first field) — original segment order.
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col(idxCol).as("i"), col(segCol).as("s"))))),
          x => x.getField("s"))).as("dedup_text"))
  }

  /** Token-window segmentation + corpus dedup in one call (the query-surface
    * form): documents (idCol, textCol) → (idCol, n_segments, n_kept,
    * dedup_text). */
  def byTokenWindows(df: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int): DataFrame =
    dedupSegments(tokenWindowSegments(df, idCol, textCol, windowTokens),
      idCol, "seg_idx", "seg")

  /** Delimiter segmentation (real lines/paragraphs): split on a literal
    * delimiter, drop empty segments, dedup corpus-wide. */
  def byDelimiter(df: DataFrame, idCol: String, textCol: String,
                  delimiter: String): DataFrame = {
    val segs = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delimiter)))
          .as(Seq("seg_idx", "seg")))
      .withColumn("seg_idx", col("seg_idx").cast(LongType))
      .filter(trim(col("seg")) =!= "")
    dedupSegments(segs, idCol, "seg_idx", "seg")
  }
}
