package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents sharing word n-grams
  * with a held-out benchmark/eval set (the standard n-gram-overlap
  * contamination test from the GPT-3 and PaLM dataset reports).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus (eval
  * sets vs a 100-TB crawl), so its distinct gram set broadcasts and the
  * corpus-side probe is a broadcast semi-join inside the scan pass — the
  * corpus is never shuffled. Per-doc gram sets are deduped scan-side
  * (`array_distinct`) so counts mean "distinct shared grams". If the
  * benchmark side ever outgrew broadcast, the same plan degrades to a
  * shuffled hash join on the gram key with no other change.
  */
object Contamination {

  /** Per corpus doc (≥ n tokens): total distinct n-grams, how many also
    * occur anywhere in `bench`, and the contaminated fraction in milli
    * (integer floor — engine-portable). */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .where(size(TextFunctions.tokens(col(textCol))) >= n)
      .select(col(idCol).cast("long").as("id"),
        array_distinct(TextFunctions.wordGrams(col(textCol), n)).as("grams"))
    val benchGrams = grams(bench)
      .select(explode(col("grams")).as("gram")).distinct()
    val corpusGrams = grams(corpus)
    val hits = corpusGrams
      .select(col("id"), explode(col("grams")).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hit"))
    corpusGrams
      .select(col("id"), size(col("grams")).as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_contaminated"),
        floor(coalesce(col("n_hit"), lit(0L)) * 1000 / col("n_grams"))
          .cast("int").as("contam_milli"))
  }
}
