package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for selected queries
  * so scan pruning (`ReadSchema`/`PushedFilters`), join strategies
  * (broadcast vs sort-merge), partial aggregation, and whole-stage-codegen
  * spans can be inspected per round. `tools/run.sh graft.PlanAudit
  * [sfDir] [query...]` — no args prints the audit set used in SCALE.md. */
object PlanAudit {

  val defaultSet: Seq[String] = Seq(
    "q_filter_expr", "q1_agg", "q_rollup_join", "q_topk", "q_asof_join",
    "q_doc_dedup_exact", "q_minhash_dedup", "q_embed_dedup", "q_ann_topk",
    "q_text_stats", "q_multimodal", "q_pipeline_e2e",
    "q_text_repetition", "q_pii", "q_bm25", "q_contamination",
    "q_topk_per_key", "q_sample_stratified", "q_embed_dedup_lsh",
    "q_segment_dedup", "q_pack_sequences", "q_dedup_clusters")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else defaultSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Exception => println(s"  (failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
