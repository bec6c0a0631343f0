package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def show(name: String): Unit = {
      println(s"===== $name =====")
      println(Queries.all(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode).split("\n")
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("Filter") || l.contains("Codegen") || l.contains("Physical Plan")
          || l.contains("PushedFilters") || l.contains("ReadSchema")).take(25).mkString("\n")
        // the Sampling null-key sentinel is a literal NUL in plan text;
        // escape control chars so the committed audit stays a text file
        .flatMap(c => if (c < ' ' && c != '\n') f"\\u${c.toInt}%04x" else c.toString))
    }
    Seq("q1_lineitem_agg", "q3_revenue_by_order", "som_winner_expr",
        "dedup_exact", "ann_cosine_topk", "dedup_minhash", "events_hourly",
        "multimodal_resize", "multimodal_frames", "multimodal_decode",
        "dedup_simhash", "text_stats", "token_freq_topk", "doc_chunks",
        "repetition_stats", "pattern_counts", "ann_lsh_topk", "ann_recall",
        "contamination", "dedup_drop_near", "stratified_sample",
        "doc_freq", "tfidf_terms", "dup_spans", "span_dedup",
        "corpus_stats", "gopher_filter", "unigram_ce",
        "curation_e2e", "pack_fill", "mixture_sample", "dedup_semantic",
        "pq_encode", "pq_topk", "normalize_text", "script_ratios",
        "bigram_ce", "ppl_filter", "events_asof", "events_range_join",
        "fixed_per_lang", "weighted_sample", "dedup_edit_verify",
        "profile_docs", "dedup_bloom_gate", "budget_select",
        "ann_ivfpq", "quality_logit", "vocab_size", "dedup_keep_best",
        "strip_markup", "doc_len_quantiles", "len_histogram",
        "events_rolling", "emb_norm_stats", "dedup_pr", "corpus_rollup",
        "events_funnel", "dedup_bloom_index", "ttr_stats", "corpus_diff",
        "bucketed_meta_join", "docs_jsonl_source",
        "events_props_extract", "routed_lang_read", "redact_pii",
        "export_manifest", "oov_rate", "bm25_topk", "dsir_weights",
        "dsir_sample", "bm25_indexed", "kmeans_assign", "kmeans_quality",
        "ann_ivf_kmeans", "retrieval_rrf", "sq_encode",
        "sq_topk", "quality_train_score", "mine_hard_negatives",
        "label_consistency", "split_leakage", "char_entropy",
        "split_leakage_planted", "multimodal_decode_real",
        "ann_ivfsq_append", "kmeans_train_distributed",
        "kmeans_scalable_init_distributed",
        "bm25_segmented").foreach(show)
    spark.stop()
  }
}
