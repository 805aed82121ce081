package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[Queries]]; DuckDB oracles in [[Oracles]]. */
object SparkEntry {

  /** Flagship: the full 3-stage record linkage (blocking → scoring →
    * clustering) on deterministic fixture pages; returns non-singleton
    * cluster assignments (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.fixtures.Fixture.pages(spark, 1000).toDF()
    graft.pipeline.Linkage.runLight(spark, pages)
      .where(col("url") =!= col("cluster_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> Queries.q01_scan_filter_project,
    "q02_group_agg" -> Queries.q02_group_agg,
    "q03_join_agg" -> Queries.q03_join_agg,
    "q04_broadcast_dims" -> Queries.q04_broadcast_dims,
    "q05_anti_join" -> Queries.q05_anti_join,
    "q06_semi_join" -> Queries.q06_semi_join,
    "q07_window_topk" -> Queries.q07_window_topk,
    "q08_union_dedup" -> Queries.q08_union_dedup,
    "q09_self_join" -> Queries.q09_self_join,
    "q10_null_fill" -> Queries.q10_null_fill,
    "q11_string_funcs" -> Queries.q11_string_funcs,
    "q12_time_buckets" -> Queries.q12_time_buckets,
    "q13_json_extract" -> Queries.q13_json_extract,
    "q14_numeric_sims" -> Queries.q14_numeric_sims,
    "q15_str_to_num" -> Queries.q15_str_to_num,
    "q16_token_cap" -> Queries.q16_token_cap,
    "q17_doc_frequency" -> Queries.q17_doc_frequency,
    "q18_distinct_stats" -> Queries.q18_distinct_stats,
    "q19_hash_split" -> Queries.q19_hash_split,
    "q20_dedup_exact" -> Queries.q20_dedup_exact,
    "q21_ngram_jaccard" -> Queries.q21_ngram_jaccard,
    "q22_minhash_dedup" -> Queries.q22_minhash_dedup,
    "q23_simhash_neardup" -> Queries.q23_simhash_neardup,
    "q24_ann_brute" -> Queries.q24_ann_brute,
    "q25_embedding_neardup" -> Queries.q25_embedding_neardup,
    "q26_ann_lsh" -> Queries.q26_ann_lsh,
    "q27_langid" -> Queries.q27_langid,
    "q28_quality" -> Queries.q28_quality,
    "q29_fingerprint" -> Queries.q29_fingerprint,
    "q30_multimodal" -> Queries.q30_multimodal,
    "q31_sessionize" -> Queries.q31_sessionize,
    "q32_topk" -> Queries.q32_topk,
    "q33_vector_norms" -> Queries.q33_vector_norms,
    "q34_eval_counts" -> Queries.q34_eval_counts,
    "q35_repetition" -> Queries.q35_repetition,
    "q36_shingle_novelty" -> Queries.q36_shingle_novelty,
    "q40_er_clusters" -> Queries.q40_er_clusters,
    "q41_two_table" -> Queries.q41_two_table,
    "q42_two_table_incremental" -> Queries.q42_two_table_incremental,
    "q43_embedding_artifact" -> Queries.q43_embedding_artifact,
    "q44_media_profile" -> Queries.q44_media_profile
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (custom-hash
    * LSH, stubbed multimodal kernel, iterative connected components) →
    * rows-only check; their semantics are covered by ScalaTest suites. */
  def oracleSql: Map[String, String] = Oracles.sql
}
