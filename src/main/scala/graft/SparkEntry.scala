package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator gets a `queries` entry; every
  * SQL-expressible one gets a matching DuckDB `oracleSql` (column names
  * aliased identically on both sides — the driver compare sorts columns
  * by name before hashing).
  */
object SparkEntry {

  /** Flagship: the core diff operator on sf0.001 orders vs a perturbed
    * copy. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    graft.diff.DataColDiff
      .diffPlan(orders, DiffQueries.perturbedOrders(orders), Seq("o_orderkey"))
      .fold(mm => throw new IllegalArgumentException(mm.message), identity)
  }

  /** One per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DiffQueries.queries ++ Relational.queries ++ DedupQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries ++
      TemporalQueries.queries ++ SketchQueries.queries ++
      ClassifierQueries.queries ++ TableQueries.queries

  /** DuckDB-runnable oracle per query key. */
  def oracleSql: Map[String, String] =
    DiffQueries.oracleSql ++ Relational.oracleSql ++ DedupQueries.oracleSql ++
      TextQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ PipelineQueries.oracleSql ++
      TemporalQueries.oracleSql ++ SketchQueries.oracleSql ++
      ClassifierQueries.oracleSql ++ TableQueries.oracleSql

  /** Headline queries timed by graft.Bench (ordered) — ONE tracked
    * number per distinct runtime plan shape, so the bench total
    * measures the engine, not the size of the query registry. Three
    * classes stay correctness-gated in `queries` without a bench slot
    * (each names its benched runtime face inline below):
    *
    *   - parameter-preset variants (the capped/Sharp MinHash configs):
    *     same plan, different knobs — their runtime IS the family's;
    *   - execution-strategy variants (bloom vs broadcast decontam,
    *     skew-mode diff, int8-screen kNN): same oracle results through
    *     an alternative physical strategy whose scale regime is
    *     documented in SURVEY — the default strategy holds the slot;
    *   - compositions of benched stages (pipeline_mix, train_triplets,
    *     eval frames): their cost is the sum of already-tracked
    *     numbers, and their GATE is the composition's row set.
    *
    * All ~130 gated queries still run under the driver's CORRECTNESS
    * sweep every round — slot policy affects timing coverage only.
    */
  def benchQueries: Seq[String] = Seq(
    // diff_flags_skew is the inner∪anti∪anti execution-strategy
    // variant of diff_flags (identical oracle; the skew regime and its
    // 2.1× hot-key stress live in SURVEY §8 / Stress) — the default
    // full-outer plan holds the diff-core slot.
    "diff_flags", "diff_colstats", "diff_rows", "diff_values",
    "profile_diff", "dq_checks", "er_match",
    // scd2_cdc is a result-identical variant feed of scd2_apply (the
    // delta ≡ snapshot identity is its gate) — correctness-gated, no
    // separate bench slot, like the MinHash parameter presets.
    "scd2_apply",
    // q_histogram (equi-width) is a bucket projection + count groupBy —
    // the q1_agg aggregate shape; q_equidepth (boundary scan + assign)
    // holds the histogram family's slot.
    "q1_agg", "q_profile", "q_equidepth", "q3_join_agg",
    "q5_region_revenue",
    "q_window_top_orders",
    // q_anomaly is the sparse-calendar subset of q_anomaly_dense
    // (dense = the same rolling-stats scan over the gap-filled
    // calendar) — the superset face holds the anomaly slot.
    "q_events_hourly", "q_anomaly_dense", "q_agg_upsert",
    // q_outliers_spread is the monster-group insurance form of
    // q_outliers (its gate IS the spread ≡ windowed identity) —
    // correctness-gated, no bench slot, like scd2_cdc / the MinHash
    // parameter presets
    "q_percentiles", "q_outliers",
    // q_setops' distinct-keyed union/intersect/except plans are the
    // dedup_exact hash-dedup + q_cust_no_orders anti-join shapes.
    "q_cust_no_orders",
    "q_pivot", "q_rollup",
    "q_asof_purchase", "q_range_clicks", "q_sessions", "q_label_join",
    "q_funnel", "q_retention", "q_transitions", "q_paths", "graph_pagerank",
    "q_json_extract",
    "q_salted_agg",
    // dedup_embed_incr composes benched stages: the bucketed band
    // screen of dedup_incremental over dedup_embed's hyperplane
    // signatures — the two component slots track its runtime.
    // train_triplets likewise: dedup_ngram's verified-pair join + the
    // md5-bucket negative sample (a pure projection + broadcast join).
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram",
    "dedup_embed", "dedup_semantic", "dedup_clusters",
    "dedup_incremental",
    // sample_epochs is the md5-coordinate projection family
    // (sample_temperature's shape with an epoch replication explode) —
    // temperature holds the family's slot.
    "sample_stratified", "sample_temperature", "shard_assign",
    "corpus_order", "quota_cap",
    // text_langid (ASCII stopword profiles) is the Latin-only subset
    // of text_langid_uni's staged script census — the superset face
    // holds the langid slot.
    "text_stats", "text_repetition", "text_langid_uni",
    "text_tokens",
    "text_fingerprint", "text_dupspans", "text_excise", "text_vocab",
    "text_heavyhitters",
    "text_pmi",
    // text_novelty is gate-only: its postings → bounded-agg → join-back
    // runtime shape is the benched text_tfidf / dedup_ngram family.
    // text_ppl_buckets holds the grouped-exact-rank (range-exchange)
    // shape's slot — no other benched query executes globalRank.
    "text_encode", "text_bpe", "text_drift", "text_lm_score",
    "text_ppl_buckets",
    // text_pack_stats is the audit aggregate OVER text_pack's benched
    // plan (one extra groupBy on its output) — pack holds the slot.
    "text_tfidf", "text_bm25", "text_normalize", "text_pack",
    // text_decontam_bloom is an execution-strategy variant of
    // text_decontam (same oracle SQL verbatim; Bloom screen + exact
    // verify vs broadcast join — the broadcast path wins until the
    // eval side outgrows broadcast, SURVEY §12). Correctness-gated, no
    // bench slot, like the MinHash parameter presets.
    "text_decontam", "text_pii", "text_chunks",
    // cms_counts: the Count-Min family's tracked number (its upsert/
    // stream faces stay gate-only)
    "kmv_distinct", "hll_distinct", "cms_counts", "quantile_sketch",
    "zorder_stats",
    // sim_ivfpq_res is the residual-encoding variant of sim_ivfpq
    // (same stage shapes, different vector under the PQ codes);
    // sim_quant is the int8-screen execution-strategy variant of
    // sim_topk (same query, screen + exact re-rank); sim_pq's
    // exhaustive ADC screen and trainer run INSIDE benched sim_ivfpq
    // (which adds the cell probe that makes the layout billion-scale);
    // sim_recall is an eval frame re-running sim_topk + sim_lsh_bucket
    // (like gate-only sim_eval). Each stays correctness-gated.
    "sim_topk", "sim_lsh_bucket", "sim_ivf",
    "sim_ivfpq", "embed_kmeans",
    // embed_cov: new plan shape — per-row d² pair explode into a
    // d²-bounded one-pass aggregate (the Gram/PCA building block)
    "embed_cov",
    // sim_knn_graph: the graph family's tracked number; nn-descent /
    // clusters / incr / recall / ivf-stats are gate-only faces of the
    // same candidate stage
    "sim_knn_graph",
    "mm_meta", "mm_frames", "mm_format_stats", "mm_decode",
    // pipeline_mix composes three benched slots end-to-end
    // (pipeline_curate → quota_cap's rank window → text_pack's prefix
    // sums); its gate pins the composition's row set.
    "pipeline_curate")
}
