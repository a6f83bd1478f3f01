package graft.text

import graft.operators.SortedNeighborhood
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heaps'-law vocabulary-growth curve: cumulative distinct-token count
  * V(N) against cumulative token count N at k evenly-spaced corpus
  * checkpoints — the dedup/diversity audit a census reads next to the
  * Zipf fit (`text_zipf`): natural corpora grow V ≈ K·N^β with
  * β ≈ 0.4–0.6; a near-linear curve means the corpus keeps
  * introducing novel vocabulary (noisy/unnormalized text), a flat
  * early plateau means the crawl is re-reading itself (dedup debt).
  *
  * The curve needs a corpus ORDER; this uses the caller's id order
  * through [[SortedNeighborhood.globalRank]] (range exchange, no
  * single-reducer sort). Each token's contribution to V happens at
  * its FIRST-occurrence rank — one min-aggregate per token — and both
  * census columns reduce to per-checkpoint-bucket histograms +
  * cumulative sums over the k-row summary frame. All integers.
  *
  * 100 TB shape: ONE corpus rank exchange, one token-keyed
  * min-aggregate (map-side combined), one doc-keyed token-count
  * aggregate; the k-bucket frames are bounded. The rank frame
  * persists inside globalRank; callers release via
  * `catalog.clearCache()`, the family convention.
  */
object VocabGrowth {

  /** @return k rows: (checkpoint ∈ [0, k), docs_cum, tokens_cum,
    *         vocab_cum) — cumulative docs / running tokens / distinct
    *         tokens seen through the checkpoint's rank prefix
    */
  def curve(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 2, s"need at least 2 checkpoints, got $k")
    val ranked = SortedNeighborhood.globalRank(
      docs.select(col(idCol).as("_id"),
        TokenCount.tokens(col(textCol)).as("_toks")),
      Seq(col("_id")))
    val n = ranked.agg(count(lit(1)).as("_n"))
    val bucketed = ranked.crossJoin(broadcast(n))
      .withColumn("_bucket", expr(s"(rank * ${k}L) div _n"))
    val docTok = bucketed.groupBy(col("_bucket"))
      .agg(count(lit(1)).as("_docs"),
        sum(size(col("_toks")).cast("long")).as("_toks_n"))
    val firstSeen = bucketed
      .select(col("_bucket"), col("rank"), explode(col("_toks")).as("_t"))
      .groupBy(col("_t")).agg(min(col("_bucket")).as("_fb"))
      .groupBy(col("_fb").as("_bucket")).agg(count(lit(1)).as("_novel"))
    // k-row summary frame: bounded cumulative window
    val cum = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docTok
      .join(firstSeen, Seq("_bucket"), "left")
      .select(col("_bucket"),
        col("_docs"), col("_toks_n"),
        coalesce(col("_novel"), lit(0L)).as("_novel"))
      .withColumn("docs_cum", sum(col("_docs")).over(cum))
      .withColumn("tokens_cum", sum(col("_toks_n")).over(cum))
      .withColumn("vocab_cum", sum(col("_novel")).over(cum))
      .select(col("_bucket").as("checkpoint"), col("docs_cum"),
        col("tokens_cum"), col("vocab_cum"))
  }
}
