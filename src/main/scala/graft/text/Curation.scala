package graft.text

import graft.dedup.{ExactDedup, MinHashLSH}
import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs, built from the family operators:
  *
  *   1. exact dedup: keep-best-row by content hash;
  *   2. score: quality + language ID in ONE projection (no join of
  *      per-feature frames — all features come from the same token
  *      array, so they belong in one pass over the scan);
  *   3. filter: keep target-language docs above a quality floor;
  *   4. near-dedup: MinHash-LSH verified pairs, drop the higher id of
  *      each pair (keep-first policy — deterministic; transitive
  *      clusters would need a connected-components pass, out of scope
  *      for a one-shot curation sweep and rarely material at the 0.8
  *      threshold).
  *
  * Dedup-before-score commutes EXACTLY with score-before-dedup (the
  * oracle computes the latter): quality and language are pure functions
  * of the text, so a text's clones all pass or all fail the filter, and
  * the min-id representative of each text group is unchanged. Dedup
  * first is chosen deliberately:
  *   - at scale, the corpus is scored once per UNIQUE text instead of
  *     once per copy — with real dup rates (30–60% of a web crawl)
  *     that's the larger term;
  *   - the window is an optimizer BARRIER for the score-derived filter.
  *     Filtered-first plans let Catalyst push the filter below the
  *     parallelizing repartition with the full quality+langid expression
  *     tree inlined (predicates duplicate through projections) — the
  *     whole lexicon scan then runs twice per row on the scan's single
  *     input split (measured ~1.5s of the query at sf0.1). Above the
  *     window, the filter evaluates post-shuffle, in parallel, once.
  */
object Curation {

  case class Config(
      minQuality: Double = 0.4,
      lang: String = "en",
      lsh: MinHashLSH.Config = MinHashLSH.Config())

  /** Kept documents: (doc_id, lang_pred, quality), ascending ids. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val uniq = ExactDedup.byTextHash(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      "text", "doc_id")
    val w = words(col("text"))
    val scores = LangId.Lexicons.map { case (l, lex) => l -> LangId.score(w, lex) }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("und")) { case ((l, s), other) =>
      when(best > 0 && s === best, lit(l)).otherwise(other)
    }
    val scored = uniq.select(col("doc_id"), col("text"),
      TextStats.qualityScore(w).as("quality"), pred.as("lang_pred"))
    // two consumers (the LSH pass and the final anti-join) — persist so
    // the scoring+window lineage runs once, not twice (at scale: a
    // staging table; here the plan-keyed cache)
    val kept = scored.filter(
        col("quality") >= cfg.minQuality && col("lang_pred") === cfg.lang)
      .persist()
    val losers = MinHashLSH
      .nearDuplicatePairs(kept, "doc_id", "text", cfg.lsh)
      .select(col("doc_b").as("doc_id")).distinct()
    kept.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality"))
  }
}
