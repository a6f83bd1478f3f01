package graft.text

import graft.dedup.{ExactDedup, MinHashLSH}
import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs, built from the family operators:
  *
  *   1. score: quality + language ID in ONE projection (no join of
  *      per-feature frames — all features come from the same token
  *      array, so they belong in one pass over the scan);
  *   2. filter: keep target-language docs above a quality floor
  *      (row-level, pushed to the scan's earliest stage);
  *   3. exact dedup: keep-best-row by content hash;
  *   4. near-dedup: MinHash-LSH verified pairs, drop the higher id of
  *      each pair (keep-first policy — deterministic; transitive
  *      clusters would need a connected-components pass, out of scope
  *      for a one-shot curation sweep and rarely material at the 0.8
  *      threshold).
  *
  * Stage order matters at scale: the cheap row-local filters run FIRST
  * so the shuffling stages (dedup window, LSH joins) see only the
  * surviving fraction of the corpus.
  */
object Curation {

  case class Config(
      minQuality: Double = 0.4,
      lang: String = "en",
      lsh: MinHashLSH.Config = MinHashLSH.Config())

  /** Kept documents: (doc_id, lang_pred, quality), ascending ids. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val w = words(col(textCol))
    val scores = LangId.Lexicons.map { case (l, lex) => l -> LangId.score(w, lex) }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("und")) { case ((l, s), other) =>
      when(best > 0 && s === best, lit(l)).otherwise(other)
    }
    val scored = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      TextStats.qualityScore(w).as("quality"), pred.as("lang_pred"))
    val kept = scored.filter(
      col("quality") >= cfg.minQuality && col("lang_pred") === cfg.lang)
    // two consumers (the LSH pass and the final anti-join) — persist so
    // the scoring+window lineage runs once, not twice (at scale: a
    // staging table; here the plan-keyed cache)
    val deduped = ExactDedup.byTextHash(kept, "text", "doc_id").persist()
    val losers = MinHashLSH
      .nearDuplicatePairs(deduped, "doc_id", "text", cfg.lsh)
      .select(col("doc_b").as("doc_id")).distinct()
    deduped.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality"))
  }
}
