package graft.dedup

import graft.text.TextFeatures.jaccard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-quality audit — the record-linkage textbook triple that
  * prices a blocking scheme BEFORE trusting it at corpus scale:
  *
  *   - '''reduction ratio''' (RR): what fraction of the n·(n−1)/2
  *     brute-force comparisons the blocks eliminated — the cost side;
  *   - '''pairs completeness''' (PC): what fraction of TRUE matches
  *     the blocks retained — the recall side, the number a dedup
  *     pipeline silently loses documents through when it degrades;
  *   - '''pairs quality''' (PQ): true matches per candidate — the
  *     verify-stage cost multiplier.
  *
  * Ground truth needs brute force, so PC/PQ follow the labeled-sample
  * convention: exact Jaccard over all pairs WITHIN a bounded id-prefix
  * sample (quadratic only in the sample), while RR and the candidate
  * census run on the full corpus through the same banded LSH stage the
  * production dedup uses. At 100 TB the sample stays a fixed few
  * thousand rows — the brute-force frame never grows with the corpus.
  *
  * All counts are integers; ratios leave as `div` fixed points with
  * DECIMAL(38,0) intermediates (n·(n−1)/2 overflows a long past ~4·10^9
  * docs).
  */
object BlockingEval {

  /** One-row audit: (n_docs, n_cand, n_truth, n_hit, n_cand_s,
    * rr_ppm, pc_ppm, pq_ppm). `n_cand_s` is the candidate count within
    * the sample (PQ's denominator); PC/PQ are null when their
    * denominators are empty.
    */
  def eval(docs: DataFrame, idCol: String, textCol: String,
      sampleMax: Long,
      cfg: MinHashLSH.Config = MinHashLSH.Config()): DataFrame = {
    val shingled = MinHashLSH.docShingles(docs, idCol, textCol, cfg)
      .persist()
    val cand = MinHashLSH.candidatePairs(shingled, cfg)
    val sample = shingled.filter(col("doc_id") < sampleMax)
    val sa = sample.select(col("doc_id").as("doc_a"),
      col("shingles").as("sa"))
    val sb = sample.select(col("doc_id").as("doc_b"),
      col("shingles").as("sb"))
    val uni = size(col("sa")) + size(col("sb")) -
      size(array_intersect(col("sa"), col("sb")))
    val truth = sa.join(sb, col("doc_a") < col("doc_b"))
      .filter(uni > 0 && jaccard(col("sa"), col("sb")) >= cfg.threshold)
      .select("doc_a", "doc_b")
    val candS = cand.filter(col("doc_a") < sampleMax &&
      col("doc_b") < sampleMax)
    // truth ⊆ sample², so the hit intersection needs only the
    // sample-restricted candidates — both sides stay sample-bounded
    // (semi-joining against the FULL candidate set would shuffle the
    // corpus-scale frame for an answer the filter already determines)
    val hit = truth.join(candS, Seq("doc_a", "doc_b"), "left_semi")
    ratios(docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .crossJoin(candS.agg(count(lit(1)).as("n_cand_s"))))
  }

  /** The ppm projection over a (n_docs, n_cand, n_truth, n_hit,
    * n_cand_s) counts frame — shared with the streaming monitor
    * ([[graft.streaming.BlockingMonitor.report]]) so both audit faces
    * emit the identical one-row shape.
    */
  private[graft] def ratios(counts: DataFrame): DataFrame =
    counts.select(col("n_docs"), col("n_cand"), col("n_truth"),
        col("n_hit"), col("n_cand_s"),
        expr("""CAST(1000000 -
          (CAST(n_cand AS DECIMAL(38,0)) * 1000000) div
          ((CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1)) div 2)
          AS BIGINT)""").as("rr_ppm"),
        expr("""CASE WHEN n_truth > 0 THEN
          CAST((CAST(n_hit AS DECIMAL(38,0)) * 1000000) div n_truth
          AS BIGINT) END""").as("pc_ppm"),
        expr("""CASE WHEN n_cand_s > 0 THEN
          CAST((CAST(n_hit AS DECIMAL(38,0)) * 1000000) div n_cand_s
          AS BIGINT) END""").as("pq_ppm"))
}
