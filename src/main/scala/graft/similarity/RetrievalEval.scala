package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics of a retriever against an exact truth
  * ranking — the eval harness the similarity family reports itself
  * with ([[Recall]] generalized beyond recall): per query,
  *
  *   - `hits`      |approx top-k ∩ truth top-k| (integer),
  *   - `precision` hits / k,
  *   - `recall`    hits / |truth top-k| (differs from precision when
  *                 truth has fewer than k rows — small corpora, heavy
  *                 filters),
  *   - `rr`        1 / (first approx rank that is a truth member); 0
  *                 when nothing relevant surfaced (the MRR summand).
  *
  * Every metric is rational over integers — single IEEE divisions, no
  * logs — so the whole eval frame hash-verifies cross-engine (the
  * [[graft.text.TfIdf]] / Bm25 determinism discipline; nDCG's
  * irrational log discount is deliberately OUT of the gate surface).
  *
  * Shape: one truth-set join (both sides pre-cut to top-k — query ×
  * k rows, never corpus scale) and one grouped aggregate; `min(rank)
  * FILTER (matched)` gives the first-relevant rank in the same pass.
  */
object RetrievalEval {

  /** Both inputs in the kNN operators' (q_id, rank, n_id, …) shape;
    * output (q_id, hits, precision, recall, rr) for every query
    * PRESENT IN TRUTH (a retriever returning nothing still scores 0s
    * rather than vanishing).
    */
  def metrics(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val t = truth.filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id").as("a_id"))
    val tn = t.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
    // left join FROM truth-counts through approx: queries the
    // retriever dropped entirely keep a row (hits = 0, rr = 0)
    val matched = a.join(t.withColumn("hit", lit(1)),
        a("q_id") === t("q_id") && col("a_id") === col("n_id"), "left_outer")
      .select(a("q_id").as("qq"), col("rank"), col("hit"))
    val perQ = matched.groupBy(col("qq"))
      .agg(count(col("hit")).as("hits"),
        min(when(col("hit") === 1, col("rank"))).as("first_rel"))
    tn.join(perQ, tn("q_id") === perQ("qq"), "left_outer")
      .select(tn("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / k).as("precision"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_truth"))
          .as("recall"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"))
  }
}
