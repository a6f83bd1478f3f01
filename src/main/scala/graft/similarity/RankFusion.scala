package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard combiner for hybrid
  * retrieval (Cormack et al., SIGIR 2009): given two ranked result
  * lists per query, score each candidate `Σ 1/(k0 + rank)` over the
  * lists it appears in and re-rank. Rank-based fusion needs no score
  * calibration between heterogeneous retrievers (a BM25 score and a
  * cosine live on different scales; their RANKS don't).
  *
  * Determinism: a candidate has at most ONE rank per input list, so
  * the fused score is a single fixed-operand-order expression over
  * the full-outer join of the two lists (`coalesce(1/(k0+ra), 0) +
  * coalesce(1/(k0+rb), 0)`) — no floating-point aggregation, nothing
  * order-dependent, ties broken by candidate id. The oracle rebuilds
  * both input rankings and the same expression.
  *
  * Scale shape: both inputs are already top-k-per-query frames
  * (queries × k rows — broadcast-size by construction), so the fusion
  * join and its per-query window are negligible next to the
  * retrievers that feed it.
  */
object RankFusion {

  /** Fuse two (q_id, rank, n_id, …) ranked frames to the top `k` per
    * query. Output: (q_id, rank, n_id, score).
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    val aa = a.select(col("q_id"), col("n_id"), col("rank").as("ra"))
    val bb = b.select(col("q_id"), col("n_id"), col("rank").as("rb"))
    val score =
      coalesce(lit(1.0) / (lit(k0) + col("ra")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0) + col("rb")), lit(0.0))
    val w = Window.partitionBy("q_id").orderBy(desc("score"), asc("n_id"))
    aa.join(bb, Seq("q_id", "n_id"), "full_outer")
      .select(col("q_id"), col("n_id"), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "score")
  }
}
