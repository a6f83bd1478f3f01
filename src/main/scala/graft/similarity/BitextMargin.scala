package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based candidate scoring (the Artetxe & Schwenk ratio margin
  * used for bitext mining and hard-pair selection): a raw cosine is
  * re-scored RELATIVE to how similar each endpoint is to its own
  * neighborhood —
  * `margin(x, y) = cos(x, y) / (Σ_{z∈NNk(x)} cos(x,z) / 2k +
  * Σ_{z∈NNk(y)} cos(y,z) / 2k)` — so hub vectors (similar to
  * everything) stop dominating and genuinely-aligned pairs surface.
  * The standard mining step for parallel-corpus extraction and a
  * hubness-corrected hard-negative selector.
  *
  * Determinism (the hash-gate bar): per-vector neighborhood sums fold
  * the collected top-k cosines in (cos, id) sort order
  * (`aggregate(sort_array(collect_list(...)))` — bounded k-element
  * lists, never a distributed double sum), and the margin is two
  * divisions and one addition in pinned order, so every double
  * replays in the oracle.
  *
  * Distributed shape (the 100 TB audit): the neighborhood sums are
  * ONE aggregate over a kNN edge list — here built exactly
  * ([[BruteForceKNN]], the oracle-replayable form); at corpus scale
  * the same frame comes from the cell-local [[KnnGraph]] face
  * (`sim_knn_graph`), which this operator accepts verbatim via
  * [[marginsFromGraph]]. Scoring is then two broadcast-sized equi-joins
  * of the candidate pairs against the per-vector sums — cost tracks
  * candidates + graph edges, never all-pairs.
  */
object BitextMargin {

  /** Ratio margin of each query's top-k candidates, denominators from
    * exact kAvg-NN sums over the whole corpus. Output: (q_id,
    * margin_rank, n_id, cos_sim, margin).
    */
  def score(emb: DataFrame, idCol: String, vecCol: String,
      isQuery: Column => Column, k: Int, kAvg: Int): DataFrame = {
    val cands = BruteForceKNN.topK(emb, idCol, vecCol, isQuery, k)
      .select("q_id", "n_id", "cos_sim")
    val graph = BruteForceKNN.topK(emb, idCol, vecCol, _ => lit(true), kAvg)
      .select(col("q_id").as("src_id"), col("n_id"), col("cos_sim"))
    marginsFromGraph(cands, graph, kAvg)
  }

  /** Same scoring over a PRE-BUILT neighbor frame (src_id, n_id,
    * cos_sim) — e.g. [[KnnGraph.build]]'s output at corpus scale.
    */
  def marginsFromGraph(cands: DataFrame, graph: DataFrame,
      kAvg: Int): DataFrame = {
    // deterministic per-vector neighborhood sum: fold the collected
    // top-k cosines in (cos, id) order — k elements, exact replay
    val sums = graph.groupBy(col("src_id").as("id"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("cos_sim"), col("n_id")))),
        lit(0.0d),
        (s, x) => s + x.getField("cos_sim")).as("nnsum"))
    val denom = lit(2.0d * kAvg)
    val w = Window.partitionBy("q_id").orderBy(desc("margin"), asc("n_id"))
    cands
      .join(sums.select(col("id"), col("nnsum").as("sq")),
        col("q_id") === col("id")).drop("id")
      .join(sums.select(col("id"), col("nnsum").as("sn")),
        col("n_id") === col("id")).drop("id")
      .withColumn("margin",
        col("cos_sim") / (col("sq") / denom + col("sn") / denom))
      .withColumn("margin_rank", row_number().over(w))
      .select("q_id", "margin_rank", "n_id", "cos_sim", "margin")
  }
}
