package graft.similarity

import graft.similarity.Cosine._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) —
  * diversity-aware top-k: from each query's candidate pool, greedily
  * select k items maximizing `λ·rel(c) − (1−λ)·max_{s∈sel} sim(c, s)`,
  * so near-duplicate candidates cannot crowd the result list. The
  * re-rank face that turns any ANN index into a diversified retriever
  * — and, pointed at a training corpus, the "pick k SPREAD exemplars
  * per cluster" sampler (relevance = centrality, diversity = coverage).
  *
  * Determinism (the hash-gate bar): candidates come from
  * [[BruteForceKNN.topK]]'s exact fold; every pairwise sim reuses the
  * same left-fold cosine with (candidate, selected) operand order; the
  * MMR score is two IEEE-exact ops (`λ·rel − (1−λ)·maxsim` with
  * literal λ); maxsim is an exact MAX; every argmax tie-breaks
  * (score DESC, n_id ASC). The oracle unrolls the k greedy rounds
  * CTE-for-CTE like `sim_graph_search` / `sim_graph_kcore`.
  *
  * Distributed shape (the 100 TB audit): candidate generation is the
  * ANN serving face and carries all the corpus-scale cost; the MMR
  * fold never touches the corpus again. Each of the k−1 rounds joins
  * the remaining candidates (|Q|·candK rows) to the selected set
  * (≤ |Q|·k rows) on q_id — work is |Q|·candK·k pair sims TOTAL,
  * independent of corpus size, shuffling only candidate-pool-sized
  * frames. Per-query state never leaves its q_id group, so the loop
  * scales with query count exactly like the serving joins it follows.
  */
object Mmr {

  /** Diversified top-k over an embedding corpus: brute-force candK
    * candidates per query (the exact baseline face), then k greedy MMR
    * picks. Output: (q_id, pick, n_id, rel, score) where pick = 1..k
    * in selection order; for pick 1, score = rel (pure relevance seeds
    * the list).
    */
  def diversify(vectors: DataFrame, idCol: String, vecCol: String,
      isQuery: Column => Column, candK: Int, k: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && candK >= k, s"need candK >= k >= 1, got ($candK, $k)")
    val prepared = vectors
      .select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val cands = BruteForceKNN
      .topK(vectors, idCol, vecCol, isQuery, candK)
      .join(prepared, col("n_id") === col("vid"))
      .select(col("q_id"), col("n_id"), col("cos_sim").as("rel"),
        col("v"), col("nrm"))
    rerank(cands, k, lambda)
  }

  /** MMR greedy selection over a prepared candidate pool
    * (q_id, n_id, rel, v, nrm) — candK rows per query from any
    * retriever. k−1 bounded rounds of anti-join / argmax; see class
    * doc for the scale argument.
    */
  def rerank(cands: DataFrame, k: Int, lambda: Double = 0.5): DataFrame = {
    val pool = cands.localCheckpoint() // k rounds re-read the pool
    def argmax(scored: DataFrame): DataFrame =
      scored.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("q_id").orderBy(desc("score"), asc("n_id"))))
        .filter(col("rn") === 1)
        .select("q_id", "n_id", "rel", "score")

    var selected = argmax(pool.select(col("q_id"), col("n_id"), col("rel"),
        col("rel").as("score")))
      .withColumn("pick", lit(1))
    for (p <- 2 to k) {
      val selVec = selected.join(pool, Seq("q_id", "n_id"))
        .select(col("q_id"), col("n_id").as("s_id"),
          col("v").as("sv"), col("nrm").as("sn"))
      val remaining = pool.join(selected.select("q_id", "n_id"),
        Seq("q_id", "n_id"), "left_anti")
      val scored = remaining.join(selVec, "q_id")
        .select(col("q_id"), col("n_id"), col("rel"),
          cosineWithNorms(dot(col("v"), col("sv")), col("nrm"), col("sn"))
            .as("s"))
        .groupBy("q_id", "n_id", "rel")
        .agg(max("s").as("maxsim"))
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0d - lambda) * col("maxsim"))
      selected = selected.unionByName(
        argmax(scored).withColumn("pick", lit(p)))
        .localCheckpoint() // cut the per-round lineage growth
    }
    selected.select("q_id", "pick", "n_id", "rel", "score")
  }
}
