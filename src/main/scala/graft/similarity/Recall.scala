package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall measurement for approximate nearest-neighbor results — the
  * metric that decides whether an ANN index's speedup is worth its
  * misses, computed as a distributed join (no per-query driver loops).
  */
object Recall {

  /** Per-query and overall recall@k of `approx` against `exact`, both
    * in the (q_id, rank, n_id, cos_sim) shape produced by the kNN
    * operators. Overall recall = matched pairs / exact pairs (micro
    * average).
    */
  def atK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.filter(col("rank") <= k).select(col("q_id"), col("n_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("q_id"), col("n_id").as("a_id"))
    e.join(a, e("q_id") === a("q_id") && col("n_id") === col("a_id"),
        "left_outer")
      .groupBy(e("q_id").as("q"))
      .agg((count(col("a_id")).cast("double") / count(lit(1))).as("recall"))
      .orderBy("q")
  }

  /** Single overall recall@k number (collects one row). */
  def overallAtK(exact: DataFrame, approx: DataFrame, k: Int): Double = {
    val e = exact.filter(col("rank") <= k).select(col("q_id"), col("n_id"))
    val a = approx.filter(col("rank") <= k)
      .select(col("q_id"), col("n_id").as("a_id"))
    val row = e.join(a, e("q_id") === a("q_id") && col("n_id") === col("a_id"),
        "left_outer")
      .agg(count(col("a_id")).cast("double") / count(lit(1))).head()
    row.getDouble(0)
  }
}
