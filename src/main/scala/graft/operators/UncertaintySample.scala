package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uncertainty sampling — the active-learning selection step: from any
  * scored frame, the k rows whose decision score sits CLOSEST to the
  * boundary (smallest |score|), i.e. the documents a human labeler (or
  * a stronger judge model) should look at next to improve the
  * classifier fastest. Pairs with [[graft.text.NbQuality]]'s exact
  * log-odds (`logodds_q = 0` IS the decision boundary), but works over
  * any signed margin column.
  *
  * Determinism: scores are already engine-portable (the caller's
  * contract — NbQuality emits 1e-6-quantized LONGs); selection orders
  * by (|score|, id) so ties never depend on partitioning.
  *
  * Distributed shape: global order-by + limit plans as
  * TakeOrderedAndProject — each partition keeps its local top k, the
  * driver merges k·|partitions| rows; no global sort, no shuffle of
  * the corpus. The final dense rank runs on k collected-size rows.
  */
object UncertaintySample {

  /** The k most boundary-ambiguous rows: (rank, idCol, scoreCol). */
  def topUncertain(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be at least 1, got $k")
    val picked = scored
      .select(col(idCol), col(scoreCol),
        abs(col(scoreCol)).as("__unc"))
      .orderBy(col("__unc").asc, col(idCol).asc)
      .limit(k)
    picked
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__unc").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col(scoreCol))
  }
}
