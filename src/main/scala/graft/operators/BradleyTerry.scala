package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bradley-Terry strength estimation from pairwise outcomes — the
  * arena-leaderboard / RLHF-preference-aggregation operator: given
  * win/loss counts between entities (models in a chatbot arena,
  * annotators in an agreement audit, suppliers in a price tournament),
  * estimate each entity's latent strength `s_i` such that
  * P(i beats j) = s_i / (s_i + s_j). Estimated by the classic MM
  * (minorization-maximization, Zermelo 1929 / Hunter 2004) fixed
  * point:
  *
  *   s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j),   then normalize Σs = 1
  *
  * with W_i = total wins of i and n_ij = games between i and j.
  *
  * Scale shape: the DATA-scale stage is building the pairwise summary
  * (for the gate fixture: a part-keyed self-join of per-(part,
  * supplier) minimum unit prices — fanout per part is the squared
  * per-part supplier count, the blocking-bounded shape); the MM loop
  * itself runs on the (entity × entity) game summary, which is
  * bounded by the ENTITY count, not the data (arenas rank hundreds of
  * models, not billions) — so, exactly like the k-means codebook
  * collect, the summary collects to the driver and iterates there,
  * while the corpus never leaves the cluster.
  *
  * Determinism (the gate hashes RAW doubles — no quantization
  * needed): the update uses only +, /, IEEE-exact given identical
  * fold order, and there is no libm call anywhere; denominators fold
  * over opponents in ascending id order and the normalizing total in
  * ascending id order, which the oracle replays with ordered
  * `list_reduce`.
  */
object BradleyTerry {

  /** Pairwise game summary from a generic outcomes frame:
    * `outcomes` = (winner, loser) one row per game. Returns
    * (a, b, games, wins_a) with a < b.
    */
  def games(outcomes: DataFrame, winnerCol: String, loserCol: String)
      : DataFrame = {
    val w = col(winnerCol); val l = col(loserCol)
    outcomes
      .select(least(w, l).as("a"), greatest(w, l).as("b"),
        when(w < l, 1L).otherwise(0L).as("__wa"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("games"), sum(col("__wa")).as("wins_a"))
  }

  /** MM fixed point over a (a, b, games, wins_a) summary; `iters`
    * fixed iterations from the uniform start. Output: (id, n_games,
    * n_wins, strength), strengths summing to 1.
    */
  def strengths(spark: SparkSession, summary: DataFrame, iters: Int = 8)
      : DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    // bounded-entity contract: the summary is entity²-bounded — the
    // k-means-codebook class of driver collect, not a data-scale one
    val rows = summary.select(col("a").cast("long"), col("b").cast("long"),
        col("games").cast("long"), col("wins_a").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val wins = ids.map(i => i -> 0L).to(collection.mutable.Map)
    val played = ids.map(i => i -> 0L).to(collection.mutable.Map)
    // opponents in ascending id order per entity — the fold order the
    // oracle replays
    val opp = ids.map(i => i -> collection.mutable.ArrayBuffer
      .empty[(Long, Long)]).toMap
    rows.foreach { case (a, b, n, wa) =>
      wins(a) += wa; wins(b) += n - wa
      played(a) += n; played(b) += n
      opp(a) += ((b, n)); opp(b) += ((a, n))
    }
    val oppSorted = ids.map(i => i -> opp(i).sortBy(_._1).toArray).toMap
    var s = ids.map(i => i -> 1.0 / ids.length).toMap
    for (_ <- 1 to iters) {
      val updated = ids.map { i =>
        var denom = 0.0
        oppSorted(i).foreach { case (j, n) =>
          denom += n.toDouble / (s(i) + s(j))
        }
        i -> (if (denom > 0.0) wins(i).toDouble / denom else 0.0)
      }.toMap
      var total = 0.0
      ids.foreach(i => total += updated(i)) // ascending-id fold
      s = ids.map(i => i -> updated(i) / total).toMap
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.map(i => org.apache.spark.sql.Row(i, played(i), wins(i), s(i)))
          .toSeq, 1),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("n_games", LongType, nullable = false),
        StructField("n_wins", LongType, nullable = false),
        StructField("strength", DoubleType, nullable = false))))
  }
}
