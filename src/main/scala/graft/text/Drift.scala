package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot drift: which tokens moved between two snapshots of
  * a corpus — the distribution-level companion to the row-level diff
  * core (did the re-crawl shift the language mix? did a source vanish?).
  *
  * Shape for scale: each snapshot collapses to a per-token count table
  * map-side-combined (the shuffle carries distinct tokens, not
  * occurrences); the two tables full-outer merge on token; each 1-row
  * total broadcasts back via cross-join. The top-k movers cut runs as
  * `orderBy.limit` → TakeOrderedAndProject (per-task k-heap + driver
  * merge), so no reducer ever holds the full vocabulary.
  *
  * Determinism: rates are single divisions of exact integers; the
  * mover ordering ties-break by token.
  */
object Drift {

  /** Top-`k` tokens by absolute occurrence-rate change between
    * snapshots: (token, n_a, n_b, delta_rate), delta_rate =
    * n_b/total_b - n_a/total_a, sorted |delta_rate| desc then token.
    */
  def tokenDrift(snapA: DataFrame, snapB: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(TokenCount.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val a = counts(snapA)
    val b = counts(snapB)
    val totals = a.agg(sum(col("n")).as("ta"))
      .crossJoin(b.agg(sum(col("n")).as("tb")))
    val merged = a.select(col("token"), col("n").as("n_a"))
      .join(b.select(col("token"), col("n").as("n_b")), Seq("token"),
        "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(totals))
    merged
      .select(col("token"), col("n_a"), col("n_b"),
        (col("n_b").cast("double") / col("tb") -
          col("n_a").cast("double") / col("ta")).as("delta_rate"))
      .orderBy(abs(col("delta_rate")).desc, col("token"))
      .limit(k)
  }
}
