package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorization — the feature-prep transform behind "clip outliers to
  * the [p01, p99] band": per group, exact discrete percentile bounds,
  * every value clipped into them, and the clipped aggregate reported
  * with exact fixed-point sums so the result hash-verifies.
  *
  * Two passes, both group-keyed:
  *   1. bounds: the `q_percentiles` rank-window shape picks the
  *      ceil(p·n)-th smallest value per group — the value at a sorted
  *      position is well-defined under ties, so the bound is
  *      deterministic. Exact by design; at unbounded group sizes the
  *      approximate path is [[LogQuantile]]'s sketch feeding the same
  *      clip join.
  *   2. clip: the per-group bounds frame (ONE row per group) joins
  *      back broadcast; clipping and the clipped-count/sum aggregate
  *      are a single map-side-combined pass — the raw table shuffles
  *      once for the rank window and once for the final aggregate,
  *      never for the join.
  *
  * Sums quantize to `round(value·scale)` integers (the [[LogQuantile]]
  * `iv` convention), so the distributed sum is exact and
  * order-independent.
  */
object Winsorize {

  /** Per-group clipped stats: (grp, n, n_clipped_lo, n_clipped_hi,
    * sum_clipped_fp) with sum_clipped_fp = Σ round(clip(v)·scale).
    */
  def clippedStats(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99, scale: Int = 100): DataFrame = {
    require(lo > 0 && hi < 1 && lo < hi, s"need 0 < lo < hi < 1, got $lo/$hi")
    val byG = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("rn", row_number().over(byG.orderBy(col(valueCol))))
      .withColumn("cnt", count(lit(1)).over(byG))
    def pick(p: Double) =
      max(when(col("rn") === ceil(lit(p) * col("cnt")), col(valueCol)))
    val bounds = ranked.groupBy(col(groupCol))
      .agg(pick(lo).as("lo_v"), pick(hi).as("hi_v"))
    val clipped = least(greatest(col(valueCol), col("lo_v")), col("hi_v"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("lo_v"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col(valueCol) > col("hi_v"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        sum(round(clipped * scale).cast("bigint")).as("sum_clipped_fp"))
  }
}
