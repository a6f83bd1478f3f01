package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) instead of mean / stddev, so a burst of bad values can't
  * drag the threshold toward itself — the screen a data pipeline runs
  * over metric streams before trusting them (mean/σ z-scores, as in
  * [[Anomaly]], break down exactly when the data is worst).
  *
  * Medians are EXACT, via the same rank-arithmetic formulation as the
  * percentile query family (`rn = ceil(0.5 * cnt)` picks the value the
  * rank lands on — a deterministic element of the sorted multiset, so
  * ties can't make engines disagree): no `percentile_approx`, whose
  * sketch internals no oracle can reproduce.
  *
  * Scale shape: every window partitions by the SAME group key, so the
  * whole computation — both rank passes, both median picks, the final
  * rollup — runs off ONE hash-partitioning exchange (plan-audited);
  * the per-group sorts are the intrinsic price of exact medians. The
  * group count is the output cardinality; groups are assumed numerous
  * relative to executors (metric names, event types). A single
  * monster group serializes onto one task — for that regime switch to
  * an approximate two-level histogram median; exactness here is what
  * buys the oracle gate.
  */
object RobustOutliers {

  /** Per-group robust summary: (group, n, med, mad, n_out) where
    * n_out counts values with `|v - med| > k * mad`. Null values are
    * excluded up front (engines disagree on null ordering inside
    * window sorts, and a null deviation is meaningless).
    */
  def summary(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("grp"))
    def medianOf(target: Column, over: Column): Column =
      max(when(row_number().over(w.orderBy(over)) ===
        ceil(lit(0.5) * col("cnt")), target)).over(w)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("v"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("med", medianOf(col("v"), col("v")))
      .withColumn("dev", abs(col("v") - col("med")))
      .withColumn("mad", medianOf(col("dev"), col("dev")))
      .groupBy(col("grp").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_out"))
  }
}
