package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over bucketed event counts — the
  * monitoring query a pipeline runs over its own telemetry (ingest
  * volume per source, error rate per stage) to catch regressions.
  *
  * Determinism across engines: the windowed statistics are INTEGER
  * sums (count, Σn, Σn²) — exact in any evaluation order, immune to
  * floating-point reassociation (DuckDB computes windowed aggregates
  * with a segment tree, Spark with a running frame; integer sums make
  * that difference invisible). Doubles appear only in one fixed-form
  * final projection (two divisions, one sqrt), so the oracle hash
  * matches bit-for-bit.
  *
  * Shape for scale: ONE shuffle of the (already tiny) bucket-count
  * table; the raw events aggregate map-side-combined down to one row
  * per (group, bucket) before anything is partitioned by group. The
  * variance window is ROWS-framed over each group's ordered buckets —
  * at any corpus size the state per group is `window` longs.
  */
object Anomaly {

  /** Per-(group, hour-bucket) event count with trailing-`window`-bucket
    * mean and z-score: (group, bucket_ts, n, mean_n, z). Variance ≤ 0
    * (constant trailing counts) gives z = 0. Buckets with no events do
    * not exist as rows — the frame spans the trailing OBSERVED buckets,
    * identically in both engines.
    */
  def rollingZ(events: DataFrame, groupCol: String, tsCol: String,
      window: Int = 24): DataFrame =
    rollingZOnCounts(events
      .groupBy(col(groupCol).as("grp"),
        date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("n")), window)

  /** [[rollingZ]] over a ZERO-FILLED series ([[GapFill]]): the frame
    * becomes true trailing wall-clock hours, so a quiet gap pulls the
    * mean down and the next burst scores as the anomaly it is (the
    * sparse form silently skips empty hours).
    */
  def rollingZDense(events: DataFrame, groupCol: String, tsCol: String,
      window: Int = 24): DataFrame =
    rollingZOnCounts(
      GapFill.denseHourlyCounts(events, groupCol, tsCol), window)

  /** The scoring half, over any (grp, bucket_ts, n) bucket frame. */
  def rollingZOnCounts(buckets: DataFrame, window: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket_ts"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val stats = buckets
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
    val mean = col("s").cast("double") / col("cnt")
    val variance =
      (col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double") / col("cnt")) /
        col("cnt")
    stats.select(
      col("grp"),
      col("bucket_ts"),
      col("n").cast("bigint").as("n"),
      mean.as("mean_n"),
      when(variance > 0,
          (col("n").cast("double") - mean) / sqrt(variance))
        .otherwise(0.0).as("z"))
  }
}
