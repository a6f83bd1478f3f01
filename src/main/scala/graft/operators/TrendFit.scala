package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group simple linear regression (OLS trend of y on x) in exact
  * integer arithmetic — the "is this metric drifting, and how fast"
  * monitor behind funnels, quality scores, and ingest volumes: one
  * grouped aggregate emits the slope as an exact rational
  * (numerator, denominator) instead of a division, so the trend of
  * every group hash-verifies and two runs can be compared for
  * EQUALITY, not closeness.
  *
  * Exactness (the hash-gate bar): y is quantized once to
  * `floor(y · 2^20)` LONG (the [[graft.similarity.GramMatrix]] /
  * KMeans fixed-point discipline); x must already be integral (epoch
  * seconds, day index, version number). First moments (n, Σx, Σy) are
  * LONG sums; second moments (Σx², Σxy) and the closed-form pieces
  *   slope_num = n·Σxy − Σx·Σy
  *   slope_den = n·Σx² − (Σx)²      (n² · Var(x) ≥ 0)
  *   yvar_num  = n·Σy² − (Σy)²      (n² · Var(y), the drift-magnitude
  *                                   companion)
  * run in DECIMAL(38,0) — exact 128-bit integers on both engines —
  * and cross the gate as digit strings (a float64 carrier corrupts
  * past 2^53). slope = slope_num / slope_den is the caller's one
  * driver-side division; slope_den = 0 (single x value) is the
  * honest "no trend measurable" signal rather than a NaN.
  *
  * Overflow bounds (documented): with |x| ≤ X and |y_fp| ≤ Y per row,
  * Σxy ≤ n·X·Y and slope_num ≤ n²·X·Y must stay under 10^38 — epoch
  * seconds (X ≈ 2^31) and 2^20-scaled metrics (Y ≈ 2^40 worst case)
  * leave headroom to n ≈ 10^8 rows PER GROUP even uncentered; pass a
  * baseline-relative x (epoch minus a constant) to push that to
  * n ≈ 10^12. The aggregate is map-side combinable and the moment
  * tuple is exactly mergeable across shards ([[AggMerge]] style).
  *
  * Distributed shape (the 100 TB audit): ONE scan, ONE grouped
  * aggregate, shuffle = |groups| bounded summary rows after map-side
  * combine. No window, no join, no second pass — the trend of every
  * source/type/shard of a 100 TB corpus is one job.
  *
  * Reference scope note: the reference
  * (jasjyotsinghjaswal/pyspark-datacol-diff) has no regression
  * surface — extension operator for the pipeline-observability north
  * star (metric drift direction + rate per group).
  */
object TrendFit {

  /** Fixed-point scale for y: 2^20. */
  val Scale: Long = 1L << 20

  private val dec = "decimal(38,0)"

  /** The exactly-mergeable moment frame per group: (groupCols, n, sx,
    * sy_fp, sxy, sxx, syy) with the second moments as DECIMAL(38,0) —
    * the state [[graft.streaming.TrendStream]] folds across
    * micro-batches (integer sums add in any order).
    */
  def moments(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val prepared = df.select(
      groupCols.map(col) :+
        xCol.cast("long").as("x") :+
        floor(yCol.cast("double") * Scale).cast("long").as("y") : _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
    prepared
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy_fp"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
  }

  /** Exact OLS moments and slope rational per group.
    *
    * @param xCol integral column (epoch seconds, day index, …)
    * @param yCol numeric column, quantized to floor(y·2^20)
    * @return groupCols ++ (n, sx, sy_fp, slope_num, slope_den,
    *         yvar_num) — the rationals as DECIMAL(38,0) digit strings
    */
  def fit(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    moments(df, groupCols, xCol, yCol)
      .select(
        groupCols.map(col) ++ Seq(
          col("n"),
          col("sx"),
          col("sy_fp"),
          (col("n").cast(dec) * col("sxy")
            - col("sx").cast(dec) * col("sy_fp").cast(dec))
            .cast(dec).cast("string").as("slope_num"),
          (col("n").cast(dec) * col("sxx")
            - col("sx").cast(dec) * col("sx").cast(dec))
            .cast(dec).cast("string").as("slope_den"),
          (col("n").cast(dec) * col("syy")
            - col("sy_fp").cast(dec) * col("sy_fp").cast(dec))
            .cast(dec).cast("string").as("yvar_num")) : _*)
  }
}
