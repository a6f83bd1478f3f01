package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment Pearson correlation per group — the linear-association
  * screen between two metrics (does price track quantity; does quality
  * score track document length) computed to the same determinism
  * standard as [[TrendFit]], whose moment frame it reuses verbatim:
  * x cast to integers, y fixed-pointed at 2^20, every sum and
  * cross-moment an exact DECIMAL(38,0) integer, so the three
  * correlation rationals
  *
  *   cov_num  = n·Σxy − Σx·Σy
  *   xvar_num = n·Σx² − (Σx)²
  *   yvar_num = n·Σy² − (Σy)²
  *
  * are exact and engine-portable (emitted as digit strings — the
  * TrendFit convention). r = cov/√(xvar·yvar) needs one sqrt, so it
  * leaves floor-quantized at 1e-6 with the operand order mirrored by
  * the oracle; xvar·yvar is NOT formed (it can exceed 10^38) — the
  * two square roots are taken separately.
  *
  * Distributed shape: ONE scan, ONE map-side-combined grouped
  * aggregate, shuffle = |groups| summary rows. The moment tuple is
  * exactly mergeable ([[TrendFit.moments]]' streaming contract).
  */
object Correlate {

  private val dec = "decimal(38,0)"

  /** Per-group (n, cov_num, xvar_num, yvar_num, corr_q): rationals as
    * DECIMAL(38,0) digit strings, `corr_q` = ⌊10^6·r⌋, null when
    * either variance is zero (r undefined).
    */
  def pearson(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val m = TrendFit.moments(df, groupCols, xCol, yCol)
    val cov = (col("n").cast(dec) * col("sxy")
      - col("sx").cast(dec) * col("sy_fp").cast(dec)).cast(dec)
    val xvar = (col("n").cast(dec) * col("sxx")
      - col("sx").cast(dec) * col("sx").cast(dec)).cast(dec)
    val yvar = (col("n").cast(dec) * col("syy")
      - col("sy_fp").cast(dec) * col("sy_fp").cast(dec)).cast(dec)
    m.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        cov.cast("string").as("cov_num"),
        xvar.cast("string").as("xvar_num"),
        yvar.cast("string").as("yvar_num"),
        when(xvar > 0 && yvar > 0,
          floor(lit(1000000.0d) * (cov.cast("double") /
            (sqrt(xvar.cast("double")) * sqrt(yvar.cast("double")))))
            .cast("bigint")).as("corr_q")) : _*)
  }
}
