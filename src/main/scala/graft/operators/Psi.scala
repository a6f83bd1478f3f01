package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population Stability Index — the standard binned-drift gate for a
  * numeric column between two snapshots (scorecard monitoring's
  * workhorse metric; the numeric companion to [[graft.text.Drift]]'s
  * token rates and [[ProfileDiff]]'s summary deltas):
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * with conventional thresholds ~0.1 (watch) / 0.25 (act).
  *
  * Shape for scale: each snapshot collapses to a per-bin count table
  * in ONE map-side-combined aggregate (the shuffle carries ≤ nBins
  * rows per side); the tables full-outer merge on bin; totals are
  * 1-row broadcasts. The raw tables never join anything.
  *
  * Binning is FIXED-WIDTH from explicit `lo`/`width` parameters —
  * data-derived boundaries would make the bins (and therefore every
  * rate) drift with the very distribution being monitored, which is
  * exactly what a monitoring gate must not do; values below `lo` clamp
  * to bin 0, values past the last edge clamp to bin `nBins−1`
  * (standard open-ended edge bins).
  *
  * Determinism: bin assignment is `floor((v − lo) / width)` — two IEEE
  * ops in fixed order; rates are add-one-smoothed single divisions of
  * exact integers (smoothing keeps empty bins finite, the standard PSI
  * practice); the ln term is quantized at 1e-9 per bin via floor, so
  * the per-bin contribution crossing the gate is integer-stable.
  */
object Psi {

  /** Per-bin drift table: (bin, n_a, n_b, psi_q) for all `nBins` bins
    * present in either snapshot, psi_q = floor(contribution · 1e9).
    * Sum psi_q · 1e-9 for the headline index.
    */
  def stability(snapA: DataFrame, snapB: DataFrame, valueCol: String,
      lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    def bin(v: Column): Column =
      least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0d)),
        lit((nBins - 1).toDouble)).cast("bigint")
    def counts(df: DataFrame) = df
      .filter(col(valueCol).isNotNull)
      .select(bin(col(valueCol)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val a = counts(snapA)
    val b = counts(snapB)
    val totals = a.agg(sum(col("n")).as("ta"))
      .crossJoin(b.agg(sum(col("n")).as("tb")))
    val merged = a.select(col("bin"), col("n").as("n_a"))
      .join(b.select(col("bin"), col("n").as("n_b")), Seq("bin"),
        "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(totals))
    // add-one smoothing over the bin space: p = (n+1)/(total+nBins),
    // each a single division of exact integers
    def rate(n: Column, t: Column): Column =
      (n + lit(1L)).cast("double") / (t + lit(nBins.toLong)).cast("double")
    val pa = rate(col("n_a"), col("ta"))
    val pb = rate(col("n_b"), col("tb"))
    merged.select(col("bin"), col("n_a"), col("n_b"),
      floor((pb - pa) * log(pb / pa) * 1e9d).cast("bigint").as("psi_q"))
  }
}
