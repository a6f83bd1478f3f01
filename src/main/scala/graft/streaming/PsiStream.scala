package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the PSI drift gate ([[graft.operators.Psi]]):
  * per event-time window, the fixed-width bin histogram as a NATIVE
  * windowed streaming aggregation — bin counts are exactly mergeable
  * integers, so cross-micro-batch state merges are lossless and each
  * live window's state is ≤ nBins counter rows (the CmsStream /
  * HLL-register bound). Scoring a window against the frozen REFERENCE
  * distribution is a batch concern over the emitted bins — the
  * standing-model discipline every monitor face here follows: the
  * reference never re-scans, drift alerts fire per closed window.
  */
object PsiStream {

  /** (window_start, bin, n) per live window. `lo`/`width`/`nBins`
    * must match the reference histogram's binning — fixed bins are
    * the PSI design constraint (see [[graft.operators.Psi]]).
    */
  def bins(events: DataFrame, timeCol: String, valueCol: String,
      windowDur: String, lo: Double, width: Double, nBins: Int,
      watermark: Option[String] = None): DataFrame = {
    require(width > 0 && nBins >= 2, s"bad binning: width=$width nBins=$nBins")
    val src = watermark.fold(events)(w => events.withWatermark(timeCol, w))
    val v = col(valueCol)
    val bin = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0d)),
      lit((nBins - 1).toDouble)).cast("bigint")
    src.filter(v.isNotNull)
      .select(window(col(timeCol), windowDur).as("w"), bin.as("bin"))
      .groupBy(col("w"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("bin"), col("n"))
  }

  /** Score emitted window bins against a frozen reference histogram
    * `ref` = (bin, n_a): (window_start, bin, n_a, n_b, psi_q) over
    * the FULL bin domain per window — identical arithmetic to
    * [[graft.operators.Psi.stability]] (add-one smoothing, 1e-9 floor
    * quantization), so a window's rows equal the batch gate's on the
    * same slice (spec-pinned). Bins absent from BOTH sides emit
    * psi_q = 0 explicitly: smoothing alone would give them a
    * spurious positive term whenever the two totals differ
    * (pa = 1/(ta+nBins) vs pb = 1/(tb+nBins)), diverging from the
    * batch headline, which never sees such bins at all.
    */
  def scoreAgainst(winBins: DataFrame, ref: DataFrame, nBins: Int)
      : DataFrame = {
    val totals = winBins.groupBy(col("window_start"))
      .agg(sum(col("n")).as("tb"))
    val refTot = ref.agg(sum(col("n_a")).as("ta"))
    val domain = totals
      .select(col("window_start"), col("tb"),
        explode(sequence(lit(0L), lit((nBins - 1).toLong))).as("bin"))
    // re-alias every column: `winBins` also feeds the totals branch,
    // and joining two subtrees sharing attribute ids through the
    // explode trips conflicting-reference resolution
    val fresh = winBins.select(col("window_start").as("window_start"),
      col("bin").as("bin"), col("n").as("n_b"))
    val merged = domain
      .join(broadcast(ref), Seq("bin"), "left")
      .join(fresh, Seq("window_start", "bin"), "left")
      .crossJoin(broadcast(refTot))
      .select(col("window_start"), col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("ta"), col("tb"))
    def rate(n: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      (n + lit(1L)).cast("double") / (t + lit(nBins.toLong)).cast("double")
    val pa = rate(col("n_a"), col("ta"))
    val pb = rate(col("n_b"), col("tb"))
    merged.select(col("window_start"), col("bin"), col("n_a"), col("n_b"),
      when(col("n_a") === 0L && col("n_b") === 0L, lit(0L))
        .otherwise(floor((pb - pa) * log(pb / pa) * 1e9d).cast("bigint"))
        .as("psi_q"))
  }
}
