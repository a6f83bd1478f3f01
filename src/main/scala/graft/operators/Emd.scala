package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D Earth Mover's (Wasserstein-1) distance between two snapshots
  * of a numeric column over fixed-width bins — [[Psi]]'s transport
  * companion: PSI reads per-bin rate RATIOS (log-sensitive, blind to
  * how FAR mass moved), W1 is exactly the total mass×distance of the
  * optimal transport, so a one-bin shift and a ten-bin shift of the
  * same mass — identical PSI bins apart — separate cleanly. On a line
  * with equal totals, W1 has the closed form Σ_i |CDF_a(i) − CDF_b(i)|
  * · width (Vallender 1974).
  *
  * Exactness: totals differ between snapshots, so the CDF difference
  * is kept as the cross-multiplied INTEGER `|cum_a·t_b − cum_b·t_a|`
  * per bin — no division, no doubles; the headline
  * `w1 = width · Σ terms / (t_a·t_b)` is one driver-side division
  * AFTER the gate. Same fixed-bin discipline as [[Psi]] (data-derived
  * boundaries would drift with the monitored distribution).
  *
  * Shape for scale: identical to [[Psi.stability]] — ONE map-side-
  * combined count aggregate per side (≤ nBins rows cross the
  * shuffle), full-outer bin merge, broadcast totals; the cumulative
  * window runs over the nBins-row summary frame (bounded by
  * construction). Bins absent from BOTH sides contribute their
  * running term too — the dense closed form needs every i — so the
  * bin spine is materialized from a sequence literal, not from
  * observed bins.
  */
object Emd {

  /** Per-bin transport table: (bin, n_a, n_b, cum_a, cum_b, w1_num)
    * for ALL `nBins` bins, w1_num = |cum_a·t_b − cum_b·t_a| (the last
    * bin's term is 0 by construction — both CDFs end at 1).
    * Σ w1_num · width / (t_a·t_b) is the headline W1. w1_num is a
    * product of two row counts, so it is computed in DECIMAL(38,0)
    * and emitted as a digit string (same carrier as [[TrendFit]] — a
    * long wraps past ~3·10^9 rows per snapshot, the exact bound
    * [[graft.dedup.BlockingEval]] documents).
    */
  def w1Binned(snapA: DataFrame, snapB: DataFrame, valueCol: String,
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
    val spine = snapA.sparkSession.range(0, nBins).select(col("id").as("bin"))
    val merged = spine
      .join(a.select(col("bin"), col("n").as("n_a")), Seq("bin"), "left")
      .join(b.select(col("bin"), col("n").as("n_b")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // nBins-row summary frame: the cumulative window is bounded
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cum_a", sum(col("n_a")).over(cum))
      .withColumn("cum_b", sum(col("n_b")).over(cum))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"), col("cum_a"),
        col("cum_b"),
        abs(col("cum_a").cast("decimal(38,0)") * col("tb")
            - col("cum_b").cast("decimal(38,0)") * col("ta"))
          .cast("decimal(38,0)").cast("string").as("w1_num"))
  }
}
