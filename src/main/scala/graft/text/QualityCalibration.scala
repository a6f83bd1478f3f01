package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-stratum percentile calibration of a quality score — the fix
  * for the cross-source threshold problem: a raw score cut (say
  * `quality >= 0.4`) keeps 90% of one source and 5% of another purely
  * because their score DISTRIBUTIONS differ, so a curation mix that
  * filters on the raw score silently reweights sources. Calibrated to
  * the within-source percentile, "keep the top 60%" means the same
  * thing everywhere.
  *
  * pct = (rank − 1) / (n − 1) ∈ [0, 1] with rank by (score, id) —
  * total order, so ties and the whole frame are deterministic; the
  * single integer division makes the doubles oracle-exact. A
  * one-document stratum reports 0 (sole member = its own minimum;
  * guarded, not divided by zero).
  *
  * Shape: one rank window + one count window, both partitioned by the
  * stratum — no global window, no shuffle beyond the stratum exchange.
  */
object QualityCalibration {

  /** Input columns pass through, plus `pct`. */
  def percentileRank(df: DataFrame, idCol: String, stratumCol: String,
      scoreCol: Column): DataFrame = {
    val byStratum = Window.partitionBy(stratumCol)
    val rank = row_number().over(
      byStratum.orderBy(scoreCol, col(idCol)))
    val n = count(lit(1)).over(byStratum)
    df.withColumn("pct",
      when(n > 1, (rank - 1).cast("double") / (n - 1))
        .otherwise(lit(0.0)))
  }
}
