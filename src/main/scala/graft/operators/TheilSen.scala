package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil-Sen robust trend per group: the median of all pairwise
  * slopes (y_j − y_i)/(x_j − x_i) over a group's (x, y) points —
  * the estimator that shrugs off the outlier days a crawler outage or
  * a bot burst plants in a daily-volume series, where [[TrendFit]]'s
  * OLS slope gets dragged (up to 29.3% contamination tolerance vs
  * OLS's zero).
  *
  * Exactness: inputs are integral (epoch-day x, count y), so every
  * pairwise slope is the exact rational num/den with den > 0. The
  * median is SELECTED, never averaged: rank by (num/den as one IEEE
  * division — engine-portable for exact-long operands — then num,
  * den), take the lower median; the reported slope is the chosen
  * pair's own rational plus its 1e-6-floored quantization. No sums of
  * doubles anywhere.
  *
  * 100 TB shape: the corpus-scale work is the (group, x) daily
  * aggregate the CALLER owns (one map-side-combined pass, cf.
  * [[Seasonality]]); this operator runs on that summary frame, where
  * the group-keyed pair self-join is calendar-bounded — days²/2 pairs
  * per group (a decade of daily points ≈ 6.7M pairs), so the
  * per-group rank window's single-reducer sort is bounded by the
  * CALENDAR squared, never by corpus rows. For finer-than-daily x,
  * pre-bucket x or subsample pairs upstream.
  *
  * Reference scope note: the reference engine has no temporal surface
  * — extension operator (robust companion of the `events_trend` OLS
  * monitor).
  */
object TheilSen {

  /** @param df one row per (group, x) point — x integral, y integral
    * @return groupCols ++ (n_days, n_pairs, med_num, med_den,
    *         slope_q); groups with a single point drop out (no pairs,
    *         the honest unmeasurable answer)
    */
  def fit(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column): DataFrame = {
    val pts = df.select(groupCols.map(col) :+
      xCol.cast("long").as("_x") :+ yCol.cast("long").as("_y"): _*)
    val a = pts.select(pts.columns.map(c => col(c).as(s"${c}_a")): _*)
    val joinCond = groupCols.map(g => col(s"${g}_a") === col(g))
      .reduce(_ && _) && (col("_x_a") < col("_x"))
    val pairs = a.join(pts, joinCond)
      .select(groupCols.map(col) :+
        (col("_y") - col("_y_a")).as("num") :+
        (col("_x") - col("_x_a")).as("den"): _*)
      .withColumn("_v", col("num").cast("double") / col("den"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_v"), col("num"), col("den"))
    val cw = Window.partitionBy(groupCols.map(col): _*)
    val days = pts.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_days"))
    pairs
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(cw))
      .filter(col("_rn") === expr("(n_pairs + 1) div 2"))
      .join(broadcast(days), groupCols)
      .select(groupCols.map(col) ++ Seq(col("n_days"), col("n_pairs"),
        col("num").as("med_num"), col("den").as("med_den"),
        floor(lit(1000000.0) * col("num") / col("den")).cast("long")
          .as("slope_q")): _*)
  }
}
