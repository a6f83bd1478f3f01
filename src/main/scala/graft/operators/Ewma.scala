package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted daily volume — the classic recency smoother
  * (recent days dominate, history decays geometrically), built so the
  * gate can hash it: the decay is a POWER OF TWO (halving per day), so
  * every term `n_d · 2^(d − maxd)` scales an integer by an exact IEEE
  * power — no libm, and with the whole sum carried as a 2^60
  * fixed-point DECIMAL(38,0) integer there is no floating point at
  * all: the fold is order-independent by integer arithmetic, not by
  * argument. Days more than 60 behind the group's latest contribute
  * weights below 2^-60 (relative < 1e-18) and truncate identically on
  * both engines.
  *
  * Shape: the corpus-scale work is ONE map-side-combined (group, day)
  * aggregate — the same census every temporal gate here shares — then
  * a broadcast |groups|-row max-day join and a fold over at most
  * 60·|groups| summary rows. Output |groups| rows.
  */
object Ewma {

  /** Horizon in days; weights below 2^-Horizon truncate. */
  val HorizonDays = 60

  /** Per-group (day = latest day, ewma_q): the half-life-one-day EWMA
    * of daily event counts at the group's latest day, as a 2^20
    * fixed point (`ewma_q = ⌊2^20 · Σ n_d · 2^(d − maxd)⌋`).
    */
  def dailyHalfLife(df: DataFrame, groupCols: Seq[String],
      tsCol: Column): DataFrame = {
    val daily = df.select(
        groupCols.map(col) :+
          (tsCol.cast("timestamp").cast("long")).as("_secs"): _*)
      .filter(col("_secs").isNotNull)
      .withColumn("_day", expr("_secs div 86400"))
      .groupBy(groupCols.map(col) :+ col("_day"): _*)
      .agg(count(lit(1)).as("_n"))
    val latest = daily.groupBy(groupCols.map(col): _*)
      .agg(max("_day").as("_maxd"))
    daily.join(broadcast(latest), groupCols)
      .filter(col("_day") > col("_maxd") - HorizonDays)
      .select(groupCols.map(col) :+ col("_maxd") :+
        (expr(s"shiftleft(1L, CAST($HorizonDays + _day - _maxd AS INT))")
          .cast("decimal(38,0)") * col("_n").cast("decimal(38,0)"))
          .as("_term"): _*)
      .groupBy(groupCols.map(col) :+ col("_maxd"): _*)
      .agg(sum("_term").as("_num"))
      .select(groupCols.map(col) :+ col("_maxd").as("day") :+
        expr(s"CAST(_num div ${1L << (HorizonDays - 20)}L AS BIGINT)")
          .as("ewma_q"): _*)
  }
}
