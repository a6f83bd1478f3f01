package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Periodic (seasonal) profile of an event stream: how much of each
  * group's volume lands on each phase of a fixed period — the
  * classical ratio-to-overall seasonal index (the constant-trend
  * special case of ratio-to-moving-average decomposition), kept in
  * exact integer arithmetic end to end.
  *
  * Day index is `epoch_seconds div 86400` and phase is `day mod P` —
  * pure modular arithmetic, no calendar API, so the bucketing is
  * engine- and locale-independent (P = 7 gives day-of-week classes up
  * to a constant phase shift). The denominator counts CALENDAR days of
  * that phase inside the observed [min_day, max_day] span — closed
  * form, not `count(observed)` — so a group that never fires on
  * Sundays still gets the honest zero-rate denominator and sparse
  * calendars don't inflate the index (the [[GapFill]] concern, solved
  * arithmetically instead of by materializing the gap rows).
  *
  * Fixed-point outputs: `mean_ppm = 1e6·n div cal_days` (volume per
  * calendar day of the phase) and `season_ppm = (1e6·n·span) div
  * (cal_days·total)` (ratio to the group's overall daily mean; 1e6 =
  * flat) — integer div of bounded longs, bit-stable across engines
  * and partitionings, no libm.
  *
  * 100 TB shape: ONE map-side-combined (group, day) aggregate bounds
  * the first shuffle by groups × days; everything after runs on
  * summary frames (phase rollup, per-group totals broadcast back, the
  * global span as a broadcast scalar). No window, no explode.
  *
  * Reference scope note: the reference engine has no temporal surface
  * — extension operator (ingest-cadence seasonality for crawl
  * scheduling and anomaly baselines).
  */
object Seasonality {

  /** @param period phase count in days (7 = weekly)
    * @return groupCols ++ (phase, n_events, obs_days, cal_days,
    *         mean_ppm, season_ppm)
    */
  def profile(df: DataFrame, groupCols: Seq[String], tsCol: Column,
      period: Int = 7): DataFrame = {
    val days = df
      .select(groupCols.map(col) :+
        (tsCol.cast("timestamp").cast("long")).as("_secs"): _*)
      .filter(col("_secs").isNotNull)
      .withColumn("_day", expr("_secs div 86400"))
    val daily = days.groupBy(groupCols.map(col) :+ col("_day"): _*)
      .agg(count(lit(1)).as("_n"))
    profileFromDaily(daily, groupCols, "_day", "_n", period)
  }

  /** Seasonally-adjusted daily anomalies: each (group, day)'s volume
    * as a ppm ratio to its own PHASE's per-calendar-day mean — the
    * batch face of [[graft.streaming.CadenceStream]]'s latest-day
    * verdict, over every day at once. A Monday spike is judged
    * against Mondays, so weekly rhythm stops masquerading as anomaly
    * (the plain rolling z-score's known blind spot). Exact integers:
    * `ratio_ppm = 1e6·n·cal_days div phase_total`; SPIKE above
    * `hiPpm`, DROP below `loPpm`, QUIET between. Output is the
    * (groups × days) summary frame — the broadcast-joined profile is
    * groups × period rows.
    */
  def dailyAnomalies(df: DataFrame, groupCols: Seq[String], tsCol: Column,
      period: Int, loPpm: Long, hiPpm: Long): DataFrame = {
    val days = df
      .select(groupCols.map(col) :+
        (tsCol.cast("timestamp").cast("long")).as("_secs"): _*)
      .filter(col("_secs").isNotNull)
      .withColumn("_day", expr("_secs div 86400"))
    val daily = days.groupBy(groupCols.map(col) :+ col("_day"): _*)
      .agg(count(lit(1)).as("n"))
    val prof = profileFromDaily(daily, groupCols, "_day", "n", period)
      .select(groupCols.map(col) :+ col("phase") :+
        col("n_events").as("_pt") :+ col("cal_days").as("_cd"): _*)
    daily
      .withColumn("phase", col("_day") % period)
      .join(broadcast(prof), groupCols :+ "phase")
      .withColumn("ratio_ppm", expr("(1000000 * n * _cd) div _pt"))
      .withColumn("verdict",
        when(col("ratio_ppm") > hiPpm, lit("SPIKE"))
          .when(col("ratio_ppm") < loPpm, lit("DROP"))
          .otherwise(lit("QUIET")))
      .select(groupCols.map(col) ++ Seq(col("_day").as("day"), col("phase"),
        col("n"), col("ratio_ppm"), col("verdict")): _*)
  }

  /** The profile over an already-built (group, day, n) daily frame —
    * the entry the streaming face ([[graft.streaming.CadenceStream]])
    * re-runs on its folded state: daily counts are exactly mergeable
    * longs, so running profile ≡ batch profile bit-for-bit.
    */
  def profileFromDaily(daily0: DataFrame, groupCols: Seq[String],
      dayCol: String, nCol: String, period: Int = 7): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val daily = daily0.select(groupCols.map(col) :+
      col(dayCol).as("_day") :+ col(nCol).cast("long").as("_n"): _*)
    val span = daily.agg(min(col("_day")).as("_mind"),
      max(col("_day")).as("_maxd"))
    val totals = daily.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_n")).as("_total"))
    val byPhase = daily
      .withColumn("phase", col("_day") % period)
      .groupBy(groupCols.map(col) :+ col("phase"): _*)
      .agg(sum(col("_n")).as("n_events"), count(lit(1)).as("obs_days"))
    byPhase
      .join(broadcast(totals), groupCols)
      .crossJoin(broadcast(span))
      // first calendar day of this phase at or after _mind, then the
      // stride count to _maxd — closed form, exact
      .withColumn("_first",
        expr(s"_mind + (((phase - _mind % $period) % $period + $period) % $period)"))
      .withColumn("cal_days",
        when(col("_first") > col("_maxd"), lit(0L))
          .otherwise(expr(s"(_maxd - _first) div $period + 1")))
      .select(
        groupCols.map(col) ++ Seq(
          col("phase"), col("n_events"), col("obs_days"), col("cal_days"),
          expr("(1000000 * n_events) div cal_days").as("mean_ppm"),
          // n_events·span is count×days: DECIMAL(38,0) before the 1e6
          // ppm scale (a long wraps past ~9e12 count-days); `div`
          // lands back on BIGINT
          expr("""(1000000 * CAST(n_events AS DECIMAL(38,0))
                  * (_maxd - _mind + 1))
                 div (CAST(cal_days AS DECIMAL(38,0)) * _total)""")
            .as("season_ppm")): _*)
  }
}
