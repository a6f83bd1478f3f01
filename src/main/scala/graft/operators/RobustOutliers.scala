package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation) instead of mean / stddev, so a burst of bad values can't
  * drag the threshold toward itself — the screen a data pipeline runs
  * over metric streams before trusting them (mean/σ z-scores, as in
  * [[Anomaly]], break down exactly when the data is worst).
  *
  * Medians are EXACT, via the same rank-arithmetic formulation as the
  * percentile query family (`rn = ceil(0.5 * cnt)` picks the value the
  * rank lands on — a deterministic element of the sorted multiset, so
  * ties can't make engines disagree): no `percentile_approx`, whose
  * sketch internals no oracle can reproduce.
  *
  * Scale shape: every window partitions by the SAME group key, so the
  * whole computation — both rank passes, both median picks, the final
  * rollup — runs off ONE hash-partitioning exchange (plan-audited);
  * the per-group sorts are the intrinsic price of exact medians. The
  * group count is the output cardinality; groups are assumed numerous
  * relative to executors (metric names, event types). A single
  * monster group serializes onto one task — for that regime switch to
  * an approximate two-level histogram median; exactness here is what
  * buys the oracle gate.
  */
object RobustOutliers {

  /** Per-group robust summary: (group, n, med, mad, n_out) where
    * n_out counts values with `|v - med| > k * mad`. Null values are
    * excluded up front (engines disagree on null ordering inside
    * window sorts, and a null deviation is meaningless).
    */
  def summary(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("grp"))
    def medianOf(target: Column, over: Column): Column =
      max(when(row_number().over(w.orderBy(over)) ===
        ceil(lit(0.5) * col("cnt")), target)).over(w)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("v"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("med", medianOf(col("v"), col("v")))
      .withColumn("dev", abs(col("v") - col("med")))
      .withColumn("mad", medianOf(col("dev"), col("dev")))
      .groupBy(col("grp").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_out"))
  }

  /** [[summary]] for the monster-group regime: bit-identical output,
    * but NO task ever holds a whole group. Each group's rank space is
    * split into `nSub` RANGE sub-buckets (monotone in the value, off a
    * per-group extent — the [[EquiDepth]] device applied per group):
    * windows partition by (grp, sub), so a 5-billion-row group spreads
    * over `nSub` tasks; the per-(grp, sub) count frame's prefix sum
    * partitions by grp (never single-partition). The value AT a rank
    * is tie-independent — the sorted multiset's element at position
    * ceil(n/2) is unique even when row orderings inside equal values
    * are not — so no id tiebreak is needed and the result matches the
    * windowed form exactly (property-tested).
    *
    * Every one-row-per-group frame (extent, median, MAD) joins back
    * BROADCAST — an equi-join on grp would hash the whole monster
    * group onto one partition, re-creating exactly the serialization
    * this form exists to avoid (measured: 56 s vs 13 s on a single
    * 5M-row group before the fix). The broadcast bound is sound in
    * this regime: monster groups imply FEW groups — the two
    * pathologies (billions of groups, billion-row groups) cannot
    * coexist in one dataset of any ingestible size.
    *
    * Honest regime boundary (measured, local[32], one 5M-row group):
    * windowed 12.4 s, spread 28.8 s — while a group still SORTS IN ONE
    * TASK'S MEMORY, the windowed form's single sort beats the spread
    * form's extra passes, exactly as the diff core's skewResilient
    * mode loses on clean data. The spread form is insurance for the
    * regime the windowed form cannot enter at all: a group whose sort
    * spills or OOMs a task. Per-task work here stays bounded by
    * group/nSub at any group size. Sub-bucket balance is the data's
    * value distribution within each group (same caveat, per group, as
    * [[EquiDepth]]).
    */
  def summarySpread(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0, nSub: Int = 64): DataFrame = {
    require(nSub >= 1, s"nSub must be positive, got $nSub")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("v"))

    // (grp, x) -> (grp, median of x): value at per-group rank
    // ceil(cnt/2), located via sub-bucket offsets
    def medianOf(data: DataFrame, xCol: String): DataFrame = {
      val x = col(xCol)
      val ext = data.groupBy(col("grp")).agg(min(x).as("mn"),
        max(x).as("mx"), count(lit(1)).as("cnt"))
      // persisted: consumed by BOTH the offsets aggregate and the rank
      // window — without the cache each broadcast/join re-executes the
      // full upstream lineage (measured ~7 full-data passes for the
      // two-pass median; the harness clears caches between queries,
      // same contract as the curation pipeline's staged frame)
      val keyed = data.join(broadcast(ext), "grp").withColumn("sub",
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(floor((x - col("mn")) / (col("mx") - col("mn")) * nSub)
            .cast("bigint"), lit(nSub - 1L))))
        .persist()
      val offs = keyed.groupBy(col("grp"), col("sub"))
        .agg(count(lit(1)).as("n"))
        .select(col("grp"), col("sub"),
          coalesce(sum(col("n")).over(Window.partitionBy(col("grp"))
            .orderBy(col("sub"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .as("off"))
      val inSub = Window.partitionBy(col("grp"), col("sub")).orderBy(x)
      // explicit numbered repartition: a bare ENSURE_REQUIREMENTS
      // exchange here gets AQE-coalesced by BYTE size (a 5M-row group
      // is only ~40 MB post-shuffle), collapsing the window onto one
      // or two tasks — the serialization this operator exists to
      // avoid. The SORT cost, not bytes, is what must spread.
      val parts = data.sparkSession.sessionState.conf.numShufflePartitions
      keyed
        .repartition(parts, col("grp"), col("sub"))
        .withColumn("rn", row_number().over(inSub).cast("bigint"))
        .join(broadcast(offs), Seq("grp", "sub"))
        .filter(col("off") + col("rn") === ceil(lit(0.5) * col("cnt")))
        .select(col("grp"), x.as(s"med_$xCol"))
    }

    val med = medianOf(base, "v")
    val devs = base.join(broadcast(med), "grp")
      .withColumn("dev", abs(col("v") - col("med_v")))
      .persist() // two consumers: the MAD median pass + the final agg
    val mad = medianOf(devs.select(col("grp"), col("dev")), "dev")
    devs.join(broadcast(mad), "grp")
      .groupBy(col("grp").as(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("med_v")).as("med"),
        max(col("med_dev")).as("mad"),
        sum(when(col("dev") > lit(k) * col("med_dev"), 1L).otherwise(0L))
          .as("n_out"))
  }
}
