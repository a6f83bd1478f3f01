package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Series densification: give every (group, bucket) in each group's
  * observed time span a row, zero-filling the buckets with no events —
  * the step that turns "frame over observed buckets" analytics into
  * true wall-clock semantics (a ROWS window over a dense series IS a
  * RANGE window over time).
  *
  * Shape: per-group min/max is one map-side-combined aggregate; each
  * group row then explodes into its own bucket sequence — O(total
  * buckets) rows generated where the data lives, no cross join against
  * a global calendar, no shuffle beyond the final left join back to
  * the observed counts (both sides keyed (group, bucket)).
  */
object GapFill {

  /** Dense per-(group, hour) counts over each group's [min, max] hour
    * span: (grp, bucket_ts, n), n = 0 where nothing happened.
    */
  def denseHourlyCounts(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val observed = events
      .groupBy(col(groupCol).as("grp"),
        date_trunc("hour", col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("n"))
    val spans = observed.groupBy(col("grp"))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
    val calendar = spans.select(col("grp"),
      explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("bucket_ts"))
    calendar.join(observed, Seq("grp", "bucket_ts"), "left_outer")
      .select(col("grp"), col("bucket_ts"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
