package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the LABEL JOIN of a
  * training-data pipeline: pair each impression/click with the
  * conversions that follow it within a horizon, while both sides are
  * still flowing.
  *
  * This is Spark's native watermarked stream-stream join (no custom
  * state): the time-bound condition `rightTime ∈ [leftTime, leftTime +
  * horizon]` plus watermarks on BOTH inputs let the state store evict —
  * a left row older than (watermark − horizon) can never match a
  * future right row and vice versa, so state is O(events within
  * horizon + watermark slack) per key-partition, not O(stream
  * history). That bounded-state shape is what makes the operator safe
  * on an unbounded 100 TB/day stream; the batch face of the same
  * semantics is [[graft.operators.RangeJoin]] (bucketed equi-join) and
  * the same function applied to batch frames (spec-verified equal).
  */
object StreamJoin {

  /** Inner interval join: left rows paired with right rows of the same
    * `key` whose `rightTime` lies within `[leftTime, leftTime +
    * horizon]` (inclusive). Streaming callers watermark BOTH inputs
    * first (required for state eviction); applied to batch frames it
    * computes the identical relation.
    *
    * Output columns are `l.*` then `r.*` — disambiguate shared names
    * through the `l`/`r` aliases.
    *
    * @param horizon a SQL interval body, e.g. "1 HOUR"
    */
  def withinHorizon(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, horizon: String): DataFrame =
    left.alias("l").join(right.alias("r"),
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime") + expr(s"INTERVAL $horizon"))
}
