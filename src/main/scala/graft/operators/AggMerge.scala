package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a new batch's PARTIAL
  * aggregate into a standing aggregate table without recomputing
  * history — the daily-ingest pattern for metrics that decompose into
  * per-key mergeable states (counts, sums, mins, maxes).
  *
  * At 100 TB the point is that history is NEVER rescanned: the delta
  * batch aggregates map-side to one row per touched key, then a single
  * key-shuffle full-outer merge against the standing table (itself one
  * row per key) updates only what changed. With the standing table
  * stored bucketed by the keys, even that shuffle drops to the delta's
  * side alone.
  *
  * Decimal sums keep the merge exact and order-independent — the same
  * rule the streaming aggregates follow ([[graft.streaming.EventStream]]):
  * a double sum would drift between the incremental and recomputed
  * paths; the correctness gate proves incremental ≡ full recompute
  * hash-for-hash, which only an exact accumulator survives.
  */
object AggMerge {

  /** Per-key (n, total, vmin, vmax) over `valueCol`, the mergeable
    * state this operator maintains. `total` is DECIMAL(24,4) — exact.
    */
  def aggregate(rows: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(24,4)")).as("total"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Merge a standing aggregate table with a delta batch's aggregate
    * (both in [[aggregate]]'s shape): full-outer on the keys, states
    * combined field-wise. Keys present on one side pass through.
    */
  def merge(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val joined = base.as("b").join(delta.as("d"),
      keyCols.map(k => base(k) <=> delta(k)).reduce(_ && _), "full_outer")
    val keys = keyCols.map(k =>
      coalesce(col(s"b.$k"), col(s"d.$k")).as(k))
    joined.select(keys ++ Seq(
      (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L)))
        .as("n"),
      (coalesce(col("b.total"), lit(0).cast("decimal(24,4)")) +
        coalesce(col("d.total"), lit(0).cast("decimal(24,4)")))
        .cast("decimal(24,4)").as("total"),
      least(col("b.vmin"), col("d.vmin")).as("vmin"),
      greatest(col("b.vmax"), col("d.vmax")).as("vmax")): _*)
  }

  /** [[aggregate]] the delta rows, then [[merge]] — the one-call form. */
  def upsert(base: DataFrame, deltaRows: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    merge(base, aggregate(deltaRows, keyCols, valueCol), keyCols)
}
