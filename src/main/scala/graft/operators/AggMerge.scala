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
    * state this operator maintains. `total` is DECIMAL(38,4) — exact,
    * and the SAME type whether the table came from [[aggregate]] or a
    * [[merge]] (schema drift between the two would poison a standing
    * table on its first update). Overflow sits at 10^34, unreachable
    * for any real metric.
    */
  def aggregate(rows: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,4)")).cast("decimal(38,4)")
          .as("total"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Merge a standing aggregate table with a delta batch's aggregate
    * (both in [[aggregate]]'s shape): union the state rows and
    * re-aggregate — each field's combiner is its own aggregate (counts
    * and decimal sums add, mins/maxes fold). Keys on one side pass
    * through; NULL keys merge correctly (they are ordinary groupBy
    * groups — a null-safe full-outer join would need
    * (coalesce, isnull)-wrapped keys, which costs an extra re-shuffle
    * per side because the wrapped partitioning no longer matches the
    * aggregates'). ONE exchange total: both inputs contribute partial
    * states map-side.
    */
  def merge(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ Seq("n", "total", "vmin", "vmax")
    base.select(cols.map(col): _*)
      .unionByName(delta.select(cols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("total")).cast("decimal(38,4)").as("total"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))
  }

  /** [[aggregate]] the delta rows, then [[merge]] — the one-call form. */
  def upsert(base: DataFrame, deltaRows: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    merge(base, aggregate(deltaRows, keyCols, valueCol), keyCols)
}
