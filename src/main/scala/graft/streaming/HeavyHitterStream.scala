package graft.streaming

import graft.expressions.MisraGries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the heavy-hitters family
  * ([[graft.operators.HeavyHitters]]): a per-window Misra-Gries
  * candidate tracker over an event stream.
  *
  * A stream cannot run the batch operator's exact verify pass (there
  * is no re-scan), so the streaming face is HONESTLY the first pass
  * alone: per event-time window it maintains the MG sketch as native
  * streaming-aggregation state (the [[MisraGries]] buffer serializes
  * into the state store like any typed aggregate — merges across
  * micro-batches are the same lossless-guarantee merges the batch
  * partial aggregation does) and emits the surviving candidates with
  * their residual lower-bound counts. The deficit guarantee
  * (c(x) − n_w/(k+1) ≤ c̃(x) ≤ c(x), n_w = the window's event count)
  * holds whatever the micro-batch cut points, so the emitted set is a
  * superset of every item with window share > 1/(k+1); a downstream
  * batch job over the archived window verifies exactly (or the lower
  * bounds are used as-is for alerting). State per window is ≤ k
  * counters — bounded regardless of stream cardinality; the watermark
  * bounds how many windows are live.
  */
object HeavyHitterStream {

  /** (window_start, item, lower_bound) per live window — `update`
    * output mode downstream; `lower_bound` only ever undercounts.
    */
  def candidates(events: DataFrame, timeCol: String, itemCol: String,
      k: Int, windowDur: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(timeCol, w))
    src
      .groupBy(window(col(timeCol), windowDur).as("w"))
      .agg(MisraGries(col(itemCol), k).as("sk"))
      .select(col("w.start").as("window_start"), explode(col("sk")))
      .withColumnRenamed("key", "item")
      .withColumnRenamed("value", "lower_bound")
  }
}
