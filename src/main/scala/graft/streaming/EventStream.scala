package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation, written ONCE for both batch and
  * streaming inputs — the core Structured Streaming promise: the same
  * declarative plan runs as a batch job over history and incrementally
  * over a stream, so backfill and live paths can't drift apart.
  *
  * On a stream, pass a watermark: state for windows older than the
  * watermark is dropped (bounded memory at scale) and later-than-
  * watermark events are discarded — the standard correctness/liveness
  * trade. The sum goes through DECIMAL so it is exact and
  * order/retry-independent (a double sum would drift across retries).
  */
object EventStream {

  /** Tumbling event-time windows per event_type.
    *
    * @param events    batch OR streaming frame with (ts, event_type, value)
    * @param window    window width, e.g. "1 hour"
    * @param watermark max lateness, e.g. Some("2 hours") on streams
    */
  def windowedCounts(events: DataFrame, windowWidth: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), windowWidth), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(24,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }
}
