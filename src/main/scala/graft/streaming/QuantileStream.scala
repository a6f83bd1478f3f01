package graft.streaming

import graft.operators.LogQuantile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the log-bucketed quantile sketch
  * ([[LogQuantile]]): per event-time window, the (grp, bucket) counts
  * as a NATIVE streaming aggregation — counts are additive, so the
  * state-store merge across micro-batches is the sketch's own merge
  * and the streamed window's sketch equals the batch sketch of the
  * same events (spec identity, not approximately). Quantile
  * extraction ([[LogQuantile.quantilesFromSketch]]) runs on the tiny
  * emitted bucket frame per trigger — latency-path work is O(buckets),
  * never O(events). State per (window, grp) is ≤ a few hundred
  * counters; the watermark bounds live windows.
  */
object QuantileStream {

  /** (window_start, grp, bucket, cnt) per live window. */
  def windowedSketch(events: DataFrame, timeCol: String, groupCol: String,
      valueCol: String, windowDur: String, scale: Int = 100,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(timeCol, w))
    src
      .select(col(timeCol), col(groupCol).as("grp"),
        round(col(valueCol) * scale).cast("bigint").as("iv"))
      .select(col(timeCol), col("grp"),
        expr(LogQuantile.bucketSql("iv")).as("bucket"))
      .groupBy(window(col(timeCol), windowDur).as("w"),
        col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("grp"),
        col("bucket"), col("cnt"))
  }
}
