package graft.streaming

import graft.operators.CountMin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the Count-Min sketch
  * ([[graft.operators.CountMin]]): per event-time window, the sketch's
  * (r, bucket) cells as a NATIVE windowed streaming aggregation.
  *
  * The sketch is exactly mergeable (cell-wise sum —
  * property-tested in CountMinProps), so cross-micro-batch state-store
  * merges are lossless by construction: after any sequence of batches
  * the emitted cells equal the batch operator's cells over the
  * concatenated stream, and point estimates served from them are the
  * batch estimates. State per live window is ≤ depth×width counter
  * rows — bounded regardless of stream cardinality (the heavy-hitter
  * face bounds candidates; this face bounds ESTIMATE error, answering
  * "how often did THIS item occur in that window" for arbitrary
  * later probes without having stored any item). The watermark bounds
  * how many windows are live.
  *
  * Probing stays a batch concern: join a window's emitted cells with
  * [[CountMin.estimates]] — the cells frame here is exactly the
  * `sketchCells` shape it expects.
  */
object CmsStream {

  /** (window_start, r, bucket, cnt) per live window — `update` or
    * `complete` output mode downstream.
    */
  def cells(events: DataFrame, timeCol: String, itemCol: String,
      windowDur: String, cfg: CountMin.Config = CountMin.Config(),
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(timeCol, w))
    src
      .select(window(col(timeCol), windowDur).as("w"),
        CountMin.cellKeys(itemCol, cfg).as("rb"))
      .groupBy(col("w"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"),
        col("r"), col("bucket"), col("cnt"))
  }
}
