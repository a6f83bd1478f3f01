package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the stream-mode face of
  * [[graft.dedup.ExactDedup]]: drop records whose content hash was
  * already seen, with BOUNDED state.
  *
  * `dropDuplicates` on a stream keeps every key ever seen (state grows
  * forever — a non-starter for an unbounded corpus feed).
  * `dropDuplicatesWithinWatermark` instead evicts a key's state once
  * the watermark passes it: exact dedup within the lateness horizon,
  * O(keys-per-horizon) state. That's the correct contract for ingest
  * pipelines, where true duplicates arrive close together (retries,
  * replays, double-sends) and the horizon is an explicit knob.
  *
  * The dedup key is md5 of the content column — fixed-width state,
  * never the document body (same shuffle-hygiene rule as the batch
  * dedup family).
  */
object StreamDedup {

  /** First-seen rows of a watermarked streaming DataFrame, keyed by
    * md5(`contentCol`), within the watermark horizon.
    *
    * Callers apply `withWatermark(tsCol, delay)` upstream (the same
    * contract as [[Sessionize.sessions]]).
    */
  def firstSeen(stream: DataFrame, contentCol: String): DataFrame =
    stream.withColumn("__content_hash", md5(col(contentCol)))
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
