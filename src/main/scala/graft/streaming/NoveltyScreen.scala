package graft.streaming

import graft.text.Novelty
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of [[graft.text.Novelty]] — the ingest-time
  * marginal-value screen: each micro-batch of newly crawled documents
  * is scored for how much genuinely new content it adds over the
  * standing corpus, BEFORE it is admitted; a source whose batches'
  * novelty collapses is a crawl that has gone stale and can be cut.
  *
  * foreachBatch is the right lift (the [[IngestScreen]] reasoning):
  * the screen's semantics are batch-vs-static — shingle join against
  * the frozen first-seen index — and per micro-batch that is EXACTLY
  * the spec'd [[Novelty.screenAgainst]] batch operator, so the stream
  * face introduces no new scoring semantics. Documents within one
  * micro-batch score against the same index snapshot (each
  * independently); callers that also FOLD batches into the index via
  * [[Novelty.appendToIndex]] get the sequential semantics the batch
  * operator's spec pins.
  */
object NoveltyScreen {

  /** Wire a streaming frame of new documents into per-batch novelty
    * frames. `onBatch` receives (batchId, scores) where scores is
    * [[Novelty.screenAgainst]]'s output for that micro-batch:
    * (doc_id, n_shingles, n_new, novelty).
    */
  def screen(newDocs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        onBatch(batchId,
          Novelty.screenAgainst(index, batch, idCol, textCol, shingleSize))
    }
}
