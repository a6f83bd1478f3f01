package graft.streaming

import graft.dedup.{IncrementalDedup, MinHashLSH}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of [[IncrementalDedup]] — the ingest-time dedup
  * screen as it runs in a continuously-fed pipeline: each micro-batch
  * of newly crawled documents is screened against the standing corpus
  * and only then admitted (or quarantined).
  *
  * foreachBatch is the right lift here (same reasoning as
  * [[SnapshotDiff]]): the screen's semantics are batch-vs-static —
  * exact md5 join + LSH band join + Jaccard verify — and per
  * micro-batch that is EXACTLY the already-verified batch operator, so
  * the stream face introduces no new dedup semantics to re-prove. A
  * row-wise stream-static formulation would need a per-doc "no
  * candidate verified" reduction across the exploded band rows —
  * stateful for no benefit when the batch boundary already scopes the
  * work.
  *
  * At scale the corpus argument is the persisted staging table whose
  * md5/band-index columns are precomputed; within-batch duplicates are
  * the caller's [[StreamDedup]] (exact) pass upstream, mirroring the
  * batch contract.
  */
object IngestScreen {

  /** Wire a streaming frame of new documents into per-batch verdict
    * frames. `onBatch` receives (batchId, verdicts) where verdicts is
    * [[IncrementalDedup.verdicts]]' output for that micro-batch:
    * (doc_id, exact_dup, near_dup, keep).
    */
  def screen(newDocs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, cfg: MinHashLSH.Config = MinHashLSH.Config())(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        onBatch(batchId,
          IncrementalDedup.verdicts(corpus, batch, idCol, textCol, cfg))
    }
}
