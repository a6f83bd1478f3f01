package graft.streaming

import graft.operators.RecordLinkage
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of [[RecordLinkage]] — entity resolution at ingest
  * time: each micro-batch of incoming records is resolved against the
  * standing clean reference before admission (route matches to the
  * existing entity, send non-matches to a create-new-entity path).
  *
  * foreachBatch is the right lift (the [[IngestScreen]] reasoning): the
  * operator's semantics are batch-vs-static — blocked join, scored
  * candidates, per-record argmin — and per micro-batch that is EXACTLY
  * the already-verified batch operator, so the stream face introduces
  * no new matching semantics. The argmin aggregate is scoped by the
  * batch boundary; a row-wise stream-static formulation would need the
  * same reduction as unbounded streaming state for no benefit.
  *
  * At scale the reference argument is the persisted entity table (with
  * its blocking columns already projected); growing it with admitted
  * records between batches is the caller's transaction, same as the
  * corpus-index contract in [[IngestScreen]].
  */
object LinkageScreen {

  /** Wire a stream of incoming records into per-batch match frames.
    * `onBatch` receives (batchId, matches) where matches is
    * [[RecordLinkage.resolve]]'s output for that micro-batch — records
    * absent from it had no in-threshold candidate (the new-entity
    * path).
    */
  def screen(incoming: DataFrame, reference: DataFrame,
      blockCols: Seq[String], leftId: String, leftText: String,
      rightId: String, rightText: String,
      cfg: RecordLinkage.Config = RecordLinkage.Config())(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    incoming.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        onBatch(batchId, RecordLinkage.resolve(batch, reference, blockCols,
          leftId, leftText, rightId, rightText, cfg))
    }
}
