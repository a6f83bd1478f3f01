package graft.streaming

import graft.operators.SymDeleteJoin
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of [[graft.operators.SymDeleteJoin]] — typo-tolerant
  * entity lookup at ingest time WITHOUT blocking columns: each
  * micro-batch resolves against the [[SymDeleteJoin.writeIndex]]-
  * persisted variant index (bucketed by variant, so the reference side
  * never re-shuffles per batch — the recurring-probe contract
  * plan-spec'd in SymDeleteIndexSpec). The hatch [[LinkageScreen]]
  * can't offer when the blocking columns themselves arrive dirty.
  *
  * foreachBatch is the right lift (the [[IngestScreen]] reasoning):
  * per micro-batch this is EXACTLY the verified batch operator —
  * variant explode on the batch side only, postings equi-join,
  * levenshtein verify, per-record argmin scoped by the batch
  * boundary. Growing the index with admitted records between batches
  * is the caller's transaction, same as the corpus-index contract.
  */
object FuzzyLookupStream {

  /** Wire an incoming key stream into per-batch match frames.
    * `onBatch` receives (batchId, matches) where matches is
    * [[SymDeleteJoin.resolveIndexed]]'s output for that micro-batch —
    * records absent from it had no within-d candidate (the
    * new-entity path). `d` must match the index's.
    */
  def screen(spark: SparkSession, incoming: DataFrame, indexTable: String,
      leftId: String, leftText: String, d: Int)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    incoming.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        onBatch(batchId, SymDeleteJoin.resolveIndexed(spark, indexTable,
          batch, leftId, leftText, d))
    }
}
