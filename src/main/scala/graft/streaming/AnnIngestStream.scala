package graft.streaming

import graft.similarity.IvfPq
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted IVFADC index — the
  * embedding-side sibling of [[IndexIngestStream]]: each micro-batch
  * of NEW vectors is coded with the FROZEN codebooks (coarse cell +
  * m PQ codes — a pure stateless projection, [[IvfPq.code]]) and
  * appended into its cells' partition directories
  * ([[IvfPq.appendToIndex]]), so the index an [[AnnServe]] query
  * stream reads stays fresh with zero retraining and zero re-coding
  * of the standing corpus. Together the two faces close the ANN
  * serving lifecycle as streams: vectors in, neighbors out, one
  * persisted model between.
  *
  * foreachBatch is the right lift (the [[IndexIngestStream]] /
  * [[Scd2Stream]] reasoning — maintenance of an external table is
  * inherently batch-vs-state). Because a row's codes depend only on
  * the frozen model and the row itself, append-then-serve ≡
  * code-the-union-up-front EXACTLY (the [[IvfPq.appendToIndex]]
  * contract, re-proved stream-shaped in StreamingSpec), and appends
  * of disjoint batches commute — the stream's arrival order never
  * changes the final index content.
  *
  * 100 TB shape: the standing corpus is never read — each batch costs
  * one projection + one partitioned append; codebook drift is handled
  * by the OFFLINE retrain + [[IvfPq.writeIndex]] swap (the
  * cluster-maintenance discipline of [[ClusterMaintain]]), never
  * in-stream.
  *
  * Delivery is AT-LEAST-ONCE under sink retries (the coded index is a
  * plain partitioned catalog table, so the append can't be stamped
  * transactionally the way [[TableSink]]'s CowTable merges are); a
  * retried batch duplicates its coded rows, which can displace a k-th
  * neighbor with a duplicate id. The heal is the same as any derived
  * index: rebuild via [[IvfPq.writeIndex]] from the vector source of
  * truth — or route the corpus through a CowTable and rebuild from
  * its exactly-once contents.
  */
object AnnIngestStream {

  /** Wire a streaming frame of (id, vector) rows into per-batch coded
    * appends under a frozen model. `onBatch` fires after each fold.
    */
  def maintain(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, table: String, model: IvfPq.Model,
      cfg: IvfPq.Config = IvfPq.Config())(
      onBatch: Long => Unit = _ => ()): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        // appendToIndex is a pure projection + partitioned append
        // (nothing persisted) — no per-batch cache to reclaim, and a
        // blanket clearCache would drop user-cached relations
        IvfPq.appendToIndex(batch, idCol, vecCol, dim, table, model, cfg)
        onBatch(batchId)
      }
    }

  /** EXACTLY-ONCE variant over the transactional table-backed index
    * ([[graft.similarity.IvfPqTable]]): each micro-batch's coded
    * append is stamped `Txn(appId, batchId)`, so a sink retry or a
    * replay from an old checkpoint no-ops instead of duplicating
    * coded rows — the delivery gap of the catalog form, closed.
    * `appId` scopes the stamps to one (feed, checkpoint) lineage — a
    * fresh checkpoint or a second maintaining query needs its own
    * appId, or its batches are swallowed as replays (the
    * [[CowTableSinkProvider]] stamp-identity contract). foreachBatch
    * writers can't derive it from the checkpoint themselves, so the
    * parameter is REQUIRED — a constant default would silently
    * swallow a fresh checkpoint's batches as replays.
    */
  def maintainTable(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, path: String, model: IvfPq.Model,
      cfg: IvfPq.Config = IvfPq.Config(),
      appId: String): DataStreamWriter[Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        // pure projection + stamped table append (nothing persisted)
        graft.similarity.IvfPqTable.append(batch.sparkSession, path,
          batch, idCol, vecCol, dim, model, cfg,
          txn = Some(graft.tables.TxLog.Txn(appId, batchId)))
      }
    }
}
