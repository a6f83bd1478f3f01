package graft.streaming

import graft.similarity.GraphSearch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of the persisted graph-ANN index
  * ([[GraphSearch.writeIndex]]): each micro-batch of incoming query
  * vectors beam-searches the standing kNN graph — the second serving
  * family next to [[AnnServe]]'s IVFADC (graph-based and
  * quantization-based serving cover different recall/latency corners;
  * production stacks run both).
  *
  * foreachBatch is the right lift (the [[AnnServe]] reasoning):
  * serving is batch-vs-static, and per micro-batch it is EXACTLY the
  * spec'd [[GraphSearch.searchIndexed]] operator — the batch assigns
  * against the frozen centroid table, entry lookup prunes the vectors
  * scan to the batch's cells, the walk is hops × beam broadcast
  * joins against the standing edge table. Graph maintenance (new
  * corpus vectors, edge refresh via NN-descent rounds) is the OFFLINE
  * rebuild + table swap, never in-stream — the [[AnnIngestStream]] /
  * [[ClusterMaintain]] division of labor.
  */
object GraphServe {

  /** Wire a streaming frame of query vectors into per-batch top-k
    * frames. `onBatch` receives (batchId, topk) where topk is
    * [[GraphSearch.searchIndexed]]'s output for that micro-batch:
    * (q_id, rank, n_id, cos_sim). Query ids must stay disjoint from
    * corpus ids (the id-exclusion contract).
    */
  def serve(queries: DataFrame, table: String, idCol: String,
      vecCol: String, k: Int,
      cfg: GraphSearch.Config = GraphSearch.Config())(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val spark = queries.sparkSession
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        // searchIndexed persists nothing (assign + beam-walk joins
        // over the index tables) — no per-batch cache to reclaim
        onBatch(batchId, GraphSearch.searchIndexed(spark, table, batch,
          idCol, vecCol, k, cfg))
      }
    }
  }
}
