package graft.streaming

import graft.similarity.BinaryQuant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of the persisted binary-fingerprint index
  * ([[BinaryQuant.writeIndex]]): each micro-batch of incoming query
  * vectors is served top-k by Hamming screen + exact-cosine re-rank
  * against the standing coded corpus.
  *
  * foreachBatch is the right lift (the [[AnnServe]] reasoning):
  * serving is batch-vs-static, and per micro-batch it is EXACTLY the
  * spec'd [[BinaryQuant.topKIndexed]] operator — the batch side packs
  * only its own fingerprints (the planes are compile-time constants,
  * so there is not even a model to read at wiring time), the corpus
  * side's screen scan reads only (vid, code) by parquet column
  * pruning. No state, no watermark: every batch is independent.
  */
object HammingServe {

  /** Wire a streaming frame of query vectors into per-batch top-k
    * frames. `onBatch` receives (batchId, topk) where topk is
    * [[BinaryQuant.topKIndexed]]'s output for that micro-batch:
    * (q_id, rank, n_id, hamming, cos_sim).
    */
  def serve(queries: DataFrame, table: String, idCol: String,
      vecCol: String, dim: Int, bits: Int, candidates: Int, k: Int)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val spark = queries.sparkSession
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        onBatch(batchId, BinaryQuant.topKIndexed(spark, table, batch,
          idCol, vecCol, dim, bits, candidates, k))
      }
    }
  }
}
