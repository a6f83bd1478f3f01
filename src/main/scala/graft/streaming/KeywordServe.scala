package graft.streaming

import graft.text.Bm25
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of the persisted BM25 inverted index
  * ([[Bm25.writeIndex]]): each micro-batch of (q_id, term) keyword
  * queries is served top-k against the standing index tables — the
  * lexical sibling of [[AnnServe]], completing the streaming
  * hybrid-retrieval story (vector + keyword, both index-once
  * serve-forever).
  *
  * foreachBatch is the right lift for the same reason as AnnServe:
  * serving is batch-vs-static, and per micro-batch it is EXACTLY the
  * spec'd [[Bm25.topDocsIndexed]] operator — no corpus scan, no
  * tokenization (no Generate in the plan, per the batch spec), only
  * the scoring joins: query terms broadcast against the term-bucketed
  * postings. Index rollover is a stream restart, operationally the
  * same snapshot discipline as the ANN face.
  */
object KeywordServe {

  /** Wire a streaming frame of (q_id, term) rows into per-batch
    * top-k frames. `onBatch` receives (batchId, topDocs) where
    * topDocs is [[Bm25.topDocsIndexed]]'s output for that
    * micro-batch: (q_id, rank, doc_id, score).
    */
  def serve(queryTerms: DataFrame, table: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75)(
      onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    val spark = queryTerms.sparkSession
    queryTerms.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        // topDocsIndexed persists nothing (pure scoring joins over
        // the index tables) — no per-batch cache to reclaim
        onBatch(batchId,
          Bm25.topDocsIndexed(spark, table, batch, k, k1, b))
      }
    }
  }
}
