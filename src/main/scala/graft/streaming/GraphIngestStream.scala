package graft.streaming

import graft.similarity.{GraphIngest, IVFIndex}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face of [[graft.similarity.GraphIngest]] — kNN-graph
  * maintenance fed by an embedding stream: each micro-batch of new
  * vectors folds into the standing graph via the already-verified
  * incremental merge (|batch|-proportional cell pairs, frozen
  * centroids), and joins the corpus holder so later batches compare
  * against it too.
  *
  * foreachBatch is the right lift (the [[Scd2Stream]] reasoning): the
  * semantics are batch-vs-accumulated-state, and per micro-batch that
  * is EXACTLY the batch operator. Both holders re-materialize with
  * `localCheckpoint` to cut lineage — an unbounded stream would stack
  * one merge plan per batch into a single growing tree. In production
  * the holders are storage-backed tables (the graph bucketed by
  * src_id, the assigned corpus bucketed by cell — the
  * [[graft.sources.Bucketing]] layout that makes the per-batch cell
  * join co-located); the in-process holder keeps the operator
  * testable. Centroids are frozen at wiring time — re-quantization is
  * a rebuild, scheduled like one, exactly as in batch.
  */
object GraphIngestStream {

  /** Mutable corpus + graph holder — read `graph` for the current
    * top-k edges, `corpus` for the vectors it covers.
    */
  final class GraphHolder(initialCorpus: DataFrame, initialGraph: DataFrame) {
    @volatile var corpus: DataFrame = initialCorpus
    @volatile var graph: DataFrame = initialGraph
  }

  /** Wire an embedding stream into `holder` under frozen `cents`. */
  def maintain(vectors: DataFrame, holder: GraphHolder, idCol: String,
      vecCol: String, k: Int, cents: DataFrame): DataStreamWriter[Row] = {
    // previous-generation checkpoint blocks release once the next
    // generation is (eagerly) materialized — only frames THIS
    // maintainer created, never the caller's bootstrap frames
    var ownedGraph: Option[DataFrame] = None
    var ownedCorpus: Option[DataFrame] = None
    val release = org.apache.spark.sql.graft.CheckpointBridge.release _
    vectors.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        val g = GraphIngest
          .merged(holder.corpus, batch, holder.graph, idCol, vecCol, k,
            cents)
          .localCheckpoint(true)
        val c = holder.corpus
          .unionByName(batch.select(holder.corpus.columns.map(
            org.apache.spark.sql.functions.col): _*))
          .localCheckpoint(true)
        holder.graph = g
        holder.corpus = c
        ownedGraph.foreach(release); ownedGraph = Some(g)
        ownedCorpus.foreach(release); ownedCorpus = Some(c)
      }
    }
  }

  /** Convenience: build the initial holder from a corpus frame — the
    * standing graph under the corpus's frozen stride centroids.
    */
  def bootstrap(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      cfg: IVFIndex.Config = IVFIndex.Config()): (GraphHolder, DataFrame) = {
    val cents = GraphIngest.strideCentroids(corpus, idCol, vecCol,
      cfg.centroidStride)
    val graph = graft.similarity.KnnGraph
      .buildWithCentroids(corpus, idCol, vecCol, k, cents)
    (new GraphHolder(corpus, graph), cents)
  }
}
