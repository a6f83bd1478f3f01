package graft.streaming

import graft.SparkTestSession
import graft.similarity.KnnGraph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Graph-ingest streaming face: after any sequence of micro-batches the
  * maintained graph must equal a from-scratch rebuild over everything
  * seen, under the frozen bootstrap centroids — including edges
  * BETWEEN vectors of different batches.
  */
class GraphIngestStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def edges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.orderBy("src_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("maintained graph == rebuild over all batches (frozen centroids)") {
    val corpus = Seq(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f), 3L -> Seq(0f, 0.95f, 0.05f))
      .toDF("vec_id", "embedding")
    val (holder, cents) = GraphIngestStream.bootstrap(
      corpus, "vec_id", "embedding", k = 2,
      graft.similarity.IVFIndex.Config(centroidStride = 2))

    // batch 2's vector 21 is nearest batch 1's vector 10 — the
    // cross-batch edge only exists if later batches see earlier ones
    val b1 = Seq(10L -> Seq(0.95f, 0.05f, 0f))
    val b2 = Seq(21L -> Seq(0.94f, 0.06f, 0f))

    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = GraphIngestStream.maintain(
        stream.toDF().toDF("vec_id", "embedding"), holder,
        "vec_id", "embedding", 2, cents)
      .start()
    try {
      Seq(b1, b2).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val all = corpus.unionByName(
      (b1 ++ b2).toDF("vec_id", "embedding"))
    val rebuilt = KnnGraph.buildWithCentroids(all, "vec_id", "embedding",
      2, cents)
    assert(edges(holder.graph) === edges(rebuilt))
    assert(edges(holder.graph).contains((21L, 1, 10L)),
      "cross-batch edge must exist")
  }
}
