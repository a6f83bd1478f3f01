package graft.similarity

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Incremental graph-maintenance contract: merging a batch into the
  * standing graph equals a from-scratch rebuild over the union under
  * the same frozen centroids — including when the batch demotes a
  * standing edge out of a node's top-k.
  */
class GraphIngestSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def edges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.orderBy("src_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("merged == rebuild under frozen centroids; batch demotes an old edge") {
    // corpus cell A: 0 (centroid), 1, 3 — with k=1, 0's edge is 1.
    // batch vector 9 sits closer to 0 than 1 does: the merge must
    // DEMOTE the standing 0→1 edge, and 9 must rank its own neighbors.
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      3L -> Seq(0.8f, 0.3f, 0f),
      2L -> Seq(0f, 1f, 0f))
    val batch = vecs(9L -> Seq(0.99f, 0.01f, 0f))
    val cents = GraphIngest.strideCentroids(corpus, "vec_id", "embedding", 2)
    val standing = KnnGraph.buildWithCentroids(corpus, "vec_id",
      "embedding", 1, cents)
    assert(edges(standing).contains((0L, 1, 1L)))

    val merged = GraphIngest.merged(corpus, batch, standing, "vec_id",
      "embedding", 1, cents)
    val rebuilt = KnnGraph.buildWithCentroids(
      corpus.unionByName(batch), "vec_id", "embedding", 1, cents)
    assert(edges(merged) === edges(rebuilt))
    assert(edges(merged).contains((0L, 1, 9L)), "batch vector must demote 0->1")
    assert(edges(merged).exists(_._1 == 9L), "batch vector must gain edges")
  }

  test("an empty batch leaves the standing graph unchanged") {
    val corpus = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f), 5L -> Seq(0f, 0.9f, 0.1f))
    val cents = GraphIngest.strideCentroids(corpus, "vec_id", "embedding", 2)
    val standing = KnnGraph.buildWithCentroids(corpus, "vec_id",
      "embedding", 2, cents)
    val merged = GraphIngest.merged(corpus,
      vecs().filter(col("vec_id") < 0), standing, "vec_id", "embedding",
      2, cents)
    assert(edges(merged) === edges(standing))
  }
}
