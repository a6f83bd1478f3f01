package graft.similarity

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** kNN-graph contract over a hand-built two-cell space: per-source
  * ranking is (cosine DESC, id ASC), candidates never cross cells,
  * singleton cells emit nothing, and every source caps at k rows.
  */
class KnnGraphSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // stride 2 → centroids = even ids (0: x-axis, 2: y-axis)
  private val cfg = IVFIndex.Config(centroidStride = 2)

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def edges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.orderBy("src_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("every vector ranks its own-cell neighbors by cosine desc, id asc") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),       // centroid A
      1L -> Seq(0.9f, 0.1f, 0f),   // cell A, nearest to 0
      3L -> Seq(0.8f, 0.3f, 0f),   // cell A
      2L -> Seq(0f, 1f, 0f),       // centroid B
      5L -> Seq(0f, 0.9f, 0.1f))   // cell B
    val out = edges(KnnGraph.build(df, "vec_id", "embedding", 2, cfg))
    // cell A = {0,1,3}: each ranks the other two; cell B = {2,5}
    assert(out === Seq(
      (0L, 1, 1L), (0L, 2, 3L),
      (1L, 1, 0L), (1L, 2, 3L),
      (2L, 1, 5L),
      (3L, 1, 1L), (3L, 2, 0L),
      (5L, 1, 2L)))
  }

  test("cross-cell near-identicals are never edges (cell-locality)") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f),
      1L -> Seq(0.8f, 0.6f, 0f),  // cell A
      3L -> Seq(0.6f, 0.8f, 0f))  // cell B, similar to 1
    val out = edges(KnnGraph.build(df, "vec_id", "embedding", 3, cfg))
    assert(!out.exists { case (s, _, n) =>
      Set(s, n) == Set(1L, 3L) || Set(s, n) == Set(0L, 2L)
    }, "cross-cell pair leaked into the graph")
  }

  test("a vector alone in its cell emits no rows") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f))       // alone in cell B
    val out = edges(KnnGraph.build(df, "vec_id", "embedding", 2, cfg))
    assert(out.map(_._1).toSet === Set(0L, 1L))
  }

  test("mutualEdges keeps only reciprocated pairs (hub pruning)") {
    // one cell; k=1: 0's nearest is 1 and 1's nearest is 0 (mutual);
    // 3's nearest is 1 (cos(3,1)=0.97 > cos(3,0)=0.94) but 1's is 0 —
    // the 3→1 edge is unreciprocated and must be pruned
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.99f, 0.01f, 0f),
      3L -> Seq(0.9f, 0.25f, 0f))
    val g = KnnGraph.build(df, "vec_id", "embedding", 1, cfg)
    val mut = KnnGraph.mutualEdges(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mut === Seq((0L, 1L)))
  }

  test("buildWithCentroids over the stride centroid set == build") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      3L -> Seq(0.8f, 0.3f, 0f),
      2L -> Seq(0f, 1f, 0f),
      5L -> Seq(0f, 0.9f, 0.1f))
    val cents = df.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"),
        Cosine.norm2(col("embedding")).as("cn"))
    assert(
      edges(KnnGraph.buildWithCentroids(df, "vec_id", "embedding", 2, cents))
        === edges(KnnGraph.build(df, "vec_id", "embedding", 2, cfg)))
  }

  test("k caps the degree even in a dense cell") {
    // one fat cell: centroid 0 plus four nearby odd-id vectors
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.99f, 0.01f, 0f),
      3L -> Seq(0.98f, 0.02f, 0f),
      5L -> Seq(0.97f, 0.03f, 0f),
      7L -> Seq(0.96f, 0.04f, 0f))
    val out = edges(KnnGraph.build(df, "vec_id", "embedding", 2, cfg))
    val degrees = out.groupBy(_._1).view.mapValues(_.size)
    assert(degrees.values.forall(_ == 2), "a source exceeded k edges")
    assert(out.filter(_._1 == 0L).map(_._3) === Seq(1L, 3L),
      "rank order must be cosine desc")
  }
}
