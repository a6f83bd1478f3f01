package graft.dedup

import graft.SparkTestSession
import graft.similarity.IVFIndex
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup pruning over a hand-built two-cluster space: survivors must
  * be the lowest id of each in-cell similar group, and near-identical
  * vectors in DIFFERENT cells must both survive (cluster-locality is
  * the operator's stated recall trade-off, not a bug).
  */
class SemanticDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // stride 2 → centroids = even ids (0: x-axis, 2: y-axis)
  private val cfg = IVFIndex.Config(centroidStride = 2)

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def surviving(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy("vec_id").collect().map(_.getLong(0)).toSeq

  test("in-cell near-identicals collapse to the lowest id") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),        // centroid A (x-axis)
      1L -> Seq(0.99f, 0.01f, 0f),  // ≈ 0 → dropped against it
      2L -> Seq(0f, 1f, 0f),        // centroid B (y-axis)
      3L -> Seq(0.01f, 0.99f, 0f),  // ≈ 2 → dropped
      5L -> Seq(0f, 0.98f, 0.2f))   // cos(5,2) ≈ 0.98 → dropped; keeps B's cell
    val out = SemanticDedup.survivors(df, "vec_id", "embedding", 0.95, cfg)
    assert(surviving(out) === Seq(0L, 2L))
  }

  test("similar vectors in different cells both survive (cluster-local search)") {
    // 1 is similar to 3 but sits nearest the x-axis centroid while 3
    // sits nearest y — different cells, never compared
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f),
      1L -> Seq(0.8f, 0.6f, 0f),
      3L -> Seq(0.6f, 0.8f, 0f))
    val out = SemanticDedup.survivors(df, "vec_id", "embedding", 0.9, cfg)
    assert(surviving(out) === Seq(0L, 1L, 2L, 3L))
  }

  test("drop rule is a total order, not a greedy chain") {
    // 0—1 similar, 1—3 similar, 0—3 NOT similar: 1 drops against 0;
    // 3 still drops (its partner 1 has a smaller id, dropped or not)
    val df = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.97f, 0.24f, 0f),
      3L -> Seq(0.88f, 0.47f, 0f))
    val out = SemanticDedup.survivors(df, "vec_id", "embedding", 0.96, cfg)
    assert(surviving(out) === Seq(0L))
  }

  test("threshold above every pair keeps everything") {
    val df = vecs(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f))
    val out = SemanticDedup.survivors(df, "vec_id", "embedding", 0.9999, cfg)
    assert(surviving(out) === Seq(0L, 1L, 2L))
  }

  test("survivorsWithCentroids over the stride centroid frame == survivors") {
    // the large-k scale path must be drop-in: same cells, same rule →
    // identical survivor set (the KnnGraph.buildWithCentroids
    // precedent), on real embeddings
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = graft.similarity.GraphIngest
      .strideCentroids(emb, "vec_id", "embedding", cfg.centroidStride)
    val a = SemanticDedup
      .survivors(emb, "vec_id", "embedding", 0.95, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SemanticDedup
      .survivorsWithCentroids(emb, "vec_id", "embedding", 0.95, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(a.nonEmpty && a === b)
  }
}
