package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** NN-descent round contract: hash-bucket seeds bridge cells (the
  * recall repair the cell-local graph needs), no seeds ⇒ the round is
  * a no-op on a cell-pure graph, and previously isolated vectors join
  * the graph through their seed bucket.
  */
class NnDescentSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = IVFIndex.Config(centroidStride = 2)

  // cells: A = {0 (x-axis), 1}, B = {2 (y-axis), 3}; 1 and 3 are
  // near-identical but cell-separated — the base graph cannot see it
  private val crossCell = Seq(
    0L -> Seq(1f, 0f, 0f),
    2L -> Seq(0f, 1f, 0f),
    1L -> Seq(0.8f, 0.6f, 0f),
    3L -> Seq(0.6f, 0.8f, 0f)).toDF("vec_id", "embedding")

  private def edges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.orderBy("src_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("one seeded round recovers the cross-cell near-identical pair") {
    val base = KnnGraph.build(crossCell, "vec_id", "embedding", 2, cfg)
    assert(!edges(base).exists { case (s, _, n) => Set(s, n) == Set(1L, 3L) })
    // seedBuckets = 1: every pair is a seed candidate — the refined
    // graph is the EXACT top-k graph
    val refined = NnDescent.refine(crossCell, "vec_id", "embedding", 2,
      cfg, seedBuckets = 1)
    val out = edges(refined)
    // cos(1,3) = 0.96 beats cos(1,0) = 0.8: rank 1 flips to the
    // cross-cell neighbor the base graph could not see
    assert(out.contains((1L, 1, 3L)))
    assert(out.contains((3L, 1, 1L)))
  }

  test("without seed collisions the round cannot leave the cells") {
    val refined = NnDescent.refine(crossCell, "vec_id", "embedding", 2,
      cfg, seedBuckets = 1 << 20)
    assert(edges(refined) === edges(
      KnnGraph.build(crossCell, "vec_id", "embedding", 2, cfg)),
      "with no bridges, one round over a cell-pure graph must be a no-op")
  }

  test("a vector alone in its cell joins the graph through its seed bucket") {
    val df = Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f),
      2L -> Seq(0f, 1f, 0f)).toDF("vec_id", "embedding") // 2 alone in cell B
    val base = KnnGraph.build(df, "vec_id", "embedding", 2, cfg)
    assert(!edges(base).map(_._1).contains(2L))
    val refined = NnDescent.refine(df, "vec_id", "embedding", 2,
      cfg, seedBuckets = 1)
    assert(edges(refined).map(_._1).toSet === Set(0L, 1L, 2L))
  }

  test("one seeded round improves recall vs exact on a clustered corpus") {
    // 8 tight clusters of 12 vectors in 16-dim space; stride-5 cells
    // split true clusters across cells, so the base graph must miss
    // true neighbors that one seeded round can recover
    val rnd = new scala.util.Random(7)
    val rows = for {
      c <- 0 until 8; j <- 0 until 12
    } yield {
      val base = Array.tabulate(16)(d => if (d == c * 2) 1f else 0f)
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.12f)
      (c * 12L + j) -> v.toSeq
    }
    val df = rows.toDF("vec_id", "embedding")
    val k = 5
    val cfgS = IVFIndex.Config(centroidStride = 5)

    // driver-side exact top-k per source
    val vecs = rows.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (da, db) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = da.zip(db).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(da.map(x => x * x).sum) *
        math.sqrt(db.map(x => x * x).sum))
    }
    val exact = vecs.keys.map { s =>
      s -> vecs.keys.filter(_ != s).toSeq
        .sortBy(n => (-cos(vecs(s), vecs(n)), n)).take(k).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      // keys is a Set — map through a Seq or the recalls dedup
      vecs.keys.toSeq.map(s =>
        got.getOrElse(s, Set.empty).intersect(exact(s)).size.toDouble / k)
        .sum / vecs.size
    }
    val base = recall(KnnGraph.build(df, "vec_id", "embedding", k, cfgS))
    val refined = recall(NnDescent.refine(df, "vec_id", "embedding", k,
      cfgS, seedBuckets = 8))
    assert(base < 1.0, "fixture must actually split clusters across cells")
    assert(refined > base,
      f"refined recall $refined%.3f must beat base $base%.3f")
  }

  test("seedBuckets must be a power of two") {
    intercept[IllegalArgumentException](
      NnDescent.refine(crossCell, "vec_id", "embedding", 2, cfg,
        seedBuckets = 100))
  }
}
