package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Multi-probe LSH earns its keep only if probing the lowest-margin
  * bit flips actually recovers neighbors the single bucket loses —
  * these specs pin that on a constructed boundary pair, and pin the
  * degenerate config (nProbe = 1) to the single-bucket operator.
  */
class MultiProbeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("nProbe = 1 is exactly the single-bucket search") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val single = rows(HyperplaneLSH
      .topKInBucket(emb, "vec_id", "embedding", _ < 8, 10))
    val mp1 = rows(HyperplaneLSH
      .topKMultiProbe(emb, "vec_id", "embedding", _ < 8, 10, nProbe = 1))
    assert(mp1.toSet === single.toSet)
  }

  test("probing flips recovers a boundary-split near-identical pair") {
    // 2-D, 2 planes: put a query and its near-twin on OPPOSITE sides
    // of plane 0 (tiny margin), same side of plane 1. Single-probe
    // cannot see the twin; the first flip (lowest margin = plane 0)
    // must find it.
    val cfg = HyperplaneLSH.Config(numPlanes = 2, dim = 2, seed = "mp")
    val Seq(p0, p1) = HyperplaneLSH.planes(cfg).map(_.toArray.toSeq)
    // boundary direction of plane 0, oriented to the positive side of
    // plane 1 (so the pair agrees on bit 1 with a LARGE margin)
    val t0 = Seq(-p0(1), p0(0))
    val t = if (t0(0) * p1(0) + t0(1) * p1(1) >= 0) t0 else t0.map(-_)
    val eps = 1e-3
    val q = Seq((t(0) + eps * p0(0)).toFloat, (t(1) + eps * p0(1)).toFloat)
    val twin = Seq((t(0) - eps * p0(0)).toFloat, (t(1) - eps * p0(1)).toFloat)
    // filler vectors far from both boundaries, in the query's bucket
    val filler = (10L until 14L).map { i =>
      (i, Seq((p0(0) + p1(0)).toFloat + 0.01f * i,
        (p0(1) + p1(1)).toFloat))
    }
    val emb = (Seq((0L, q), (1L, twin)) ++ filler).toDF("vec_id", "embedding")

    val single = rows(HyperplaneLSH
      .topKInBucket(emb, "vec_id", "embedding", (c => c === 0L), 5, cfg))
    val multi = rows(HyperplaneLSH
      .topKMultiProbe(emb, "vec_id", "embedding", (c => c === 0L), 5, 2, cfg))

    assert(!single.exists(_._3 == 1L),
      "fixture broken: single-probe was not supposed to see the twin")
    val twinHit = multi.find(_._3 == 1L)
    assert(twinHit.nonEmpty, "multi-probe must recover the boundary twin")
    assert(twinHit.get._2 === 1, "the near-identical twin must rank first")
    assert(twinHit.get._4 > 0.999, "twin cosine must be ~1")
    // and multi-probe keeps everything the single bucket had (the twin
    // only ADDS candidates at k=5 over 4 fillers + twin)
    assert(single.map(_._3).toSet.subsetOf(multi.map(_._3).toSet))
  }

  test("multi-probe recall vs brute force is >= single-probe recall on real data") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val truth = rows(BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, 10))
      .map(r => (r._1, r._3)).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = rows(df).map(r => (r._1, r._3)).toSet
      hits.intersect(truth).size.toDouble / truth.size
    }
    val rs = recall(HyperplaneLSH
      .topKInBucket(emb, "vec_id", "embedding", _ < 8, 10))
    val rm = recall(HyperplaneLSH
      .topKMultiProbe(emb, "vec_id", "embedding", _ < 8, 10, 3))
    assert(rm >= rs, s"multi-probe recall $rm fell below single-probe $rs")
  }
}
