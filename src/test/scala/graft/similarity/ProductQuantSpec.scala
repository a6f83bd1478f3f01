package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

class ProductQuantSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private val Dim = 64

  test("exhaustive screen reproduces brute force exactly") {
    val n = emb.count().toInt
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 3, 5)
      .select("q_id", "rank", "n_id", "cos_sim")
      .orderBy("q_id", "rank").collect().toSeq
    val pq = ProductQuant.topK(emb, "vec_id", "embedding", Dim, _ < 3, 5,
        ProductQuant.Config(screenK = n))
      .select("q_id", "rank", "n_id", "cos_sim")
      .orderBy("q_id", "rank").collect().toSeq
    // a wide-open screen passes everyone through to the exact re-rank
    assert(pq === exact)
  }

  test("default screen keeps useful recall against brute force") {
    val k = 10
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, k)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = ProductQuant.topK(emb, "vec_id", "embedding", Dim, _ < 8, k)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // 8 codes × 16 centroids is an aggressive 64× compression of the
    // int8 form — the screen is coarse by design; the floor documents
    // the measured regime rather than a marketing number
    assert(recall >= 0.5, s"recall@$k = $recall")
  }

  test("ADC distance equals the driver-recomputed codebook distance") {
    val cfg = ProductQuant.Config()
    val books = ProductQuant.train(emb, "vec_id", "embedding", Dim, cfg)
    assert(books.length === cfg.m)
    books.foreach(b => assert(b.nonEmpty && b.length <= cfg.codeK))
    val sub = Dim / cfg.m
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val out = ProductQuant.topK(emb, "vec_id", "embedding", Dim, _ < 2, 5, cfg)
      .collect()
    val scale = cfg.kmCfg.scale
    def quant(v: Array[Float], s: Int): Array[Double] =
      v.slice(s * sub, (s + 1) * sub).map(x => math.floor(x.toDouble * scale))
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    out.foreach { r =>
      val (q, n, got) = (r.getLong(0), r.getLong(2), r.getDouble(4))
      // reassign n's codes and q's LUT from the books, by hand
      val want = (0 until cfg.m).map { s =>
        val qs = quant(vecs(q), s)
        val ns = quant(vecs(n), s)
        val code = books(s).map { c =>
          (fold(ns, ns) + c.cn - 2.0 * fold(ns, c.cv), c.cid) }.min._2
        val c = books(s).find(_.cid == code).get
        fold(qs, qs) + c.cn - 2.0 * fold(qs, c.cv)
      }.reduceLeft(_ + _)
      assert(got === want, s"ADC mismatch for ($q, $n)")
    }
  }
}
