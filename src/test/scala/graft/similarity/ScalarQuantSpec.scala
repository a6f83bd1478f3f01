package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

class ScalarQuantSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("exhaustive screen reproduces brute force exactly") {
    val n = emb.count().toInt
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 3, 5)
      .select("q_id", "rank", "n_id", "cos_sim")
      .orderBy("q_id", "rank").collect().toSeq
    val quant = ScalarQuant.topK(emb, "vec_id", "embedding", _ < 3, 5,
        ScalarQuant.Config(screenK = n))
      .select("q_id", "rank", "n_id", "cos_sim")
      .orderBy("q_id", "rank").collect().toSeq
    // with nothing screened out, the exact re-rank IS brute force —
    // same neighbors, same bit-exact cosines
    assert(quant === exact)
  }

  test("default screen keeps high recall against brute force") {
    val k = 10
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, k)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = ScalarQuant.topK(emb, "vec_id", "embedding", _ < 8, k)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@$k = $recall")
  }

  test("identical vectors screen to quantized distance zero") {
    val data = Seq(
      (0L, Seq(0.5f, -0.25f, 0.125f)), (1L, Seq(0.5f, -0.25f, 0.125f)),
      (2L, Seq(-1f, 1f, 0f)), (3L, Seq(1f, -1f, 0.5f)))
    val out = ScalarQuant.topK(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", _ === 0L, 3)
      .orderBy("rank").collect()
    assert(out.head.getLong(2) === 1L)      // the duplicate ranks first
    assert(out.head.getLong(4) === 0L)      // at exactly distance 0
    assert(out.forall(_.getLong(4) >= 0L))
  }

  test("constant dimensions contribute nothing (span-zero guard)") {
    val base = Seq(
      (0L, Seq(0.1f, 0.9f)), (1L, Seq(0.2f, 0.7f)),
      (2L, Seq(0.8f, 0.1f)), (3L, Seq(0.85f, 0.2f)))
    val padded = base.map { case (id, v) => (id, v :+ 42f) }
    def dists(rows: Seq[(Long, Seq[Float])]) =
      ScalarQuant.topK(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", _ === 0L, 3)
        .select("n_id", "dist_q").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dists(base) === dists(padded))
  }
}
