package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

class IvfPqSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("IVFADC: k rows per query, exact cosines, no self matches") {
    val out = IvfPq.topK(emb, "vec_id", "embedding", 64, _ < 8, 10)
      .orderBy("q_id", "rank").collect()
    // exhaustive scoring within probed cells: every query fills its k
    // as long as its probed cells hold >= screenK members (true here)
    assert(out.length === 80)
    val brute = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, 1000)
      .select("q_id", "n_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(r.getLong(2) != r.getLong(0), "self match")
      // reported cosine is the EXACT float cosine (re-rank contract):
      // bit-identical to the brute-force score of the same pair
      assert(brute(key) === r.getDouble(3))
    }
  }

  test("IVFADC recall@10 vs brute force clears the documented floor") {
    val k = 10
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, k)
    val got = IvfPq.topK(emb, "vec_id", "embedding", 64, _ < 8, k)
    val per = Recall.atK(exact, got, k).collect()
    val mean = per.map(_.getDouble(1)).sum / per.length
    // global-code (non-residual) ADC + 2-of-8 probed cells: measured
    // 0.66 on this corpus; floor pinned below to catch regressions
    // without chasing noise
    assert(per.length === 8)
    assert(mean >= 0.5, f"mean recall@10 $mean%.3f under the 0.5 floor")
  }
}
