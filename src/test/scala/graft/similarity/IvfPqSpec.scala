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

  test("residual IVFADC: exact cosines and recall not below global codes") {
    val k = 10
    val cfg = IvfPq.Config(residual = true)
    val out = IvfPq.topK(emb, "vec_id", "embedding", 64, _ < 8, k, cfg)
      .orderBy("q_id", "rank").collect()
    assert(out.length === 80)
    val brute = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, 1000)
      .select("q_id", "n_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      assert(r.getLong(2) != r.getLong(0), "self match")
      assert(brute((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, k)
    def meanRecall(c: IvfPq.Config): Double = {
      val got = IvfPq.topK(emb, "vec_id", "embedding", 64, _ < 8, k, c)
      val per = Recall.atK(exact, got, k).collect()
      per.map(_.getDouble(1)).sum / per.length
    }
    val resid = meanRecall(cfg)
    val global = meanRecall(IvfPq.Config())
    info(f"recall@10: residual $resid%.3f vs global $global%.3f")
    // this corpus is near-uniform random (no planted cluster
    // structure, SURVEY §2.10 D5 note), so coarse centroids sit near
    // the global mean and residuals barely shrink the coded
    // distribution: measured 0.61 residual vs 0.63 global — parity
    // within noise. The clustered-corpus test below is where the
    // encoding's advantage is real; here we pin the same 0.5 floor as
    // the global variant.
    assert(resid >= 0.5, f"residual recall $resid%.3f under the 0.5 floor")
  }

  test("residual codes beat global codes on a clustered corpus") {
    // 8 tight clusters around well-separated centers — the regime
    // residual encoding exists for: within a probed cell the global
    // codes spend their 16 centroids/subspace spanning ALL cluster
    // regions, while residual codes spend them on the noise ball
    // around the cell's centroid. Deterministic seed; ids round-robin
    // over clusters so seeds (smallest ids) cover every cluster.
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(8, dim)(rnd.nextDouble() * 2 - 1)
    val rows = (0L until 512L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => (x + rnd.nextDouble() * 0.1 - 0.05).toFloat).toSeq)
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val k = 10
    val exact = BruteForceKNN.topK(df, "vec_id", "embedding", _ < 8, k)
    def meanRecall(c: IvfPq.Config): Double = {
      val got = IvfPq.topK(df, "vec_id", "embedding", dim, _ < 8, k, c)
      val per = Recall.atK(exact, got, k).collect()
      per.map(_.getDouble(1)).sum / per.length
    }
    val resid = meanRecall(IvfPq.Config(residual = true))
    val global = meanRecall(IvfPq.Config())
    info(f"clustered recall@10: residual $resid%.3f vs global $global%.3f")
    assert(resid > global,
      f"residual $resid%.3f not above global $global%.3f on clustered data")
  }
}
