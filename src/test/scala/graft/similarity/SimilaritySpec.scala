package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine on hand-checkable vectors") {
    val df = Seq(
      (1L, Seq(1f, 0f), 2L, Seq(0f, 1f)),   // orthogonal → 0
      (3L, Seq(1f, 1f), 4L, Seq(2f, 2f)),   // parallel → 1
      (5L, Seq(1f, 0f), 6L, Seq(-1f, 0f))   // opposite → -1
    ).toDF("a_id", "a", "b_id", "b")
    val got = df.select(Cosine.cosine($"a", $"b").as("c"))
      .collect().map(_.getDouble(0))
    assert(got(0) === 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) + 1.0) < 1e-15)
  }

  test("brute-force top-k: correct ranking, no self-matches, k rows per query") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 3, 5)
      .orderBy("q_id", "rank").collect()
    assert(out.length === 15)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"ranks for q=$q not sorted desc")
      assert(rows.forall(_.getLong(2) != q), "self match")
    }
  }

  test("LSH bucket results are a subset of brute-force with same scoring") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 3, 1000)
      .select("q_id", "n_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = HyperplaneLSH.topKInBucket(emb, "vec_id", "embedding", _ < 3, 5)
      .select("q_id", "n_id", "cos_sim").collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // every LSH hit exists in the exhaustive set with the IDENTICAL
      // (bit-exact) cosine — same fold, same operand order
      assert(brute.contains(key))
      assert(brute(key) === r.getDouble(2))
    }
  }

  test("IVF: results are a subset of brute force; assignment covers the corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assigned = IVFIndex.assign(emb, "vec_id", "embedding")
    assert(assigned.count() === emb.count()) // every vector in exactly one cell
    val brute = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 3, 1000)
      .select("q_id", "n_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = IVFIndex.topK(emb, "vec_id", "embedding", _ < 3, 5).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key))
      assert(brute(key) === r.getDouble(3)) // bit-identical cosine
    }
  }

  test("embedding near-dup pairs: ordered, thresholded, symmetric-free") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = graft.dedup.EmbeddingNearDup
      .nearDuplicatePairs(emb, "vec_id", "embedding", 0.3).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0)
    }
  }

  test("recall@k: 1.0 for exact-vs-exact; deterministic in (0,1] for ANN") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 8, 10)
    assert(Recall.overallAtK(exact, exact, 10) === 1.0)
    val lsh = HyperplaneLSH.topKInBucket(emb, "vec_id", "embedding", _ < 8, 10)
    val ivf = IVFIndex.topK(emb, "vec_id", "embedding", _ < 8, 10)
    val rLsh = Recall.overallAtK(exact, lsh, 10)
    val rIvf = Recall.overallAtK(exact, ivf, 10)
    // random vectors scatter across buckets/cells, so absolute recall is
    // low by design here; what we pin is the measurement machinery and
    // determinism (fixed hyperplanes/centroids -> same number every run)
    assert(rLsh > 0.0 && rLsh <= 1.0)
    assert(rIvf > 0.0 && rIvf <= 1.0)
    assert(Recall.overallAtK(exact, lsh, 10) === rLsh)
    val perQuery = Recall.atK(exact, lsh, 10).collect()
    assert(perQuery.length === 8)
    perQuery.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("hyperplanes are deterministic and bucket ids are in range") {
    val cfg = HyperplaneLSH.Config()
    val p1 = HyperplaneLSH.planes(cfg)
    val p2 = HyperplaneLSH.planes(cfg)
    assert(p1 === p2)
    assert(p1.length === cfg.numPlanes)
    assert(p1.forall(_.forall(v => v >= -1.0 && v <= 1.0)))

    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val buckets = emb.select(
        HyperplaneLSH.bucketExpr($"embedding", cfg).as("b"))
      .agg(min($"b"), max($"b")).head()
    assert(buckets.getInt(0) >= 0)
    assert(buckets.getInt(1) < (1 << cfg.numPlanes))
  }
}
