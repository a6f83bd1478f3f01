package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalEvalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-checkable metrics, including the dropped-query row") {
    val truth = Seq(
      (0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L),
      (1L, 1, 20L), (1L, 2, 21L),              // only 2 truth rows
      (2L, 1, 30L), (2L, 2, 31L), (2L, 3, 32L) // retriever drops q2
    ).toDF("q_id", "rank", "n_id")
    val approx = Seq(
      (0L, 1, 11L), (0L, 2, 99L), (0L, 3, 10L), // 2 hits, first at rank 1
      (1L, 1, 98L), (1L, 2, 97L), (1L, 3, 20L)  // 1 hit, first at rank 3
    ).toDF("q_id", "rank", "n_id")
    val out = RetrievalEval.metrics(truth, approx, 3)
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out(0) === ((0L, 2L, 2.0 / 3, 2.0 / 3, 1.0)))
    assert(out(1) === ((1L, 1L, 1.0 / 3, 1.0 / 2, 1.0 / 3)))
    assert(out(2) === ((2L, 0L, 0.0, 0.0, 0.0)),
      "a query the retriever dropped must still score zeros")
  }

  test("a perfect retriever scores 1.0 everywhere on real data") {
    val emb = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val truth = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 4, 5)
    val out = RetrievalEval.metrics(truth, truth, 5).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 1.0 &&
        r.getDouble(4) === 1.0)
    }
  }
}
