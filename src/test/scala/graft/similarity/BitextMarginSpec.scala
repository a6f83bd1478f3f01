package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Ratio-margin scoring: a hub endpoint (high neighborhood sum) is
  * demoted below a lower-cosine but genuinely-aligned pair — the
  * operator's reason to exist — and the distributed scoring equals an
  * independent driver-side replay on real vectors.
  */
class BitextMarginSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hub endpoint demoted below a genuine lower-cosine pair") {
    // q's candidates: hub h with cos 0.90, partner p with cos 0.85.
    // h sits in a dense neighborhood (sum 4.5 over k=5), p in a sparse
    // one (sum 1.0), q in between (sum 2.0):
    //   margin(q,h) = 0.90 / (2.0/10 + 4.5/10) = 1.385
    //   margin(q,p) = 0.85 / (2.0/10 + 1.0/10) = 2.833  → p wins
    val cands = Seq((0L, 1L, 0.90), (0L, 2L, 0.85))
      .toDF("q_id", "n_id", "cos_sim")
    val graph = (
      (1 to 5).map(i => (0L, 10L + i, 0.4)) ++   // q: sum 2.0
      (1 to 5).map(i => (1L, 20L + i, 0.9)) ++   // hub: sum 4.5
      (1 to 5).map(i => (2L, 30L + i, 0.2))      // partner: sum 1.0
    ).toDF("src_id", "n_id", "cos_sim")
    val got = BitextMargin.marginsFromGraph(cands, graph, kAvg = 5)
      .orderBy("margin_rank").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 1L),
      "partner must outrank the hub")
    assert(math.abs(got(0).getDouble(4) - 0.85 / 0.3) < 1e-12)
    assert(math.abs(got(1).getDouble(4) - 0.90 / 0.65) < 1e-12)
  }

  test("distributed scoring equals a driver-side replay on real vectors") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 6; val kAvg = 4
    val got = BitextMargin.score(emb, "vec_id", "embedding", _ < 3, k, kAvg)
      .orderBy("q_id", "margin_rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))

    val raw = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def f(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0d)((s, i) => s + x(i).toDouble * y(i).toDouble)
      f(a, b) / (math.sqrt(f(a, a)) * math.sqrt(f(b, b)))
    }
    def topOf(id: Long, n: Int) = raw.keys.filter(_ != id).toSeq
      .map(o => (o, cos(raw(id), raw(o))))
      .sortBy(t => (-t._2, t._1)).take(n)
    val nnsum = raw.keys.map { id =>
      // fold in (cos, id) sort order, exactly like the operator
      id -> topOf(id, kAvg).sortBy(t => (t._2, t._1))
        .foldLeft(0.0d)((s, t) => s + t._2)
    }.toMap
    val want = (0L until 3L).flatMap { q =>
      topOf(q, k).map { case (nId, c) =>
        (q, nId, c / (nnsum(q) / (2.0 * kAvg) + nnsum(nId) / (2.0 * kAvg)))
      }.sortBy(t => (-t._3, t._2)).zipWithIndex
        .map { case ((_, nId, m), i) => (q, i + 1, nId, m) }
    }
    assert(got.toSeq === want)
  }
}
