package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MMR diversified top-k: pick 1 is the pure-relevance top-1, a
  * near-duplicate of a selected item must lose its slot to a diverse
  * candidate (the operator's reason to exist), and the distributed
  * greedy must equal an independent driver-side replay of the same
  * selection rule on real corpus vectors.
  */
class MmrSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("near-duplicate candidate is displaced by a diverse one") {
    // q=0 is the query; 1 and 2 form a near-duplicate cluster ABOVE
    // the query axis (2 marginally more relevant), 3 mirrors the
    // cluster BELOW the axis with equal relevance. Pure top-2 is the
    // cluster (2, 1); MMR must cross to the other side: (2, 3).
    val df = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0.95f, 0.312f)),
      (2L, Seq(0.95f, 0.311f)),
      (3L, Seq(0.95f, -0.312f))
    ).toDF("vec_id", "embedding")
    val got = Mmr.diversify(df, "vec_id", "embedding", _ === 0L,
        candK = 3, k = 2)
      .orderBy("pick").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(2L, 3L))
    // pick 1 carries score = rel
    assert(got(0).getDouble(3) === got(0).getDouble(4))
    // pick 2's score is strictly below its relevance (diversity cost)
    assert(got(1).getDouble(4) < got(1).getDouble(3))
  }

  test("distributed greedy equals a driver-side replay on real vectors") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 4
    val got = Mmr.diversify(emb, "vec_id", "embedding", _ < 4, 8, k)
      .orderBy("q_id", "pick").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))

    // independent replay: same candidates, same fold cosine, same rule
    val cands = BruteForceKNN.topK(emb, "vec_id", "embedding", _ < 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def fold(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0d)((s, i) => s + x(i).toDouble * y(i).toDouble)
      fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
    }
    val want = cands.groupBy(_._1).toSeq.flatMap { case (q, pool0) =>
      var pool = pool0.map(c => (c._2, c._3)).toSeq
      var sel = Seq.empty[(Long, Double)]
      for (p <- 1 to k) {
        val scored = pool.map { case (id, rel) =>
          val score = if (p == 1) rel
            else 0.5d * rel -
              0.5d * sel.map(s => cos(vecs(id), vecs(s._1))).max
          (id, rel, score)
        }
        val best = scored.minBy(c => (-c._3, c._2))
        sel :+= ((best._1, best._3))
        pool = pool.filterNot(_._1 == best._1)
      }
      sel.zipWithIndex.map { case ((id, sc), i) => (q, i + 1, id, sc) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }
}
