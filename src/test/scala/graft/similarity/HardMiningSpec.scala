package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

class HardMiningSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("extremes ≡ driver-side brute-force replay") {
    val all = emb.select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    def cos(a: Seq[Float], b: Seq[Float]) = {
      def fold(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
    }
    val want = all.filter(_._1 < 5).map { case (q, qv, ql) =>
      val others = all.filter(_._1 != q)
      val pos = others.filter(_._3 == ql)
        .map { case (n, v, _) => (cos(qv, v), n) }.minBy(identity)
      val neg = others.filter(_._3 != ql)
        .map { case (n, v, _) => (cos(qv, v), -n) }.maxBy(identity)
      (q, ql, pos._2, pos._1, -neg._2, neg._1,
        (pos._1 - neg._1) < 0.05)
    }.sortBy(_._1).toSeq
    val got = HardMining.hardestTriplets(emb, "vec_id", "embedding",
        "label", _ < 5, margin = 0.05)
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6))).toSeq
    assert(got === want)
  }

  test("missing counterpart classes yield null slots, not dropped rows") {
    val data = Seq(
      (0L, Seq(1f, 0f), 7), // anchor: no other label-7 vector exists
      (1L, Seq(0.9f, 0.1f), 8),
      (2L, Seq(0f, 1f), 8)).toDF("vec_id", "embedding", "label")
    val rows = HardMining.hardestTriplets(data, "vec_id", "embedding",
        "label", _ === 0L, margin = 0.05).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.isNullAt(2) && r.isNullAt(3)) // no positive
    assert(r.getLong(4) === 1L)            // hardest negative = closest
    assert(r.isNullAt(6))                  // violation undefined
  }

  test("cosine ties break to the smallest neighbor id on both sides") {
    val data = Seq(
      (0L, Seq(1f, 0f), 1),
      (3L, Seq(0f, 1f), 1), (2L, Seq(0f, 1f), 1),   // equal pos cosines
      (5L, Seq(1f, 1f), 2), (4L, Seq(1f, 1f), 2))   // equal neg cosines
      .toDF("vec_id", "embedding", "label")
    val r = HardMining.hardestTriplets(data, "vec_id", "embedding",
        "label", _ === 0L, margin = 0.05).collect().head
    assert(r.getLong(2) === 2L) // min id among tied positives
    assert(r.getLong(4) === 4L) // min id among tied negatives
  }
}
