package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL random projection: the wide and melted faces must agree value-
  * for-value, the projection must be a driver-replayable left fold of
  * the md5-derived planes (determinism = the hash-gate bar), the plan
  * must stay a map-only scan (no exchange — the 100 TB shape), and the
  * sketch must approximately preserve the corpus's pairwise geometry
  * (the JL point of the operator).
  */
class RandomProjectionSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val cfg = RandomProjection.config(p = 16, dim = 64, seed = "rp")
  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("wide and melted faces agree; values replay the plane fold") {
    val planes = HyperplaneLSH.planes(cfg)
    val wide = RandomProjection.reduce(emb, "vec_id", "embedding", cfg)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val melted = RandomProjection.project(emb, "vec_id", "embedding", cfg)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(melted.size === wide.size * cfg.numPlanes)
    for ((id, arr) <- wide; p <- arr.indices)
      assert(melted((id, p)) === arr(p), s"face mismatch at ($id, $p)")
    // bit-exact replay: left fold in DotProduct operand order
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((id, v) <- raw.take(5); p <- 0 until cfg.numPlanes) {
      val fold = v.indices.foldLeft(0.0d)((acc, i) =>
        acc + v(i).toDouble * planes(p)(i))
      assert(wide(id)(p) === fold, s"fold replay mismatch at ($id, $p)")
    }
  }

  test("wide face is a map-only scan: no exchange in the plan") {
    val plan = RandomProjection.reduce(emb, "vec_id", "embedding", cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
  }

  test("JL property: projected distances track original distances") {
    // p = 16 is coarse, so assert rank agreement on well-separated
    // pairs rather than a tight epsilon: among 40 vectors, for pairs
    // whose original distances differ by 2x, the projected distances
    // must order the same way in >= 80% of cases.
    val rows = emb.limit(40).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val planes = HyperplaneLSH.planes(cfg)
    def proj(v: Array[Double]): Array[Double] =
      planes.map(pl => v.indices.foldLeft(0.0d)((a, i) =>
        a + v(i) * pl(i))).toArray
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val sketch = rows.map(proj)
    val pairs = for {
      i <- rows.indices; j <- rows.indices if i < j
    } yield (d2(rows(i), rows(j)), d2(sketch(i), sketch(j)))
    val checks = for {
      a <- pairs; b <- pairs if a._1 * 2 < b._1
    } yield if (a._2 < b._2) 1 else 0
    assert(checks.nonEmpty)
    val agree = checks.sum.toDouble / checks.size
    assert(agree >= 0.8, f"rank agreement $agree%.3f < 0.8")
  }
}
