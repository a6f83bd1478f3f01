package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-drift contract: identical snapshots score cosine 1 per
  * label, a rotated label scores below 1 while untouched labels stay
  * at 1, labels missing from either side are absent, and the
  * fixed-point sums make results partitioning-invariant.
  */
class EmbedDriftSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def snap(rows: (Long, Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  private def shifts(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Map[Int, Double] =
    EmbedDrift.centroidShift(a, b, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap

  private val base = snap(
    (0L, 0, Seq(1f, 0f, 0f)), (1L, 0, Seq(0.9f, 0.1f, 0f)),
    (2L, 1, Seq(0f, 1f, 0f)), (3L, 1, Seq(0f, 0.95f, 0.05f)))

  test("identical snapshots have centroid cosine 1 for every label") {
    // within one ulp of 1: x/(sqrt(x)*sqrt(x)) is not EXACTLY 1 in IEEE
    assert(shifts(base, base).values.forall(c => (c - 1.0).abs < 1e-12))
  }

  test("a rotated label drops below 1; untouched labels stay at 1") {
    val rotated = snap(
      (0L, 0, Seq(1f, 0f, 0f)), (1L, 0, Seq(0.9f, 0.1f, 0f)),
      (2L, 1, Seq(0.7f, 0.3f, 0f)), (3L, 1, Seq(0.6f, 0.35f, 0.05f)))
    val s = shifts(base, rotated)
    assert((s(0) - 1.0).abs < 1e-12)
    assert(s(1) < 0.5, s"label 1 rotated ~90 degrees, got cos ${s(1)}")
  }

  test("labels absent from either snapshot produce no row") {
    val bOnly = snap((9L, 7, Seq(0f, 0f, 1f)))
    assert(shifts(base, bOnly) === Map.empty)
  }

  test("partitioning-invariant (fixed-point sums)") {
    val many = snap((0L until 64L).map(i =>
      (i, (i % 3).toInt, Seq(0.3f + i * 0.01f, 0.5f - i * 0.007f, 0.1f))): _*)
    val a = shifts(many, base.unionByName(many).filter($"label" < 3))
    val b = shifts(many.repartition(13),
      base.unionByName(many).filter($"label" < 3).repartition(7))
    assert(a === b)
  }
}
