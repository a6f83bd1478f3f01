package graft.similarity

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GramMatrixSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = GramMatrix.Scale

  test("hand-checked moments on a tiny 2-d corpus") {
    // rows (1.0, 2.0) and (3.0, 4.0); quantization is exact for
    // integers: q = v * 2^20
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val got = GramMatrix.upperTriangle(df, "v")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6)))
      .toMap
    // (0,0): sx = 4S, sxy = (1+9)S² = 10S²; cov = 2·10S² − 4S·4S = 4S²
    assert(got((0, 0)) ===
      ((2L, 4 * S, 4 * S, 10 * S * S, (4L * S * S).toString)))
    // (0,1): sx = 4S, sy = 6S, sxy = (2+12)S²; cov = 28S² − 24S² = 4S²
    assert(got((0, 1)) ===
      ((2L, 4 * S, 6 * S, 14 * S * S, (4L * S * S).toString)))
    // (1,1): sy = 6S, syy = (4+16)S²; cov = 40S² − 36S² = 4S²
    assert(got((1, 1)) ===
      ((2L, 6 * S, 6 * S, 20 * S * S, (4L * S * S).toString)))
    assert(got.size === 3, "upper triangle of d=2 has 3 cells")
  }

  test("null vectors are excluded; n is per-cell") {
    val df = Seq(Some(Seq(1.0f, 1.0f)), None, Some(Seq(2.0f, 2.0f)))
      .toDF("v")
    val got = GramMatrix.upperTriangle(df, "v").collect()
    assert(got.forall(_.getLong(2) === 2L))
  }

  test("order- and partitioning-invariant (integer sums)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(Seq.fill(8)(rnd.nextFloat() - 0.5f))
    val a = GramMatrix.upperTriangle(rows.toDF("v"), "v")
      .collect().map(r => r.toSeq).toSet
    val b = GramMatrix.upperTriangle(
        rows.reverse.toDF("v").repartition(13), "v")
      .collect().map(r => r.toSeq).toSet
    assert(a === b)
  }

  test("cell count is d(d+1)/2 and the plan is a single aggregate") {
    val df = Seq.fill(10)(Seq.fill(16)(0.25f)).toDF("v")
    val out = GramMatrix.upperTriangle(df, "v")
    assert(out.count() === 16L * 17 / 2)
    // one-pass shape: no join anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }
}
