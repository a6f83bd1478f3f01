package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PsiSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bins clamp at both edges and count exactly") {
    val a = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 1e9).toDF("v")
    val out = Psi.stability(a, a, "v", lo = 0.0, width = 10.0, nBins = 4)
      .orderBy("bin").collect()
    // bins: -5,0,9.9 -> 0; 10,25 -> 1,2; 99,1e9 clamp -> 3
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 3L), (1L, 1L), (2L, 1L), (3L, 2L)))
    // identical snapshots: every contribution is exactly zero
    assert(out.forall(_.getLong(3) === 0L))
  }

  test("matches the closed-form smoothed contributions") {
    val a = (1 to 80).map(_ => 5.0) ++ (1 to 20).map(_ => 15.0)
    val b = (1 to 50).map(_ => 5.0) ++ (1 to 50).map(_ => 15.0)
    val out = Psi.stability(a.toDF("v"), b.toDF("v"), "v",
        lo = 0.0, width = 10.0, nBins = 2)
      .orderBy("bin").collect()
    def contrib(na: Long, nb: Long, ta: Long, tb: Long): Long = {
      val pa = (na + 1).toDouble / (ta + 2).toDouble
      val pb = (nb + 1).toDouble / (tb + 2).toDouble
      math.floor(((pb - pa) * StrictMath.log(pb / pa)) * 1e9).toLong
    }
    assert(out(0).getLong(3) === contrib(80, 50, 100, 100))
    assert(out(1).getLong(3) === contrib(20, 50, 100, 100))
    // a genuinely shifted distribution reads positive overall, and
    // both tails contribute (PSI is a symmetrized divergence)
    assert(out.map(_.getLong(3)).sum > 0L)
    assert(out.forall(_.getLong(3) > 0L))
  }

  test("null values are excluded; empty bins survive via smoothing") {
    val a = Seq[Option[Double]](Some(5.0), None, Some(5.0)).toDF("v")
    val b = Seq[Option[Double]](Some(25.0), None).toDF("v")
    val out = Psi.stability(a, b, "v", lo = 0.0, width = 10.0, nBins = 3)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 0L), (2L, 0L, 1L)))
    // no NaN/overflow from the empty sides: contributions are finite
    assert(out.forall(r => math.abs(r.getLong(3)) < 10_000_000_000L))
  }
}
