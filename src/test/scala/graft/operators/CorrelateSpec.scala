package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CorrelateSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("rationals and corr_q == driver replay; |r| <= 1") {
    val rows = Seq(
      ("a", 1.0, 2.5), ("a", 2.0, 4.5), ("a", 3.0, 7.25),
      ("a", 4.0, 8.0), ("b", 1.0, 9.0), ("b", 2.0, 5.0),
      ("b", 3.0, 1.5)).toDF("grp", "x", "y")
    val got = Correlate.pearson(rows, Seq("grp"),
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"))
      .orderBy("grp").collect()
    def replay(pts: Seq[(Long, Long)]) = {
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val syy = pts.map(p => BigInt(p._2) * p._2).sum
      val cov = BigInt(n) * sxy - BigInt(sx) * BigInt(sy)
      val xv = BigInt(n) * sxx - BigInt(sx) * BigInt(sx)
      val yv = BigInt(n) * syy - BigInt(sy) * BigInt(sy)
      val rq = math.floor(1000000.0 * (cov.toDouble /
        (math.sqrt(xv.toDouble) * math.sqrt(yv.toDouble)))).toLong
      (cov.toString, xv.toString, yv.toString, rq)
    }
    def q(v: Double) = math.floor(v * (1L << 20)).toLong
    val byGrp = Seq(
      "a" -> Seq((1L, q(2.5)), (2L, q(4.5)), (3L, q(7.25)), (4L, q(8.0))),
      "b" -> Seq((1L, q(9.0)), (2L, q(5.0)), (3L, q(1.5))))
    got.zip(byGrp).foreach { case (r, (g, pts)) =>
      assert(r.getString(0) === g)
      val (cov, xv, yv, rq) = replay(pts)
      assert(r.getString(2) === cov)
      assert(r.getString(3) === xv)
      assert(r.getString(4) === yv)
      assert(r.getLong(5) === rq)
      assert(math.abs(r.getLong(5)) <= 1000000L)
    }
    // signs: a is increasing (r near +1), b decreasing (near -1)
    assert(got(0).getLong(5) > 900000L)
    assert(got(1).getLong(5) < -900000L)
  }

  test("zero variance yields null corr_q, exact zero rational") {
    val rows = Seq(("a", 5.0, 1.0), ("a", 5.0, 2.0), ("a", 5.0, 3.0))
      .toDF("grp", "x", "y")
    val r = Correlate.pearson(rows, Seq("grp"),
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")).collect().head
    assert(r.getString(3) === "0") // xvar_num
    assert(r.isNullAt(5))
  }

  test("deterministic across repartitionings") {
    val rows = (1 to 500).map(i =>
      ("g", i.toDouble, i * 0.5 + (i % 7) * 0.3)).toDF("grp", "x", "y")
    def run(p: Int) = Correlate.pearson(rows.repartition(p), Seq("grp"),
        org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")).collect().head.toSeq
    assert(run(1) === run(11))
  }
}
