package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-rational OLS trend: a perfect line recovers its slope as an
  * exact rational, the rationals equal an independent BigInt replay of
  * the closed form on real-ish data, and a single-x group reports
  * slope_den = 0 (no trend measurable) instead of NaN.
  */
class TrendFitSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("perfect line y = 2x + 1 yields slope_num = 2 * slope_den") {
    val df = Seq((0L, 1.0), (1L, 3.0), (2L, 5.0), (3L, 7.0), (10L, 21.0))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r = TrendFit.fit(df, Seq("g"), col("x"), col("y")).collect()(0)
    val num = BigInt(r.getAs[String]("slope_num"))
    val den = BigInt(r.getAs[String]("slope_den"))
    // y_fp = floor(y * 2^20) is exact for these integer-valued y, so
    // the fixed-point slope is exactly 2 * Scale fp-units per x unit
    assert(den > 0)
    assert(num === den * 2 * TrendFit.Scale)
  }

  test("rationals equal an independent BigInt replay") {
    val rows = (0 until 500).map { i =>
      val g = if (i % 2 == 0) "even" else "odd"
      (g, (i * 37 % 101).toLong, math.sin(i.toDouble) * 250.0)
    }
    val df = rows.toDF("g", "x", "y")
    val got = TrendFit.fit(df, Seq("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) -> (
        r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getAs[String]("slope_num")),
        BigInt(r.getAs[String]("slope_den")),
        BigInt(r.getAs[String]("yvar_num")))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2).map(BigInt(_))
      val ys = rs.map(r => BigInt(math.floor(r._3 * TrendFit.Scale).toLong))
      val n = BigInt(rs.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val (gn, gsx, gsy, num, den, yvar) = got(g)
      assert(BigInt(gn) === n && BigInt(gsx) === sx && BigInt(gsy) === sy)
      assert(num === n * sxy - sx * sy, s"slope_num mismatch for $g")
      assert(den === n * sxx - sx * sx, s"slope_den mismatch for $g")
      assert(yvar === n * syy - sy * sy, s"yvar_num mismatch for $g")
    }
  }

  test("single-x group reports slope_den = 0, not NaN") {
    val df = Seq(("a", 5L, 1.0), ("a", 5L, 9.0), ("b", 1L, 1.0),
      ("b", 2L, 2.0)).toDF("g", "x", "y")
    val r = TrendFit.fit(df, Seq("g"), col("x"), col("y"))
      .collect().map(x => x.getString(0) -> x.getAs[String]("slope_den"))
      .toMap
    assert(BigInt(r("a")) === BigInt(0))
    assert(BigInt(r("b")) > 0)
  }
}
