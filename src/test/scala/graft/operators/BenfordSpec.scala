package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Benford.firstDigitAudit]] vs an in-memory replay: cents
  * fixed-pointing, digit census with absent digits on the spine,
  * exact ppm/deviation arithmetic — and a Benford-faithful synthetic
  * sample scoring near-zero deviation while uniform data lights up.
  */
class BenfordSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(vs: Seq[Double]) = {
    import spark.implicits._
    Benford.firstDigitAudit(vs.toDF("v"), "v")
      .orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("audit == brute force; zero/negative/null-free census; spine") {
    val vs = Seq(1.23, 19.99, 0.31, 310.0, 3.02, -5.0, 0.0, 0.004)
    // cents: 123, 1999, 31, 31000, 302; negative, zero, and sub-cent
    // (0.004 → 0 cents, no significant digit) are all excluded from
    // census AND total
    val clean = vs.filter(v => v > 0 && math.floor(v * 100) >= 1)
    val got = run(vs)
    val counts = clean.map(v => math.floor(v * 100).toLong.toString.head - '0')
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = clean.size.toLong
    val want = (1 to 9).map { d =>
      val n = counts.getOrElse(d, 0L)
      val obs = 1000000L * n / t
      val exp = Benford.ExpectedPpm(d - 1)
      (d.toLong, n, obs, exp, (obs - exp) * (obs - exp) / exp)
    }
    assert(got.toSeq === want)
  }

  test("Benford-faithful sample deviates less than uniform digits") {
    import spark.implicits._
    // powers of a constant ratio cycle through magnitudes with the
    // classic logarithmic first-digit distribution
    val benfordish = (0 until 2000).map(i => math.pow(1.007, i))
    val uniform = (0 until 2000).map(i => (1 + i % 9) * 10.0)
    def dev(vs: Seq[Double]) = run(vs).map(_._5).sum
    assert(dev(benfordish) < dev(uniform) / 10)
  }
}
