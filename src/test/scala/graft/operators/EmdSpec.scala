package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Emd.w1Binned]] vs an in-memory replay, plus the property that
  * motivates W1 next to PSI: shifting the same mass FARTHER grows W1
  * while per-bin PSI-style magnitudes can't tell the shifts apart.
  */
class EmdSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(a: Seq[Double], b: Seq[Double], nBins: Int) = {
    import spark.implicits._
    Emd.w1Binned(a.toDF("v"), b.toDF("v"), "v", lo = 0.0, width = 1.0,
        nBins = nBins)
      .orderBy("bin").collect()
      // w1_num crosses the gate as a DECIMAL(38,0) digit string
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5).toLong))
  }

  private def brute(a: Seq[Double], b: Seq[Double], nBins: Int) = {
    def binOf(v: Double) = math.min(math.max(math.floor(v).toLong, 0L), nBins - 1L)
    val ca = a.groupBy(binOf).view.mapValues(_.size.toLong).toMap
    val cb = b.groupBy(binOf).view.mapValues(_.size.toLong).toMap
    val (ta, tb) = (a.size.toLong, b.size.toLong)
    (0L until nBins).scanLeft((0L, 0L, 0L, 0L, 0L, 0L)) {
      case ((_, _, _, pa, pb, _), bin) =>
        val na = ca.getOrElse(bin, 0L); val nb = cb.getOrElse(bin, 0L)
        (bin, na, nb, pa + na, pb + nb,
          math.abs((pa + na) * tb - (pb + nb) * ta))
    }.drop(1)
  }

  test("w1 table == brute force with empty and clamped bins") {
    val a = Seq(0.5, 0.5, 2.5, 7.5, 99.0) // 99 clamps to the last bin
    val b = Seq(1.5, 2.5, 2.5, -3.0)      // -3 clamps to bin 0
    assert(run(a, b, 10).toSeq === brute(a, b, 10))
  }

  test("last bin term is 0; farther shift strictly grows W1") {
    def w1(a: Seq[Double], b: Seq[Double]) = run(a, b, 10).map(_._6).sum
    val base = Seq(1.5, 1.5, 1.5, 1.5)
    assert(run(base, base.map(_ + 1.0), 10).last._6 === 0L)
    val near = w1(base, base.map(_ + 1.0)) // one-bin shift
    val far = w1(base, base.map(_ + 6.0))  // six-bin shift
    assert(near > 0L)
    assert(far === 6L * near)
  }
}
