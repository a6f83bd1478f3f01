package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[LiftCurve.deciles]] vs an in-memory replay: exact rank buckets,
  * ppm ratios, and the lift identities (last-bucket cumulative lift =
  * 1e6; a perfect scorer's top bucket lift = total/positives).
  */
class LiftCurveSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(Long, Long, Long)], n: Int) = {
    import spark.implicits._
    LiftCurve.deciles(rows.toDF("id", "score", "label"),
        "id", "score", "label", n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
  }

  private def brute(rows: Seq[(Long, Long, Long)], n: Int) = {
    val ranked = rows.sortBy { case (id, s, _) => (-s, id) }.zipWithIndex
    val per = ranked.groupBy { case (_, rk) => rk.toLong * n / rows.size }
      .toSeq.sortBy(_._1)
      .map { case (b, rs) =>
        (b, rs.size.toLong, rs.map(_._1._3).sum)
      }
    val tn = rows.size.toLong
    val tp = rows.map(_._3).sum
    per.scanLeft((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)) {
      case ((_, _, _, _, cn, cp, _, _), (b, bn, bp)) =>
        val ncn = cn + bn; val ncp = cp + bp
        (b, bn, bp, 1000000L * bp / bn, ncn, ncp,
          1000000L * ncp / ncn, 1000000L * ncp * tn / (ncn * tp))
    }.drop(1)
  }

  test("deciles == brute force on an imperfect scorer") {
    // 40 items; label correlates with score but with noise
    val rows = (0 until 40).map { i =>
      (i.toLong, ((i * 13) % 40).toLong, if ((i * 13) % 40 >= 25 ^ (i % 7 == 0)) 1L else 0L)
    }
    assert(run(rows, 10).toSeq === brute(rows, 10))
  }

  test("perfect scorer: monotone rates, last cum lift exactly 1e6") {
    val rows = (0 until 30).map(i =>
      (i.toLong, (100 - i).toLong, if (i < 6) 1L else 0L))
    val got = run(rows, 10)
    assert(got.toSeq === brute(rows, 10))
    val rates = got.map(_._4)
    assert(rates.sameElements(rates.sortBy(-_)))
    assert(got.last._8 === 1000000L)
    // top bucket holds only positives: lift = tn/tp = 30/6
    assert(got.head._8 === 1000000L * 30 / 6)
  }
}
