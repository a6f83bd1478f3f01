package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TheilSen.fit]] vs an in-memory replay, plus the robustness
  * property that motivates it: one outlier point moves OLS, not the
  * median slope.
  */
class TheilSenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(pts: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    TheilSen.fit(pts.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
  }

  private def brute(pts: Seq[(String, Long, Long)]) =
    pts.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, ps) =>
      val pairs = for {
        (_, xa, ya) <- ps; (_, xb, yb) <- ps if xa < xb
      } yield (yb - ya, xb - xa)
      if (pairs.isEmpty) None
      else {
        val sorted = pairs.sortBy { case (n, d) => (n.toDouble / d, n, d) }
        val (num, den) = sorted((pairs.size + 1) / 2 - 1)
        Some((g, ps.map(_._2).distinct.size.toLong, pairs.size.toLong,
          num, den, math.floor(1000000.0 * num / den).toLong))
      }
    }

  test("median slope == brute force on mixed groups") {
    val pts = Seq[(String, Long, Long)](
      ("a", 0L, 10L), ("a", 1L, 12L), ("a", 2L, 14L), ("a", 5L, 20L),
      ("b", 3L, 7L), ("b", 9L, 4L), ("b", 11L, 2L), ("b", 20L, 1L),
      ("c", 4L, 5L)) // single point: no pairs, drops out
    assert(run(pts).toSeq === brute(pts))
    assert(!run(pts).exists(_._1 == "c"))
  }

  test("one outlier day leaves the median slope at the true trend") {
    // y = 3x exactly, except one corrupted day
    val clean = (0L until 12L).map(x => ("g", x, 3 * x))
    val dirty = clean.updated(6, ("g", 6L, 1000L))
    val got = run(dirty)
    assert(got.head._6 === 3000000L) // slope_q = 3.0 exactly
    assert(run(clean).head._6 === 3000000L)
  }
}
