package graft.operators

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Seasonality.profile]] vs an in-memory replay: modular phase
  * bucketing, closed-form calendar-day denominators on sparse
  * calendars, and the exact ppm indices.
  */
class SeasonalitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tsOfDay(day: Long, hour: Int): Timestamp =
    new Timestamp((day * 86400L + hour * 3600L) * 1000L)

  test("profile == brute force on a sparse two-group calendar") {
    import spark.implicits._
    // group "a": days 20000..20016 skipping phases; "b": single day
    val rows = Seq(
      ("a", 20000L, 3), ("a", 20001L, 1), ("a", 20008L, 2),
      ("a", 20014L, 5), ("a", 20016L, 1), ("b", 20005L, 4))
      .flatMap { case (g, d, n) => (0 until n).map(i => (g, tsOfDay(d, i))) }
    val df = rows.toDF("grp", "ts")
    val got = Seasonality.profile(df, Seq("grp"), col("ts"), period = 7)
      .orderBy("grp", "phase").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    val mind = 20000L; val maxd = 20016L; val span = maxd - mind + 1
    def calDays(phase: Long): Long = {
      val first = mind + (((phase - mind % 7) % 7 + 7) % 7)
      if (first > maxd) 0L else (maxd - first) / 7 + 1
    }
    val daily = Seq(("a", 20000L, 3L), ("a", 20001L, 1L), ("a", 20008L, 2L),
      ("a", 20014L, 5L), ("a", 20016L, 1L), ("b", 20005L, 4L))
    val totals = daily.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = daily.groupBy(d => (d._1, d._2 % 7)).toSeq
      .map { case ((g, ph), ds) =>
        val n = ds.map(_._3).sum
        val cd = calDays(ph)
        (g, ph, n, ds.size.toLong, cd,
          1000000L * n / cd, 1000000L * n * span / (cd * totals(g)))
      }
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("dailyAnomalies: burst day flags SPIKE against its own phase") {
    import spark.implicits._
    // phase-0 days carry 2 events, except one burst day with 8;
    // a phase-3 day with 3 events is normal FOR ITS PHASE
    val rows =
      Seq((21000L, 2), (21007L, 2), (21014L, 8), (21021L, 2),
        (21003L, 3), (21010L, 3))
        .flatMap { case (d, n) => (0 until n).map(i => ("g", tsOfDay(d, i))) }
    val got = Seasonality.dailyAnomalies(rows.toDF("grp", "ts"), Seq("grp"),
        col("ts"), period = 7, loPpm = 700000L, hiPpm = 1600000L)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getString(5)))
    // phase 0: total 14 over 4 cal days -> mean 3.5/day; burst 8 ->
    // ratio 8*4e6/14 = 2285714 SPIKE; quiet days 2*4e6/14 = 571428 DROP
    assert(got.toSeq === Seq(
      (21000L, 2L, "DROP"), (21003L, 3L, "QUIET"), (21007L, 2L, "DROP"),
      (21010L, 3L, "QUIET"), (21014L, 8L, "SPIKE"), (21021L, 2L, "DROP")))
  }

  test("phase counts over a full dense week are uniform") {
    import spark.implicits._
    val df = (0 until 70).map(i => ("g", tsOfDay(21000L + i % 14, 0)))
      .toDF("grp", "ts")
    val r = Seasonality.profile(df, Seq("grp"), col("ts"), period = 7)
      .collect()
    assert(r.length === 7)
    // 14-day span: every phase has cal_days 2, 10 events, flat index
    assert(r.forall(_.getAs[Long]("cal_days") == 2L))
    assert(r.forall(_.getAs[Long]("n_events") == 10L))
    assert(r.forall(_.getAs[Long]("season_ppm") == 1000000L))
  }
}
