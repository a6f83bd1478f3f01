package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Relational extensions that can't (or shouldn't) be DuckDB-hash-
  * checked: approximate sketches differ per engine implementation, so
  * they are verified against exact counts with the sketch's own error
  * bound instead.
  */
class RelationalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL) lands within its rsd bound of exact") {
    val ord = Tables.load(spark, dir, "orders")
    val Seq(exact, approx) = ord.agg(
        countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    // 0.02 rsd ≈ 2% standard error; 5 sigma of slack keeps this
    // deterministic-in-practice while still meaningful
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("approx percentile sketch brackets the exact percentiles") {
    val li = Tables.load(spark, dir, "lineitem")
    // accuracy 10000 ⇒ rank error ≤ n/10000; bracket each approx value
    // between the exact percentiles one rank-percent either side
    val row = li.agg(
      percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.95)),
        lit(10000)).as("approx"),
      expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51))").as("e50"),
      expr("percentile(l_extendedprice, array(0.94, 0.95, 0.96))").as("e95")
    ).head()
    val approx = row.getSeq[Double](0)
    val e50 = row.getSeq[Double](1)
    val e95 = row.getSeq[Double](2)
    assert(approx(0) >= e50.head && approx(0) <= e50.last,
      s"p50 approx ${approx(0)} outside [${e50.head}, ${e50.last}]")
    assert(approx(1) >= e95.head && approx(1) <= e95.last,
      s"p95 approx ${approx(1)} outside [${e95.head}, ${e95.last}]")
  }

  test("rollup subtotals are consistent with the detail rows") {
    val rows = Relational.qRollup(spark, dir).collect()
    val detail = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length === 1)
    assert(grand.head.getLong(4) === detail.map(_.getLong(4)).sum)
    // per-flag subtotals equal the sum of their detail rows
    val perFlag = rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    perFlag.foreach { sub =>
      val f = sub.getString(0)
      assert(sub.getLong(4) ===
        detail.filter(_.getString(0) == f).map(_.getLong(4)).sum)
    }
  }

  test("percentiles: rank-picked values match a driver-side sort") {
    val rows = Relational.qPercentiles(spark, dir).collect()
    val ev = Tables.loadEvents(spark, dir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val vals = ev(r.getString(0))
      assert(r.getLong(1) === vals.length.toLong)
      def disc(p: Double) = vals(math.ceil(p * vals.length).toInt - 1)
      assert(r.getDouble(2) === disc(0.5), s"${r.getString(0)} p50")
      assert(r.getDouble(3) === disc(0.9), s"${r.getString(0)} p90")
      assert(r.getDouble(4) === disc(0.99), s"${r.getString(0)} p99")
    }
  }

  test("retention: week 0 is exactly 1.0 per cohort, later weeks never exceed it") {
    val rows = TemporalQueries.qRetention(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getDouble(4)))
    assert(rows.nonEmpty)
    val cohorts = rows.map(_._1).distinct
    cohorts.foreach { c =>
      val mine = rows.filter(_._1 == c)
      // the signup event itself is week-0 activity for every member
      assert(mine.find(_._2 == 0).exists(_._3 == 1.0),
        s"cohort $c week-0 retention must be 1.0")
      assert(mine.forall(_._3 <= 1.0))
    }
  }

  test("set ops partition: both + urgent_only = distinct urgent customers") {
    val ord = Tables.load(spark, dir, "orders")
    val urgentDistinct = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val tags = Relational.qSetOps(spark, dir)
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags.getOrElse("both", 0L) + tags.getOrElse("urgent_only", 0L)
      === urgentDistinct)
  }
}
