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
