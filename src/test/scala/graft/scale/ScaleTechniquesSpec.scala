package graft.scale

import graft.SparkTestSession
import graft.operators.Salting
import graft.queries.Tables
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two write/plan-level scale techniques: bucketed co-located joins
  * (zero-shuffle recurring joins) and deterministic key salting (skew).
  * Both are asserted at the PLAN level, not just on results — the plan
  * shape is the point.
  */
class ScaleTechniquesSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with no exchange above either scan") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    // force the sort-merge path: at test scale the planner would rather
    // broadcast the small side (and skip bucketed scans entirely); the
    // 100 TB case this technique exists for is two fact tables neither
    // of which broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan)
      assert(plan.contains("Bucketed: true"),
        "scans must actually use the bucket layout:\n" + plan)
      // same result as the plain (shuffling) join
      assert(joined.count() === orders.join(li, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted aggregation equals plain aggregation on skewed data") {
    // 90% of rows share one key — the shape that melts a single reducer
    val skewed = (1 to 2000).map { i =>
      (if (i <= 1800) "hot" else s"key${i % 50}", i.toDouble, i.toLong)
    }.toDF("k", "v", "carrier")

    val salted = Salting.saltedSumCount(skewed, col("k"), col("v"),
        saltBuckets = 8, carrier = col("carrier"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = skewed.groupBy(col("k").as("key"))
      .agg(sum(col("v")).as("sum"), count(lit(1)).as("cnt"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted join equals plain join and spreads the hot key") {
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 20, i))
      .toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (5L, "five"))
      .toDF("k", "name")

    val salted = Salting.saltedJoin(big, small, "k", 8, col("payload"))
    val plain = big.join(small, "k")
    assert(salted.count() === plain.count())
    assert(salted.select(sum(col("payload"))).head().getLong(0) ===
      plain.select(sum(col("payload"))).head().getLong(0))

    // the hot key really is spread: its rows carry several distinct salts
    val saltSpread = big.withColumn("__salt",
        Salting.saltCol(8, col("payload")))
      .filter(col("k") === 1L)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(saltSpread > 1)
  }
}
