package graft.plans

import graft.SparkTestSession
import graft.plans.SummaryCatalog.Measure
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

class SummaryRewriteSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val base = "/root/testdata/sf0.001/lineitem.parquet"
  private val sumPath =
    s"${System.getProperty("java.io.tmpdir")}/graft_mv_spec/lineitem_rfls"
  private val dec = DecimalType(18, 2)

  private def buildSummary(): Unit =
    SummaryCatalog.build(spark, base, sumPath,
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(
        Measure("count", ""),
        Measure("sum", "l_quantity", Some(dec)),
        Measure("min", "l_shipdate"), Measure("max", "l_shipdate")))

  private def baseQuery() = spark.read.parquet(base)
    .groupBy("l_returnflag", "l_linestatus")
    .agg(
      sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
      count(lit(1)).as("n"),
      min(col("l_shipdate")).as("first_ship"))
    .orderBy("l_returnflag", "l_linestatus")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    // executedPlan: the FileScan node prints its Location (the logical
    // Relation node does not), so the assertions can see WHICH table
    // the rewritten plan actually reads
    df.queryExecution.executedPlan.toString

  test("covered aggregate routes to the summary with identical answers") {
    SummaryCatalog.clear()
    val direct = baseQuery().collect().map(_.toString).toSeq
    buildSummary()
    val routed = baseQuery()
    assert(planOf(routed).contains("graft_mv_spec"), planOf(routed))
    assert(!planOf(routed).contains("lineitem.parquet"), planOf(routed))
    assert(routed.collect().map(_.toString).toSeq === direct)
    SummaryCatalog.clear()
  }

  test("strict key subsets roll the summary up further, globals too") {
    // a Dataset caches its QueryExecution once forced — every probe
    // below REBUILDS the frame so planning sees the current registry
    SummaryCatalog.clear()
    def byFlag() = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("q"))
      .orderBy("l_returnflag")
    def global() = spark.read.parquet(base)
      .agg(count(lit(1)).as("n"), max(col("l_shipdate")).as("last"))
    val (d1, d2) = (byFlag().collect().map(_.toString).toSeq,
      global().collect().map(_.toString).toSeq)
    buildSummary()
    assert(planOf(byFlag()).contains("graft_mv_spec"))
    assert(planOf(global()).contains("graft_mv_spec"))
    assert(byFlag().collect().map(_.toString).toSeq === d1)
    assert(global().collect().map(_.toString).toSeq === d2)
    SummaryCatalog.clear()
  }

  test("post-aggregation arithmetic rewrites inside (derived average)") {
    SummaryCatalog.clear()
    def avg() = spark.read.parquet(base).groupBy("l_returnflag")
      .agg((sum(col("l_quantity").cast(dec)).cast("double") /
        count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag")
    val d = avg().collect().map(_.toString).toSeq
    buildSummary()
    assert(planOf(avg()).contains("graft_mv_spec"))
    assert(avg().collect().map(_.toString).toSeq === d)
    SummaryCatalog.clear()
  }

  test("anything not contained stays on the base table") {
    buildSummary()
    // a filter between aggregate and scan
    val filtered = spark.read.parquet(base)
      .filter(col("l_quantity") > 10).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
    assert(!planOf(filtered).contains("graft_mv_spec"))
    // an unregistered measure
    val otherSum = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast(dec)).as("s"))
    assert(!planOf(otherSum).contains("graft_mv_spec"))
    // a raw double sum (exactness discipline: not even the registered
    // column without its decimal cast)
    val rawSum = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"))
    assert(!planOf(rawSum).contains("graft_mv_spec"))
    // grouping outside the key set
    val otherKey = spark.read.parquet(base).groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"))
    assert(!planOf(otherKey).contains("graft_mv_spec"))
    // DISTINCT aggregates
    val distinctAgg = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n"))
    assert(!planOf(distinctAgg).contains("graft_mv_spec"))
    SummaryCatalog.clear()
  }

  test("incremental append == rebuild; routing stays exact as data grows") {
    SummaryCatalog.clear()
    val tmp = System.getProperty("java.io.tmpdir")
    val p1 = s"$tmp/graft_mv_spec/base_gen1"
    val sp = s"$tmp/graft_mv_spec/lineitem_incr"
    val full = spark.read.parquet(base)
    full.filter(col("l_orderkey") % 3 =!= 0).write.mode("overwrite").parquet(p1)
    val summary = SummaryCatalog.build(spark, p1, sp,
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(Measure("count", ""),
        Measure("sum", "l_quantity", Some(dec)),
        Measure("max", "l_shipdate")))
    SummaryCatalog.append(spark, summary,
      full.filter(col("l_orderkey") % 3 === 0))
    // the folded summary must equal a from-scratch aggregation of the
    // WHOLE base, row for row
    val folded = spark.read.parquet(sp)
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    val rebuilt = full.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(dec)).as("sum_l_quantity"),
        max(col("l_shipdate")).as("max_l_shipdate"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    assert(folded === rebuilt)
    // and routing the grown base through the maintained summary is
    // still hash-identical to the direct aggregate
    SummaryCatalog.register(spark, SummaryCatalog.Summary(base, sp,
      summary.keys, summary.measures))
    def q() = spark.read.parquet(base).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("q"))
      .orderBy("l_returnflag")
    assert(planOf(q()).contains("lineitem_incr"))
    SummaryCatalog.clear()
    val direct = q().collect().map(_.toString).toSeq
    SummaryCatalog.register(spark, SummaryCatalog.Summary(base, sp,
      summary.keys, summary.measures))
    assert(q().collect().map(_.toString).toSeq === direct)
    SummaryCatalog.clear()
  }

  test("catalog refuses a raw double sum measure") {
    intercept[IllegalArgumentException] {
      SummaryCatalog.build(spark, base, sumPath + "_bad",
        keys = Seq("l_returnflag"),
        measures = Seq(Measure("sum", "l_quantity")))
    }
  }

  test("register() also refuses a castless double sum (restore path)") {
    SummaryCatalog.clear()
    val sp = s"${System.getProperty("java.io.tmpdir")}/graft_mv_spec/dbl_sum"
    // a summary parquet whose sum column is DOUBLE — re-summing it is
    // order-dependent, so direct registration must refuse it even
    // though the Measure carries no cast (the r9 vacuous-check hole)
    spark.read.parquet(base).groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sum_l_quantity"))
      .write.mode("overwrite").parquet(sp)
    intercept[IllegalArgumentException] {
      SummaryCatalog.register(spark, SummaryCatalog.Summary(base, sp,
        Seq("l_returnflag"), Seq(Measure("sum", "l_quantity"))))
    }
    assert(SummaryCatalog.lookup(base).isEmpty)
  }

  test("rebuild while registered does not route the build to its own output") {
    SummaryCatalog.clear()
    buildSummary() // gen 1: registers base -> sumPath
    // gen 2: the build's internal groupBy matches the registered
    // summary exactly; without routing suspension SummaryRewrite would
    // read sumPath while mode(overwrite) deletes it. The rebuilt
    // summary must equal a direct base aggregation, proving it
    // re-scanned the BASE.
    buildSummary()
    val rebuilt = spark.read.parquet(sumPath)
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq
    SummaryCatalog.clear()
    val direct = spark.read.parquet(base)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(dec)).as("sum_l_quantity"),
        min(col("l_shipdate")).as("min_l_shipdate"),
        max(col("l_shipdate")).as("max_l_shipdate"))
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq
    assert(rebuilt === direct)
  }

  test("append with a bare base-scan batch does not route to the summary") {
    SummaryCatalog.clear()
    val tmp = System.getProperty("java.io.tmpdir")
    val sp = s"$tmp/graft_mv_spec/self_append"
    val summary = SummaryCatalog.build(spark, base, sp,
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(Measure("count", ""),
        Measure("sum", "l_quantity", Some(dec))))
    // base stays REGISTERED and the batch is a bare scan of it — the
    // r9 hazard: batchAgg matches the summary and would be routed to
    // sp mid-overwrite. With suspension, append folds the full base in
    // a second time, so every count/sum exactly doubles.
    SummaryCatalog.append(spark, summary, spark.read.parquet(base))
    val doubled = spark.read.parquet(sp)
      .orderBy("l_returnflag", "l_linestatus").collect()
    // the registration survives the append (restored after write)
    assert(SummaryCatalog.lookup(base).isDefined)
    SummaryCatalog.clear()
    val single = spark.read.parquet(base)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(dec)).as("sum_l_quantity"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(doubled.length === single.length)
    doubled.zip(single).foreach { case (d, s) =>
      assert(d.getLong(d.fieldIndex("cnt")) ===
        2L * s.getLong(s.fieldIndex("cnt")))
      assert(d.getDecimal(d.fieldIndex("sum_l_quantity")) ===
        s.getDecimal(s.fieldIndex("sum_l_quantity")).add(
          s.getDecimal(s.fieldIndex("sum_l_quantity"))))
    }
    SummaryCatalog.clear()
  }
}
