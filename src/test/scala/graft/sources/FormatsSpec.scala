package graft.sources

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-trip the real testdata through every supported format and
  * prove the values survive (and that ORC keeps filter pushdown).
  */
class FormatsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private lazy val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")

  test("CSV round-trip with explicit schema preserves values") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(nation, s"$dir/nation")
    val back = Formats.readCsv(spark, s"$dir/nation", nation.schema)
    assert(back.schema === nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON round-trip with explicit schema preserves values") {
    val dir = Files.createTempDirectory("graft-json").toString
    Formats.writeJson(nation, s"$dir/nation")
    val back = Formats.readJson(spark, s"$dir/nation", nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC round-trip preserves values and pushes filters") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(nation, s"$dir/nation")
    val back = Formats.readOrc(spark, s"$dir/nation")
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      nation.orderBy("n_nationkey").collect().toSeq)
    val filtered = back.filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      "ORC scan must push the filter:\n" + plan)
  }

  test("partitioned parquet: filters on partition columns PRUNE, not filter") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("graft-part").toString
    Formats.writePartitioned(docs, s"$dir/docs", Seq("source"))
    val back = Formats.readPartitioned(spark, s"$dir/docs")
    val one = back.filter(col("source") === "src3")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src3"),
      s"expected the source filter as a partition filter:\n$plan")
    // pruning is planning-time: the scan must not carry source as a
    // pushed DATA filter (it's a directory, not a column, in this layout)
    assert(plan.contains("DataFilters: []") && plan.contains("PushedFilters: []"),
      s"source leaked into data filters:\n$plan")
    assert(one.count() === docs.filter(col("source") === "src3").count())
    // values survive the round trip (partition col is re-attached)
    assert(back.count() === docs.count())
  }

  test("all-string CSV read matches the reference's input model") {
    val dir = Files.createTempDirectory("graft-csvs").toString
    Formats.writeCsv(nation, s"$dir/nation")
    val back = Formats.readCsvAllString(spark, s"$dir/nation")
    assert(back.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.StringType))
    assert(back.count() === nation.count())
  }
}
