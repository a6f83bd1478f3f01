package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.GraftExtensions]] table-valued functions: the table
  * format as plain SQL text. Cross-engine correctness is the
  * `table_sql_tvf` gate's; this spec pins the argument contract and
  * the history surface.
  */
class TvfSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tvf_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  test("cow_table reads, time-travels, and joins like any relation") {
    withTable { t =>
      CowTable.create(spark, t,
        Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s"), Seq("k"))
      CowTable.append(spark, t, Seq((3L, 30L, "c")).toDF("k", "v", "s"))
      assert(spark.sql(s"SELECT count(*) FROM cow_table('$t')")
        .collect()(0).getLong(0) === 3L)
      assert(spark.sql(s"SELECT count(*) FROM cow_table('$t', 1)")
        .collect()(0).getLong(0) === 2L)
      // a TVF result is a full relation: joins and filters compose
      val j = spark.sql(
        s"""SELECT a.k FROM cow_table('$t') a
           |JOIN cow_table('$t', 1) b ON a.k = b.k
           |WHERE a.v >= 20 ORDER BY a.k""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(j === Seq(2L))
      // provenance as SQL: the appended row traces to commit 2
      val pv = spark.sql(
        s"""SELECT _commit_version FROM cow_table_provenance('$t')
           |WHERE k = 3""".stripMargin).collect()(0).getLong(0)
      assert(pv === 2L)
    }
  }

  test("cow_table AS OF TIMESTAMP: a string second argument resolves " +
      "through the commit audit stamps") {
    withTable { t =>
      CowTable.create(spark, t,
        Seq((1L, 10L, "a")).toDF("k", "v", "s"), Seq("k"))
      Thread.sleep(15)
      CowTable.append(spark, t, Seq((2L, 20L, "b")).toDF("k", "v", "s"))
      val ts1 = TxLog.commitAt(spark, t, 1L).ts.get
      val s1 = java.time.Instant.ofEpochMilli(ts1)
        .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(spark.sql(s"SELECT count(*) FROM cow_table('$t', '$s1')")
        .collect()(0).getLong(0) === 1L)
      // far future resolves to the head; prehistory is loud
      assert(spark.sql(
        s"SELECT count(*) FROM cow_table('$t', '2999-01-01 00:00:00')")
        .collect()(0).getLong(0) === 2L)
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT count(*) FROM cow_table('$t', '1999-01-01 00:00:00')")
          .collect()
      }
      assert(e.getMessage.contains("predates"), e.getMessage)
    }
  }

  test("cow_table_files surfaces the manifest (zone maps queryable)") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(100).select(col("id").as("k"), (col("id") % 3).as("v"))
          .repartitionByRange(4, col("k")), Seq("k"))
      CowTable.append(spark, t, Seq((500L, 1L)).toDF("k", "v"))
      val head = spark.sql(
        s"SELECT count(*), sum(rows) FROM cow_table_files('$t')").head()
      assert(head.getLong(0) === 5L && head.getLong(1) === 101L)
      // time-traveled manifest + zone maps as plain SQL
      val v1 = spark.sql(
        s"""SELECT max(CAST(stats['k'].max AS BIGINT))
           |FROM cow_table_files('$t', 1)""".stripMargin).head()
      assert(v1.getLong(0) === 99L)
    }
  }

  test("cow_table_history is a queryable relation; bad args are loud") {
    withTable { t =>
      CowTable.create(spark, t, Seq((1L, 1L, "a")).toDF("k", "v", "s"),
        Seq("k"))
      CowTable.append(spark, t, Seq((2L, 2L, "b")).toDF("k", "v", "s"))
      val ops = spark.sql(
        s"SELECT op FROM cow_table_history('$t') ORDER BY version")
        .collect().map(_.getString(0)).toSeq
      assert(ops === Seq("create", "append"))
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM cow_table('$t', 1, 2, 3)").collect()
      }
      assert(e.getMessage.contains("cow_table"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM cow_table(k)").collect()
      }
      assert(e2.getMessage.nonEmpty)
    }
  }
}
