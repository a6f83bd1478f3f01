package graft.expressions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Every native expression is reachable from plain SQL text through
  * `GraftExtensions` — the Column API must not be the only door.
  */
class SqlRegistrationSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  Seq((1L, "The quick the QUICK fox")).toDF("id", "t")
    .createOrReplaceTempView("sql_reg_in")

  test("token_runs parses and runs from SQL") {
    val r = spark.sql("SELECT token_runs(t) FROM sql_reg_in").head
    assert(r.getSeq[String](0) === Seq("the", "quick", "the", "quick", "fox"))
  }

  test("word_shingles parses from SQL, distinct flag honored") {
    val d = spark.sql("SELECT word_shingles(t, 2) FROM sql_reg_in").head
    assert(d.getSeq[String](0) ===
      Seq("the quick", "quick the", "the quick", "quick fox").distinct)
    val a = spark.sql("SELECT word_shingles(t, 2, false) FROM sql_reg_in").head
    assert(a.getSeq[String](0) ===
      Seq("the quick", "quick the", "the quick", "quick fox"))
  }

  test("char_shingles parses and runs from SQL") {
    val r = spark.sql("SELECT char_shingles('AbÉd', 2)").head
    assert(r.getSeq[String](0) === Seq("ab", "bé", "éd"))
  }

  test("rolling_fingerprint matches the Column-API form") {
    val sql = spark.sql("SELECT rolling_fingerprint(t) FROM sql_reg_in")
      .head.getLong(0)
    val api = Seq("The quick the QUICK fox").toDF("t")
      .select(graft.text.Fingerprint.rollingHash(
        org.apache.spark.sql.functions.col("t"))).head.getLong(0)
    assert(sql === api)
  }

  test("apply_merge parses from SQL; non-literal rule is rejected") {
    val r = spark.sql("SELECT apply_merge('a a a', 'a', 'a')").head
    assert(r.getString(0) === "aa a")
    intercept[Exception](
      spark.sql("SELECT apply_merge(t, t, 'b') FROM sql_reg_in").collect())
  }
}
