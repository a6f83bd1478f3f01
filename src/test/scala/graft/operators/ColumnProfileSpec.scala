package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ColumnProfileSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("counts, nulls, distincts, lexicographic min/max per column") {
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, None, Some(2.5)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(10.0))
    ).toDF("id", "s", "d")
    val got = ColumnProfile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq === Seq(
      // lexicographic: "10.0" < "2.5"
      ("d", 4L, 1L, 2L, "10.0", "2.5"),
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("column subset + all-null column") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val got = ColumnProfile.profile(df, Seq("s")).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("adversarial column names: quotes, backticks, dots stay data") {
    val df = Seq((1L, "x"), (2L, "x"))
      .toDF("it's", "a`b.c")
    val got = ColumnProfile.profile(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq(("a`b.c", 2L, 1L), ("it's", 2L, 2L)))
  }

  test("no Expand in the plan (the multi-countDistinct trap)") {
    val df = Seq((1L, "a", 2.0)).toDF("a", "b", "c")
    val plan = ColumnProfile.profile(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"profile must not expand rows per aggregate:\n$plan")
  }
}
