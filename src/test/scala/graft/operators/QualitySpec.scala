package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-by-rule semantics of the data-quality engine on crafted
  * inputs: exact violation counts, the null conventions (range/regex
  * skip nulls, FK follows SQL semantics), and the one-scan plan shape.
  */
class QualitySpec extends AnyFunSuite {
  import Quality._

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map(r => r.getAs[String]("rule_id") ->
      ((r.getAs[Long]("violations"), r.getAs[Long]("total"),
        r.getAs[Boolean]("pass")))).toMap

  test("single-table rules: exact counts, nulls skipped by range/regex") {
    val df = Seq(
      (Some(1L), Some("a-1"), Some(5.0)),
      (Some(2L), Some("a-2"), Some(15.0)),  // range violation
      (Some(2L), None, Some(5.0)),          // dup id, null label
      (None, Some("zzz"), None))            // null id, bad format, null v
      .toDF("id", "label", "v")
    val got = rows(check(df, "t", Seq(
      Unique("u", Seq("id")),
      NotNull("nn", "id"),
      InRange("r", "v", "0", "10"),
      Matches("m", "label", "^a-"))))
    // 4 rows − 2 distinct NON-NULL ids: the dup AND the null id are
    // surplus (count_distinct skips nulls — the documented reason
    // Unique wants NotNull alongside it)
    assert(got("u") == ((2L, 4L, false)))
    assert(got("nn") == ((1L, 4L, false)))
    // null v is NOT a range violation; 15.0 is
    assert(got("r") == ((1L, 4L, false)))
    // null label is NOT a format violation; "zzz" is
    assert(got("m") == ((1L, 4L, false)))
  }

  test("foreign key: null child key is not a violation, missing parent is") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 2L).toDF("pk") // dup parent keys must not multiply
    val got = rows(foreignKey(child, "c", "fk", parent, "p", "pk", "fk_rule"))
    assert(got("fk_rule") == ((1L, 4L, false)))
  }

  test("all-green table passes; report is ordered and unioned") {
    val a = check(Seq((1L, "x")).toDF("id", "s"), "beta",
      Seq(NotNull("b_nn", "id")))
    val b = check(Seq((1L, "x")).toDF("id", "s"), "alpha",
      Seq(NotNull("a_nn", "id"), Unique("a_u", Seq("id"))))
    val rep = report(Seq(a, b)).collect()
    assert(rep.map(_.getAs[String]("rule_id")).toSeq ==
      Seq("a_nn", "a_u", "b_nn"))
    assert(rep.forall(_.getAs[Boolean]("pass")))
  }

  test("empty table: zero totals, sum-based rules still pass") {
    val df = Seq.empty[(Option[Long], Option[String])].toDF("id", "s")
    val got = rows(check(df, "t", Seq(
      NotNull("nn", "id"), Unique("u", Seq("id")))))
    assert(got("nn") == ((0L, 0L, true)) && got("u") == ((0L, 0L, true)))
  }

  test("several Unique rules on one table are rejected (Expand guard)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      check(df, "t", Seq(Unique("u1", Seq("a")), Unique("u2", Seq("b"))))
    }
  }
}
