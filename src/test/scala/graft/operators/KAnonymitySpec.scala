package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KAnonymitySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    // (segment, nation) groups: (A,1) x3, (A,2) x1, (B,1) x2
    ("A", 1, "r1"), ("A", 1, "r2"), ("A", 1, "r3"),
    ("A", 2, "r4"),
    ("B", 1, "r5"), ("B", 1, "r6")).toDF("seg", "nat", "id")

  test("violations lists exactly the under-k combinations") {
    val out = KAnonymity.violations(rows, Seq("seg", "nat"), k = 3L)
      .orderBy("seg", "nat").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(("A", 2, 1L), ("B", 1, 2L)))
  }

  test("k equal to the smallest group size clears the audit") {
    val out = KAnonymity.violations(rows, Seq("seg"), k = 2L).collect()
    assert(out.isEmpty) // seg groups: A x4, B x2 — all >= 2
  }

  test("summary reports the table's true anonymity level") {
    val s = KAnonymity.summary(rows, Seq("seg", "nat"), k = 3L).head()
    assert(s.getLong(0) === 6L) // rows
    assert(s.getLong(1) === 3L) // groups
    assert(s.getLong(2) === 2L) // violating groups
    assert(s.getLong(3) === 3L) // exposed rows
    assert(s.getLong(4) === 1L) // min group = the actual k level
  }

  test("null quasi-identifier values form their own group") {
    val withNull = Seq(("A", Some(1)), ("A", None), ("A", None))
      .toDF("seg", "nat")
    val out = KAnonymity.violations(withNull, Seq("seg", "nat"), k = 3L)
      .collect().map(r => (r.isNullAt(1), r.getLong(2))).toSeq
    assert(out.contains((true, 2L)) && out.contains((false, 1L)))
  }
}
