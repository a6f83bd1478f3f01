package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileDiffSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("flags ADDED / REMOVED / DRIFT / NODIFF across schema evolution") {
    val s1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("id", "tag", "gone")
    // id identical; tag loses its null (null count drifts); `gone`
    // dropped; `fresh` added
    val s2 = Seq((1L, "a", true), (2L, "b", true), (3L, "c", true))
      .toDF("id", "tag", "fresh")
    val got = ProfileDiff.compare(s1, s2).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(
      ("fresh", "ADDED"), ("gone", "REMOVED"),
      ("id", "NODIFF"), ("tag", "DRIFT")))
  }

  test("range-only movement flags DRIFT and sets range_changed") {
    // same counts/nulls/distincts, max moves: "c" -> "d"
    val s1 = Seq("a", "c").toDF("v")
    val s2 = Seq("a", "d").toDF("v")
    val r = ProfileDiff.compare(s1, s2).collect().head
    assert(r.getString(1) === "DRIFT")
    assert(r.getBoolean(8))
  }

  test("one-sided columns carry null stats and null range_changed") {
    val s1 = Seq(Tuple1("x")).toDF("only1")
    val s2 = Seq(Tuple1("y")).toDF("only2")
    val rows = ProfileDiff.compare(s1, s2).orderBy("col_name").collect()
    val added = rows.find(_.getString(0) == "only2").get
    assert(added.getString(1) === "ADDED")
    assert(added.isNullAt(2) && added.isNullAt(4) && added.isNullAt(6))
    assert(added.isNullAt(8))
    val removed = rows.find(_.getString(0) == "only1").get
    assert(removed.getString(1) === "REMOVED")
    assert(removed.isNullAt(3) && removed.isNullAt(8))
  }

  test("row-count-only drift still flags (documented contract)") {
    val s1 = Seq("a", "a").toDF("v")
    val s2 = Seq("a", "a", "a").toDF("v")
    val r = ProfileDiff.compare(s1, s2).collect().head
    assert(r.getString(1) === "DRIFT")
    assert(!r.getBoolean(8)) // range identical
  }

  test("driftedColumns hands exactly the DRIFT set to the row diff") {
    val s1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("id", "tag", "gone")
    val s2 = Seq((1L, "a", true), (2L, "b", true), (3L, "c", true))
      .toDF("id", "tag", "fresh")
    assert(ProfileDiff.driftedColumns(ProfileDiff.compare(s1, s2))
      === Seq("tag"))
  }

  test("plan shape: no raw-table join, fixed-width distinct melt") {
    val s1 = Seq((1L, "a")).toDF("id", "s")
    val s2 = Seq((1L, "a")).toDF("id", "s")
    val qe = ProfileDiff.compare(s1, s2).queryExecution
    val plan = qe.executedPlan.toString
    // the three summary sources meet through one union + per-column
    // fold — no join survives in the plan at all, summary or raw
    assert(!"(?i)join".r.findFirstIn(plan).isDefined,
      s"profile comparison must not join:\n$plan")
    assert(!plan.contains("Expand"),
      s"profile sides must not expand rows per aggregate:\n$plan")
    // the distinct melt ships 8-byte value hashes, never value
    // strings — the memory-regime contract (round 14): aggregate maps
    // and the melt shuffle stay fixed-width
    assert(plan.contains("xxhash64"),
      s"distinct melt must key on xxhash64(value):\n$plan")
  }
}
