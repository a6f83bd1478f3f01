package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AggMergeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val history = Seq(
    ("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 10.0),
    ("b", "x", 5.0)).toDF("k1", "k2", "v")
  private val delta = Seq(
    ("a", "x", 3.0), // touches an existing key
    ("c", "z", 7.0)) // brand-new key
    .toDF("k1", "k2", "v")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k1", "k2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue(), r.getDouble(4), r.getDouble(5)))

  test("upsert equals recomputing the aggregate from all rows") {
    val keys = Seq("k1", "k2")
    val incremental = AggMerge.upsert(
      AggMerge.aggregate(history, keys, "v"), delta, keys, "v")
    val recomputed = AggMerge.aggregate(history.union(delta), keys, "v")
    assert(snap(incremental).toSeq === snap(recomputed).toSeq)
    // a standing table must not change column types on its first
    // update (nullability differs — count vs sum — and parquet
    // round-trips erase that distinction anyway)
    assert(incremental.schema.map(f => (f.name, f.dataType)) ===
      recomputed.schema.map(f => (f.name, f.dataType)))
  }

  test("one-sided keys pass through untouched") {
    val keys = Seq("k1", "k2")
    val out = snap(AggMerge.upsert(
      AggMerge.aggregate(history, keys, "v"), delta, keys, "v"))
    // base-only key (b, x) and delta-only key (c, z) both present
    assert(out.exists(r => r._1 == "b" && r._2 == "x" && r._3 == 1L))
    assert(out.exists(r => r._1 == "c" && r._2 == "z" && r._3 == 1L &&
      r._4 == 7.0 && r._5 == 7.0 && r._6 == 7.0))
    // merged key (a, x): n = 2 + 1, total 6.0, min 1, max 3
    val ax = out.find(r => r._1 == "a" && r._2 == "x").get
    assert((ax._3, ax._4, ax._5, ax._6) === ((3L, 6.0, 1.0, 3.0)))
  }

  test("null keys merge as ordinary groups, not row pairs") {
    val keys = Seq("k1", "k2")
    val h = Seq((null.asInstanceOf[String], "x", 1.0), ("a", "x", 2.0))
      .toDF("k1", "k2", "v")
    val d = Seq((null.asInstanceOf[String], "x", 3.0)).toDF("k1", "k2", "v")
    val out = AggMerge.upsert(AggMerge.aggregate(h, keys, "v"), d, keys, "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toMap
    assert(out(None) === 2L) // both null-key rows fold into ONE group
    assert(out(Some("a")) === 1L)
  }

  test("merge is one exchange: both state sets contribute partials map-side") {
    val keys = Seq("k1", "k2")
    val base = AggMerge.aggregate(history, keys, "v")
    val plan = AggMerge.upsert(base, delta, keys, "v")
      .queryExecution.executedPlan.toString
    // base agg (1) + the merge re-aggregate over the union (1); a
    // null-safe full-outer formulation would add a re-shuffle per side
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(exchanges <= 3, s"expected <= 3 key exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "merge must not join")
  }

  test("merge of three successive deltas folds associatively") {
    val keys = Seq("k1", "k2")
    val d2 = Seq(("a", "y", -4.0)).toDF("k1", "k2", "v")
    val chained = AggMerge.upsert(
      AggMerge.upsert(AggMerge.aggregate(history, keys, "v"),
        delta, keys, "v"),
      d2, keys, "v")
    val flat = AggMerge.aggregate(history.union(delta).union(d2), keys, "v")
    assert(snap(chained).toSeq === snap(flat).toSeq)
  }
}
