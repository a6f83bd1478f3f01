package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    1L -> "aa bb aa",
    2L -> "aa cc",
    3L -> "bb bb bb bb",
    4L -> "dd ee dd ee").toDF("doc_id", "text")

  test("counts, doc frequencies, and tie-break by token") {
    val rows = Vocab.topTokens(docs, "doc_id", "text", k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, "bb", 2L, 5L), // 5 occurrences in docs 1 and 3
      (2L, "aa", 2L, 3L),
      (3L, "dd", 1L, 2L), // dd/ee tie at 2 → token ascending
      (4L, "ee", 1L, 2L),
      (5L, "cc", 1L, 1L)))
  }

  test("k cuts the table after ordering, ranks stay 1..k") {
    val rows = Vocab.topTokens(docs, "doc_id", "text", k = 2).collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("bb", "aa"))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = Vocab.topTokens(docs, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-task heap + driver merge:\n$plan")
  }

  test("encode maps tokens to vocab ranks, 0 for OOV, order preserved") {
    val rows = Vocab.encode(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // vocab at k=2: bb -> 1, aa -> 2; everything else OOV -> 0
    assert(rows.toSeq === Seq(
      (1L, "2 1 2", 3L, 0L),
      (2L, "2 0", 2L, 1L),
      (3L, "1 1 1 1", 4L, 0L),
      (4L, "0 0 0 0", 4L, 4L)))
  }

  test("encode keeps empty documents with an empty id sequence") {
    val withEmpty = docs.union(
      Seq((5L, ""), (6L, "!!!"), (7L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val rows = Vocab.encode(withEmpty, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.filter(_._1 >= 5L).toSeq === Seq(
      (5L, "", 0L, 0L), (6L, "", 0L, 0L), (7L, "", 0L, 0L)))
  }

  test("encode's corpus side is shuffle-free: only the vocab aggregates") {
    val plan = Vocab.encode(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    // the single BroadcastExchange carries the 1-row vocab map; the
    // corpus scan must reach the projection with no hash-partitioning
    // exchange on its path (the only exchanges belong to the vocab agg)
    assert(plan.contains("BroadcastExchange"),
      s"vocab map must broadcast:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"corpus must pick the map up map-side:\n$plan")
  }

  test("encodeFast is bit-identical to encode, incl. empty/null/OOV docs") {
    val withEdges = docs.union(
      Seq((5L, ""), (6L, "!!!"), (7L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val slow = Vocab.encode(withEdges, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val fast = Vocab.encodeFast(withEdges, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fast.toSeq === slow.toSeq)
  }

  test("encodeFast has NO join at all: vocab rides the plan as a literal") {
    val plan = Vocab.encodeFast(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"corpus side must be a pure scan:\n$plan")
  }
}
