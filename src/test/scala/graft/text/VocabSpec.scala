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
}
