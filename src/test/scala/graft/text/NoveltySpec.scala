package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class NoveltySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) = {
    val out = Novelty.noveltyPlan(docs.toDF("doc_id", "text"), "doc_id",
        "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3))))
      .toMap
    spark.catalog.clearCache()
    out
  }

  test("first owner gets the credit; a verbatim copy scores zero") {
    val got = run(Seq(
      1L -> "a b c d e",           // 3 shingles, all first here
      2L -> "a b c d e",           // exact copy — nothing new
      3L -> "x y z a b c"))        // 4 shingles: x-y-z, y-z-a new; a-b-c seen
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 0L, 0.0)))
    val (n3, new3, f3) = got(3L)
    assert(n3 === 4L && new3 === 3L) // "a b c" is doc 1's; z-a-b is new
    assert(f3 === 3.0 / 4.0)
  }

  test("short and null docs score (0, 0, 0.0)") {
    val got = run(Seq(1L -> "a b", 2L -> null, 3L -> "a b c"))
    assert(got(1L) === ((0L, 0L, 0.0)))
    assert(got(2L) === ((0L, 0L, 0.0)))
    assert(got(3L) === ((1L, 1L, 1.0)))
  }

  test("repeated shingles within one doc count once (distinct sets)") {
    val got = run(Seq(1L -> "a b c a b c a b c"))
    // distinct shingles: a-b-c, b-c-a, c-a-b — all novel
    assert(got(1L) === ((3L, 3L, 1.0)))
  }

  private val corpus = Seq(
    1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "x y z a b c",
    4L -> "p q r s t u v", 5L -> "m n", 6L -> "x y z p q r")

  test("one-doc-at-a-time screen + append reproduces the batch operator") {
    // the streaming limit: score each doc against the index of all
    // earlier docs, then fold it in — must equal noveltyPlan verbatim
    val want = run(corpus)
    corpus.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      case (idx, (id, text)) =>
        val doc = Seq(id -> text).toDF("doc_id", "text")
        val got = idx match {
          case Some(i) => Novelty.screenAgainst(i, doc, "doc_id", "text")
          case None    => Novelty.noveltyPlan(doc, "doc_id", "text")
        }
        val r = got.collect().head
        assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === want(id),
          s"doc $id diverges from the batch operator")
        Some(idx match {
          case Some(i) => Novelty.appendToIndex(i, doc, "doc_id", "text")
            .localCheckpoint(true) // bound the fold's lineage
          case None => Novelty.index(doc, "doc_id", "text")
            .localCheckpoint(true)
        })
    }
    spark.catalog.clearCache()
  }

  test("appendToIndex(index(a), b) equals index(a ++ b) row-for-row") {
    val (a, b) = corpus.splitAt(3)
    val merged = Novelty.appendToIndex(
        Novelty.index(a.toDF("doc_id", "text"), "doc_id", "text"),
        b.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Novelty.index(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged === direct)
    spark.catalog.clearCache()
  }
}
