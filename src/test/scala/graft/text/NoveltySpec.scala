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

  test("persisted index: identical screen, no index-side shuffle, exact fold") {
    val (a, b) = corpus.splitAt(4)
    val batch = b.toDF("doc_id", "text")
    Novelty.writeIndex(
      Novelty.index(a.toDF("doc_id", "text"), "doc_id", "text"),
      "graft_nov_idx", numBuckets = 8)
    try {
      val screened = Novelty.screenAgainst(
        Novelty.readIndex(spark, "graft_nov_idx"), batch, "doc_id", "text")
      val want = Novelty.screenAgainst(
          Novelty.index(a.toDF("doc_id", "text"), "doc_id", "text"),
          batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(screened.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === want)
      // the recurring-ingest contract (the IncrementalDedupSpec walk):
      // the bucketed index scan reaches its join without a hash
      // repartition above it — only the batch side exchanges
      val plan = screened.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      // depth = the tree-marker position, NOT the first content char:
      // the `*(k) ` codegen prefix would make a codegen'd parent look
      // DEEPER than its non-codegen child (e.g. BroadcastQueryStage),
      // and the upward walk would skip the join line
      def depth(l: String): Int = {
        val i = l.indexOf("+- "); val j = l.indexOf(":- ")
        if (i < 0 && j < 0) 0
        else if (i < 0) j else if (j < 0) i else math.min(i, j)
      }
      val scans = lines.zipWithIndex
        .filter(_._1.contains("graft_nov_idx")).filter(_._1.contains("Scan"))
      assert(scans.nonEmpty && plan.contains("Bucketed: true"),
        s"index must scan bucketed:\n$plan")
      scans.foreach { case (_, si) =>
        var d = depth(lines(si))
        var i = si - 1
        var metJoin = false
        while (i >= 0 && !metJoin) {
          val ld = depth(lines(i))
          if (ld >= 0 && ld < d) {
            d = ld
            if (lines(i).contains("Join")) metJoin = true
            else assert(!lines(i).contains("Exchange hashpartitioning"),
              s"bucketed index scan re-shuffles before its join:\n$plan")
          }
          i -= 1
        }
      }
      // in-place fold ≡ rebuild, and the maintained table still screens
      Novelty.appendIndexed(spark, "graft_nov_idx", batch, "doc_id", "text")
      val maintained = Novelty.readIndex(spark, "graft_nov_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rebuilt = Novelty
        .index(corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(maintained === rebuilt)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_nov_idx")
      spark.catalog.clearCache()
    }
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
