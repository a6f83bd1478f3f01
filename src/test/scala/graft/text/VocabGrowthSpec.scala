package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[VocabGrowth.curve]] vs an in-memory replay, plus the shape
  * property the audit exists for: a corpus of clones plateaus while a
  * novel corpus keeps growing.
  */
class VocabGrowthSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    val out = VocabGrowth.curve(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache() // globalRank family convention
    out
  }

  private def brute(docs: Seq[(Long, String)], k: Int) = {
    val ranked = docs.sortBy(_._1).zipWithIndex
      .map { case ((_, t), r) =>
        (r.toLong * k / docs.size,
          t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      }
    val buckets = ranked.map(_._1).distinct.sorted
    val seen = collection.mutable.Set.empty[String]
    var (dc, tc, vc) = (0L, 0L, 0L)
    buckets.map { b =>
      val rows = ranked.filter(_._1 == b)
      dc += rows.size
      tc += rows.map(_._2.size.toLong).sum
      rows.flatMap(_._2).foreach(t => if (seen.add(t)) vc += 1)
      (b, dc, tc, vc)
    }
  }

  test("curve == brute force on a mixed corpus") {
    val docs = Seq[(Long, String)](
      (5L, "alpha beta gamma"), (1L, "alpha alpha delta"),
      (9L, "beta beta beta"), (3L, "epsilon zeta"), (7L, "alpha zeta eta"),
      (2L, "theta"), (8L, ""), (4L, "iota kappa alpha"))
    assert(run(docs, 4).toSeq === brute(docs, 4))
  }

  test("clone corpus plateaus; novel corpus keeps growing") {
    val clones = (0L until 40L).map(i => (i, "same tokens every time"))
    // letter-only tokens: TokenPattern splits digit runs off
    def l(i: Long) = s"${('a' + i / 10).toChar}${('a' + i % 10).toChar}"
    val novel = (0L until 40L).map(i => (i, s"q${l(i)}a q${l(i)}b q${l(i)}c"))
    val cCurve = run(clones, 8).map(_._4)
    val nCurve = run(novel, 8).map(_._4)
    assert(cCurve.last === 4L)   // vocabulary frozen after doc 1
    assert(cCurve.distinct.size === 1)
    assert(nCurve.last === 120L) // every doc adds 3 novel tokens
    assert(nCurve.toSeq === nCurve.sorted && nCurve.head < nCurve.last)
  }
}
