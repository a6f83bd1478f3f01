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
}
