package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("scores match the closed-form unigram model") {
    // counts: aa=3, bb=1, cc=1; k=2 vocab {aa, bb} (tie bb/cc -> token
    // asc); total=5, denom = 5 + 2 + 1 = 8
    val docs = Seq((1L, "aa aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // doc1 [aa,aa,bb]: smoothed 4,4,2 -> rarity (2+2+4)/3; nll 4ln2/3
    assert(out(0)._2 === 3L && out(0)._3 === 0L)
    assert(out(0)._4 === (2.0 + 2.0 + 4.0) / 3)
    assert(out(0)._5 === math.floor(4 * math.log(2) / 3 * 1e6).toLong)
    // doc2 [aa,cc]: cc is OOV (smoothed 1) -> rarity (2+8)/2 = 5
    assert(out(1)._2 === 2L && out(1)._3 === 1L)
    assert(out(1)._4 === 5.0)
    assert(out(1)._5 === math.floor(
      (math.log(2) + math.log(8)) / 2 * 1e6).toLong)
  }

  test("empty and null docs score zeros") {
    val docs = Seq((1L, "aa bb"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
    Seq(1, 2).foreach { i =>
      assert(out(i).getLong(1) === 0L)
      assert(out(i).getDouble(3) === 0.0)
      assert(out(i).getLong(4) === 0L)
    }
  }

  test("scoreFast (native expression) is bit-identical to the HOF fold") {
    val docs = ((1L to 30L).map(i => (i, s"aa bb w$i cc w${i}x")) ++
      Seq((98L, ""), (99L, null.asInstanceOf[String]))).toDF("doc_id", "text")
    val fitted = LmScore.model(docs, "doc_id", "text", k = 5)
    val slow = LmScore.scoreWith(docs, "doc_id", "text", fitted)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val fast = LmScore.scoreFast(docs, "doc_id", "text", fitted)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(fast === slow)
  }

  test("scoreFast runs inside whole-stage codegen") {
    // a local Seq relation constant-folds at plan time — read parquet
    // so the projection actually executes on the scan path
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fitted = LmScore.model(docs, "doc_id", "text", k = 10)
    val scored = LmScore.scoreFast(docs, "doc_id", "text", fitted)
    val plan = scored.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the whole-stage-codegen marker in plan text
    assert(plan.linesIterator.exists(l =>
        l.contains("unigram_score") && l.contains("*(")),
      s"unigram_score must sit inside a codegen stage:\n$plan")
    assert(scored.count() === docs.count()) // the generated code runs
  }

  test("gibberish scores higher nll than corpus-typical text") {
    val docs = ((1L to 20L).map(i => (i, "the quick brown fox jumps")) ++
      Seq((99L, "zxqv wvut qqpz"))).toDF("doc_id", "text")
    val out = LmScore.score(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(99L) > out(1L), "OOV gibberish must be more surprising")
  }
}
