package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GopherRulesSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // one doc per rule violation + one clean doc; thresholds default
  private def mk(words: Seq[String]) = words.mkString(" ")

  test("each rule fires on its constructed violator and only there") {
    // word lengths kept at 3-4 chars so avg_word_len stays inside
    // [3.0, 4.8] except where a rule is deliberately violated
    val cleanDoc = mk(Seq("the", "a", "of") ++
      (0 until 27).map(i => s"wd$i")) // 30 words, diverse, stopwords ok
    val docs = Seq(
      0L -> cleanDoc,
      1L -> mk("the" +: (0 until 14).map(i => s"wd$i")), // short → wordcount
      2L -> mk(Seq("the", "a") ++ (0 until 28)
        .map(i => s"superlongword$i")), // meanlen high
      3L -> mk((0 until 30).map(i => s"wd$i")), // no stopwords → stopword
      4L -> mk(Seq("the", "of") ++ Seq.fill(28)("same")), // diversity (+rep)
      5L -> mk(Seq("the", "a", "of") ++ (0 until 9).flatMap(_ =>
        Seq("repx", "eatx")) ++ (0 until 9).map(i => s"wrd$i")) // repetition
    ).toDF("doc_id", "text")
    val out = GopherRules.screen(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getString(7))).toMap

    assert(out(0L) === ((true, "")))
    assert(out(1L)._2 === "wordcount")
    assert(out(2L)._2 === "meanlen")
    assert(out(3L)._2 === "stopword")
    assert(out(4L)._2.split(",").toSet === Set("diversity", "repetition"))
    assert(out(5L)._2 === "repetition")
    assert(!out(1L)._1 && !out(5L)._1)
  }

  test("the screen discriminates on the real corpus (both verdicts occur)") {
    val docs = graft.queries.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val counts = GopherRules.screen(docs, "doc_id", "text")
      .groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(true, 0L) > 0, "no doc passed — screen vacuous")
    assert(counts.getOrElse(false, 0L) > 0, "no doc failed — screen vacuous")
  }
}
