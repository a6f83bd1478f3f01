package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LangIdUniSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("script screen: each major script predicts its code with its share") {
    val docs = Seq(
      (1L, "这是中文测试文档 汉字 ひらがな"),
      (2L, "한국어 문서 테스트"),
      (3L, "это русский текст"),
      (4L, "αυτο ειναι ελληνικο"),
      (5L, "هذا نص عربي"),
      (6L, "the cat is on the mat and the dog is here too"),
      (7L, "xyzzy plugh qwfp"), // Latin, no stopword hit -> und
      (8L, "the fox 汉 ate the hen")) // sub-threshold CJK -> stopword en
      .toDF("doc_id", "text")
    val got = LangId.predictUnicode(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === "cjk" && got(1L)._2 === 1.0)
    assert(got(2L)._1 === "ko")
    assert(got(3L)._1 === "ru")
    assert(got(4L)._1 === "el")
    assert(got(5L)._1 === "ar")
    assert(got(6L)._1 === "en")
    assert(got(7L)._1 === "und" && got(7L)._2 === 0.0)
    assert(got(8L)._1 === "en", "sub-threshold script must fall to stopwords")
  }

  test("empty and null text predict und with zero score") {
    val docs = Seq((1L, Some("")), (2L, None))
      .toDF("doc_id", "text")
    val got = LangId.predictUnicode(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L) === ("und", 0.0))
    assert(got(2L) === ("und", 0.0))
  }
}
