package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class FertilitySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    // en: "the ... of ... is" stopwords dominate
    (1L, "the cat of the house is warm"),
    (2L, "the dog is a good dog and the end"),
    // fr: "le ... de ... est"
    (3L, "le chat de la maison est grand"),
    // no lexicon hit anywhere -> und
    (4L, "zzz qqq xxx"),
    // digits only: tokens exist, no letters, no stopword hits -> und
    (5L, "12345 67890")).toDF("doc_id", "text")

  private def rows =
    Fertility.byLanguage(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap

  test("per-language sums match a driver-side replay") {
    def toks(s: String) =
      "[a-z]+|[0-9]+".r.findAllIn(s.toLowerCase).size.toLong
    def bytes(s: String) = s.getBytes("UTF-8").length.toLong
    val en = Seq("the cat of the house is warm",
      "the dog is a good dog and the end")
    val fr = Seq("le chat de la maison est grand")
    val und = Seq("zzz qqq xxx", "12345 67890")
    val got = rows
    assert(got.keySet === Set("en", "fr", "und"))
    for ((lang, ds) <- Seq("en" -> en, "fr" -> fr, "und" -> und)) {
      val (nd, nb, nt, bpt) = got(lang)
      assert(nd === ds.size.toLong, s"$lang docs")
      assert(nb === ds.map(bytes).sum, s"$lang bytes")
      assert(nt === ds.map(toks).sum, s"$lang tokens")
      assert(bpt === ds.map(bytes).sum * 1000L / ds.map(toks).sum,
        s"$lang bpt")
    }
  }

  test("a language bucket with zero tokens carries a null ratio") {
    val d = Seq((1L, "??? !!! ...")).toDF("doc_id", "text")
    val r = Fertility.byLanguage(d, "doc_id", "text").collect().head
    assert(r.getString(0) === "und")
    assert(r.getLong(3) === 0L) // no [a-z]+|[0-9]+ runs at all
    assert(r.isNullAt(4))
  }

  test("output sorted by language code") {
    val langs = Fertility.byLanguage(docs, "doc_id", "text")
      .collect().map(_.getString(0)).toSeq
    assert(langs === langs.sorted)
  }
}
