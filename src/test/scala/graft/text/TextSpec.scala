package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis family unit tests on hand-built fixtures (the
  * driver-oracle at sf0.01 covers the real corpus; here we pin exact
  * values on inputs small enough to verify by hand).
  */
class TextSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  test("text stats: counts, ratios, quality on a known sentence") {
    val df = Seq(doc(1, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextStats.describe(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_chars") === 22)
    assert(r.getAs[Int]("n_words") === 6)
    assert(r.getAs[Int]("n_distinct_words") === 5) // 'the' twice
    assert(r.getAs[Double]("stopword_ratio") === 2.0 / 6) // the, the
    assert(r.getAs[Double]("avg_word_len") === (22 - 5).toDouble / 6)
    assert(r.getAs[Double]("quality") === (6.0 / 50) * (5.0 / 6))
  }

  test("langid: stopword profiles pick the right language, ties break alphabetically") {
    val df = Seq(
      doc(1, "the cat and the dog"),   // en
      doc(2, "der hund und die katze"),// de
      doc(3, "la de xxxx"),            // la+de in BOTH es and fr → tie → es
      doc(4, "zzz qqq www")            // no stopwords → und
    ).toDF("doc_id", "text")
    val out = LangId.predict(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(out(0) === ("en", 3.0 / 5))
    assert(out(1) === ("de", 3.0 / 5))
    assert(out(2) === ("es", 2.0 / 3))
    assert(out(3) === ("und", 0.0))
  }

  test("token counts: letter/digit runs, distincts, numerics") {
    val df = Seq(doc(1, "abc12def abc x9")).toDF("doc_id", "text")
    val r = TokenCount.counts(df, "doc_id", "text").head()
    // runs: abc, 12, def, abc, x, 9
    assert(r.getAs[Int]("n_tokens") === 6)
    assert(r.getAs[Int]("n_distinct_tokens") === 5)
    assert(r.getAs[Int]("n_numeric_tokens") === 2)
  }

  test("fingerprint: order-sensitive, deterministic, collision-free on permutations") {
    val df = Seq(
      doc(1, "alpha beta gamma"),
      doc(2, "gamma beta alpha"),
      doc(3, "alpha beta gamma")).toDF("doc_id", "text")
    val fps = Fingerprint.fingerprints(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(fps(0) === fps(2))   // same text → same fingerprint
    assert(fps(0) !== fps(1))   // permutation → different fingerprint
    assert(fps.forall(f => f >= 0 && f < Fingerprint.Mod))
  }

  test("shingles: guard below n tokens, distinct, order preserved") {
    val df = Seq(doc(1, "a b"), doc(2, "a b c d a b c")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextFeatures.wordShingles(TextFeatures.words(col("text")), 3).as("s"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Seq[String]]("s") === Seq.empty)
    // grams: "a b c","b c d","c d a","d a b","a b c"(dup) → 4 distinct
    assert(out(1).getAs[Seq[String]]("s") ===
      Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("hex prefix to long matches JVM md5") {
    val df = Seq(doc(1, "spark")).toDF("doc_id", "text")
    val got = df.select(
      TextFeatures.hexPrefixToLong(md5(col("text")), 8).as("h")).head().getLong(0)
    val jvm = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8"))
      .take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    assert(got === jvm)
  }
}
