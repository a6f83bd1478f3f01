package graft.expressions

import graft.SparkTestSession
import graft.text.TextFeatures
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-scan shingle expression must be bit-equivalent to the
  * HOF reference formulation ([[TextFeatures.wordShingles]], the shape
  * every DuckDB oracle mirrors) — including empty-token edge cases
  * (consecutive / leading / trailing spaces), multi-byte UTF-8, the
  * shorter-than-n guard, and null text.
  */
class WordShinglesSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** HOF reference for the non-distinct (repetition) face. */
  private def hofGrams(text: Column, n: Int): Column = {
    val w = TextFeatures.words(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  private def compare(texts: Seq[String], n: Int): Unit = {
    val rows = texts.toDF("t")
      .select(
        TextFeatures.textShingles(col("t"), n).as("fastD"),
        TextFeatures.wordShingles(TextFeatures.words(col("t")), n).as("refD"),
        TextFeatures.textGrams(col("t"), n).as("fastA"),
        hofGrams(col("t"), n).as("refA"))
      .collect()
    rows.zip(texts).foreach { case (r, in) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"distinct shingles diverge on '$in' (n=$n)")
      assert(r.getSeq[String](2) === r.getSeq[String](3),
        s"non-distinct grams diverge on '$in' (n=$n)")
    }
  }

  test("hand cases: spacing edges, unicode, guard, repeats") {
    val cases = Seq(
      "the quick brown fox jumps",
      "a b a b a b", // repeated grams: distinct-ness visible
      "A  B", // consecutive spaces -> empty token inside a gram
      " leading and trailing ",
      "  ", // only empty tokens
      "", // one empty token
      "one",
      "two words",
      "Ümlaut CAFÉ straße İstanbul", // multi-byte lower, exotic fold
      "tab\tand\nnewline stay intact",
      "naïve 日本語 text mixed in")
    (1 to 4).foreach(n => compare(cases, n))
  }

  test("equals the HOF form on 400 random small-alphabet strings") {
    // small alphabet + frequent spaces maximize empty-token and
    // duplicate-gram collisions — the regimes where a slicing bug hides
    val rnd = new scala.util.Random(8) // fixed seed: reproducible
    val alphabet = "ab É "
    val texts = Seq.fill(400) {
      val len = rnd.nextInt(24)
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    Seq(2, 3).foreach(n => compare(texts, n))
  }

  test("null text yields an empty array, matching the HOF guard") {
    val r = Seq((1, null.asInstanceOf[String])).toDF("id", "t")
      .select(
        TextFeatures.textShingles(col("t"), 3).as("d"),
        TextFeatures.wordShingles(TextFeatures.words(col("t")), 3).as("ref"),
        TextFeatures.textGrams(col("t"), 2).as("a"))
      .collect()(0)
    assert(r.getSeq[String](0) === Seq.empty)
    assert(r.getSeq[String](1) === Seq.empty)
    assert(r.getSeq[String](2) === Seq.empty)
  }
}
