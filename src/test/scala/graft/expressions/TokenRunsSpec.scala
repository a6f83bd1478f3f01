package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenRunsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def regexForm(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+"), lit(0))

  private def both(texts: Seq[String]): Seq[(Seq[String], Seq[String])] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(TokenRuns(col("t")).as("fast"), regexForm(col("t")).as("ref"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1)))

  test("hand cases: runs, class splits, case folding, boundaries") {
    val cases = Seq(
      "Hello, World 42!" -> Seq("hello", "world", "42"),
      "abc123def" -> Seq("abc", "123", "def"), // class change splits
      "" -> Seq(),
      "!!!" -> Seq(),
      "A" -> Seq("a"),
      "ümlaut café" -> Seq("mlaut", "caf")) // multi-byte chars split runs
    both(cases.map(_._1)).zip(cases).foreach { case ((fast, ref), (in, want)) =>
      assert(fast === want, s"input '$in'")
      assert(fast === ref, s"input '$in' diverges from the regex form")
    }
  }

  test("equals the regex form on 500 random printable-ASCII strings") {
    val rnd = new scala.util.Random(42) // fixed seed: reproducible
    val texts = Seq.fill(500) {
      val len = rnd.nextInt(40)
      Seq.fill(len)((' ' + rnd.nextInt('~' - ' ' + 1)).toChar).mkString
    }
    both(texts).zip(texts).foreach { case ((fast, ref), in) =>
      assert(fast === ref, s"input '$in'")
    }
  }

  test("null text stays null through the expression") {
    val r = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TokenRuns(col("t"))).collect()
    assert(r(0).isNullAt(0))
  }
}
