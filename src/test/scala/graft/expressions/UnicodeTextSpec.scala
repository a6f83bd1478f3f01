package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multilingual text surfaces: [[TokenRunsUnicode]] against its
  * regex-equivalence contract and [[ScriptCounts]] against the
  * Spark-side regex census of the same documented ranges.
  */
class UnicodeTextSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val samples = Seq(
    "Hello, 世界! This is 中文 text with ASCII 123 numbers",
    "это русский Текст с Числами 42 и словами",
    "αυτο ειναι ΕΛΛΗΝΙΚΑ γραμματα",
    "한국어 텍스트 and english MIXED together",
    "هذا نص عربي مع english",
    "ひらがな カタカナ 漢字のテスト",
    "no--split..here; but\tsplit\nthere 7x7",
    "",
    "Ångström naïve café déjà-vu ÜBER",
    "123456 42 0 007")

  test("token_runs_unicode == regex letters/digits with per-codepoint lowering") {
    // clean-room reference: \p{L}+ | [0-9]+ matches on the RAW text,
    // letters lowercased code point by code point (the context-free
    // mapping the expression documents — NOT full-string lower())
    def reference(s: String): Seq[String] =
      "[\\p{L}]+|[0-9]+".r.findAllIn(s).map { tok =>
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          sb.appendCodePoint(
            if (Character.isLetter(cp)) Character.toLowerCase(cp) else cp)
          i += Character.charCount(cp)
        }
        sb.toString
      }.toSeq
    val got = samples.toDF("t")
      .select(TokenRunsUnicode(col("t")).as("w")).collect()
      .map(_.getSeq[String](0).toSeq)
    samples.zip(got).foreach { case (s, g) =>
      assert(g === reference(s), s"mismatch on: $s")
    }
  }

  test("script_counts == per-range regex census on every sample") {
    val ranges = Seq(
      "[\\p{L}]",
      "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}]",
      "[\\x{AC00}-\\x{D7A3}]", "[\\x{0400}-\\x{04FF}]",
      "[\\x{0370}-\\x{03FF}]", "[\\x{0600}-\\x{06FF}]")
    val regexCols = ranges.zipWithIndex.map { case (p, i) =>
      size(regexp_extract_all(col("t"), lit(p), lit(0))).cast("long").as(s"r$i")
    }
    val rows = samples.toDF("t")
      .select(ScriptCounts(col("t")).as("sc") +: regexCols: _*)
      .collect()
    rows.foreach { r =>
      val sc = r.getStruct(0)
      (0 until 6).foreach { i =>
        assert(sc.getLong(i) === r.getLong(i + 1),
          s"field $i diverges from the regex census")
      }
    }
  }

  test("null text: null tokens, null census") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(TokenRunsUnicode(col("t")), ScriptCounts(col("t"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("ASCII text tokenizes identically to the ASCII scanner") {
    val ascii = Seq("The Quick 99 brown-fox", "a1b2c3", "UPPER lower 0")
    val both = ascii.toDF("t")
      .select(TokenRuns(col("t")).as("a"), TokenRunsUnicode(col("t")).as("u"))
      .collect()
    both.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("mode equivalence on ASCII holds on 500 random printable strings") {
    // the TokenCount.Mode contract: switching a pipeline to Unicode
    // never changes behavior on the data Ascii was built for — checked
    // property-style over the full printable-ASCII alphabet
    val rnd = new scala.util.Random(20260814)
    val strs = (1 to 500).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val both = strs.toDF("t")
      .select(graft.text.TokenCount.tokens(col("t"),
          graft.text.TokenCount.Ascii).as("a"),
        graft.text.TokenCount.tokens(col("t"),
          graft.text.TokenCount.Unicode).as("u"))
      .collect()
    strs.zip(both).foreach { case (s, r) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"on: $s")
    }
  }

  test("vocab routing: Unicode mode == Ascii mode on a pure-ASCII corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = graft.text.Vocab.topTokens(docs, "doc_id", "text", 50)
      .collect().map(_.toString).toSeq
    val u = graft.text.Vocab.topTokens(docs, "doc_id", "text", 50,
        mode = graft.text.TokenCount.Unicode)
      .collect().map(_.toString).toSeq
    assert(a === u)
  }
}
