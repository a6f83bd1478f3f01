package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Extract]] contract: golden extractions for the documented rules,
  * and bit-equality of the native single-scan expression
  * ([[graft.expressions.HtmlText]]) against the declarative five-regex
  * definition over a structured generator of messy-but-in-contract
  * pages (the carve-outs — block patterns inside attribute values,
  * raw-text blocks containing the other block's close tag — are
  * documented on the expression and excluded by construction).
  */
class ExtractSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def native(html: String, minWords: Int = 5) =
    Extract.fromHtml(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", "html", minWords)
      .collect().head

  private def both(htmls: Seq[String], minWords: Int) = {
    val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    val n = Extract.fromHtml(df, "doc_id", "html", minWords)
      .orderBy("doc_id").collect()
    val d = Extract.fromHtmlDeclarative(df, "doc_id", "html", minWords)
      .orderBy("doc_id").collect()
    (n, d)
  }

  test("golden: chrome dropped, prose kept, entities decoded") {
    val html = "<html><head><title>My Page</title>" +
      "<style>body{color:red}</style>" +
      "<script>if(a<b){go()}</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
      "<p>one two three four five &amp; six</p>" +
      "<footer>tiny footer</footer></body></html>"
    val r = native(html)
    assert(r.getString(1) === "one two three four five & six")
    // nonempty lines: title, nav, p, footer
    assert(r.getInt(2) === 4)
    assert(r.getInt(3) === 1)
  }

  test("golden: br breaks lines; line density applies per line") {
    val html = "<p>alpha beta gamma delta epsilon<br>tiny line</p>"
    val r = native(html)
    assert(r.getString(1) === "alpha beta gamma delta epsilon")
    assert(r.getInt(2) === 2 && r.getInt(3) === 1)
  }

  test("golden: unterminated script degrades to generic tag strip") {
    // no closing </script>: the open tag strips, its text survives
    val r = native("<script>one two three four five six seven")
    assert(r.getString(1) === "one two three four five six seven")
  }

  test("golden: entity chain — amp last, no rescan of output") {
    val r = native("<p>a &amp;lt; b &lt;i&gt; c &amp;amp; d eight</p>", 1)
    assert(r.getString(1) === "a &lt; b <i> c &amp; d eight")
  }

  test("golden: chrome-only page yields empty text, zero kept") {
    val r = native("<nav>Home</nav><footer>c 2024</footer>")
    assert(r.getString(1) === "")
    assert(r.getInt(2) === 2 && r.getInt(3) === 0)
  }

  test("native == declarative on structured messy pages") {
    // deterministic generator: compose fragments that exercise every
    // rule — raw blocks, block closes, self-closed br/hr, unknown
    // tags with attributes, entities (valid and invalid), raw
    // newlines/tabs, unterminated tags at end of page
    val frags = Seq(
      "<script type=\"text/javascript\">var x = 1 < 2;</script>",
      "<style media=\"all\">p { margin: 0 }</style>",
      "<SCRIPT>loud()</SCRIPT  >",
      "<p>plain prose with quite a few words in it</p>",
      "<P >upper case close</P  >",
      "<div class=\"x\">short</div>",
      "<br>", "<br/>", "<br />", "<hr>", "<unknown attr=\"v\">inline</unknown>",
      "&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; &bogus; & lone",
      "line one\nline two\ttabbed\r\n",
      "text with trailing open <",
      "<notclosed attr",
      "</p>", "</div>", "</section>", "</em>",
      "a b c d e f g",
      "")
    // pages: sliding windows over rotations of the fragment list
    val pages = (0 until frags.length).map { rot =>
      val r = frags.drop(rot) ++ frags.take(rot)
      r.take(7).mkString(" ")
    } ++ Seq(frags.mkString("\n"), frags.reverse.mkString(""))
    for (minWords <- Seq(1, 3, 5)) {
      val (n, d) = both(pages, minWords)
      n.zip(d).zipWithIndex.foreach { case ((nr, dr), i) =>
        assert(nr === dr, s"page $i minWords=$minWords:\n${pages(i)}")
      }
    }
  }

  test("fixture: synthetic page extraction recovers the planted text") {
    val docs = Seq((7L, "src0", "en",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "source", "lang", "text")
    import org.apache.spark.sql.functions.col
    val html = docs.select(col("doc_id"),
      Extract.syntheticHtml(col("doc_id"), col("source"), col("lang"),
        col("text")).as("html"))
    val r = Extract.fromHtml(html, "doc_id", "html").collect().head
    val lines = r.getString(1).split("\n")
    assert(lines.length === 2)
    assert(lines(0) === "alpha beta gamma delta epsilon zeta")
    assert(lines(1) === "eta theta iota kappa lambda mu")
    // chrome lines seen but dropped: title, nav, h1, footer + 2 kept
    assert(r.getInt(2) === 6 && r.getInt(3) === 2)
  }
}
