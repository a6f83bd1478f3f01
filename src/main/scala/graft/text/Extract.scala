package graft.text

import graft.expressions.HtmlText
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction: the raw-crawl FRONT stage of the text
  * family. Every downstream operator (quality, language id, dedup,
  * curation) assumes a clean `text` column; a real 100 TB corpus
  * starts as crawled HTML, and this operator is the bridge: strip
  * `<script>`/`<style>` blocks, convert block-close tags to line
  * breaks, drop remaining tags, decode the six ubiquitous entities
  * (`&lt; &gt; &quot; &#39; &nbsp; &amp;` — amp LAST, the standard
  * ordering trap), then apply the line-density boilerplate rule: keep
  * only lines with ≥ `minWords` space-separated words. Navigation
  * bars, titles, headers and footers are short lines; body prose is
  * long lines — the same density heuristic the published boilerplate
  * strippers (Arc90 readability, jusText) build on, reduced to its
  * deterministic core so an independent SQL engine can replay it
  * byte-for-byte.
  *
  * Scale shape: a pure per-row projection — no shuffle, no join, no
  * state; it composes into any scan and runs at full parallelism on
  * however many input splits the crawl has. The hot path is the
  * single-scan native expression [[graft.expressions.HtmlText]]
  * (tier (b)); [[fromHtmlDeclarative]] is the five-regex declarative
  * formulation that DEFINES the semantics, retained as the in-repo
  * cross-check (`ExtractSpec` proves bit-equality; the `text_extract`
  * DuckDB oracle replays the declarative form on real fixtures every
  * round).
  *
  * Reference scope note: the reference library has no web-extraction
  * surface — engine extension (SURVEY §2.10), the VERDICT r10 gap #1.
  */
object Extract {

  /** Kept-lines text plus the governance counts:
    * (idCol, text, n_lines, n_kept) — `n_lines` nonempty lines seen,
    * `n_kept` lines that passed the density rule; text is '' when
    * nothing survives (a chrome-only page — the thing the rule is FOR).
    */
  def fromHtml(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5): DataFrame = {
    val e = HtmlText(col(htmlCol), minWords)
    df.select(col(idCol), e.as("__e"))
      .select(col(idCol), col("__e.text").as("text"),
        col("__e.n_lines").as("n_lines"), col("__e.n_kept").as("n_kept"))
  }

  /** The semantic definition in builtins — five regex passes, an
    * entity-decode chain, a line split and per-line HOF cleanup.
    * Spec-only cross-check for [[fromHtml]]; not a production path
    * (each regex pass copies the document, the lambdas evaluate
    * interpreted).
    */
  def fromHtmlDeclarative(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5): DataFrame = {
    val noScript = regexp_replace(col(htmlCol),
      "(?is)<script[^>]*>.*?</script[ \\t]*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style[ \\t]*>", " ")
    val broken = regexp_replace(noStyle, BlockBreakRegex, "\n")
    val noTags = regexp_replace(broken, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (pat, rep)) => replace(c, lit(pat), lit(rep)) }
    val cleaned = transform(split(decoded, "\n"),
      l => trim(regexp_replace(l, "[ \\t\\f\\r]+", " ")))
    val nonempty = filter(cleaned, _ =!= "")
    val keptArr = filter(nonempty, l => size(split(l, " ")) >= minWords)
    df.select(col(idCol), nonempty.as("__nz"), keptArr.as("__k"))
      .select(col(idCol),
        array_join(col("__k"), "\n").as("text"),
        size(col("__nz")).as("n_lines"), size(col("__k")).as("n_kept"))
  }

  /** The block-break pass, shared verbatim with the oracle builder:
    * `<br>`/`<hr>` (optionally self-closed) and the closing form of
    * the block-level tags become line breaks.
    */
  val BlockBreakRegex: String =
    "(?i)<(br|hr)[ \\t]*/?>|</(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|" +
      "table|nav|footer|header|title|blockquote|section|article)[ \\t]*>"

  // ---- deterministic crawl fixture ---------------------------------
  // The testdata has no raw-HTML table, so the extraction gates build
  // one from `documents` IN the query, with the identical construction
  // mirrored in the oracle SQL: page chrome (title, style, script with
  // a '<' inside, nav, h1, footer) around the document text as two
  // escaped <p> paragraphs (the word-level halves of the text, so a
  // page has more than one content line and extraction recovers
  // language/quality-faithful prose for the downstream pipeline gates).

  /** HTML-escape of a text column (&, <, > — ampersand FIRST). */
  private def esc(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** Synthetic page for a documents row — Spark side. */
  def syntheticHtml(docId: Column, source: Column, lang: Column,
      text: Column): Column = {
    val w = split(text, " ")
    val n = size(w)
    val h = floor(n / 2).cast("int")
    val p1 = array_join(slice(w, lit(1), (n - h).cast("int")), " ")
    val p2 = array_join(slice(w, (n - h + 1).cast("int"), h), " ")
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>p{margin:0;}</style>"),
      lit("<script>var a=1;if(a<2){a=a+1;}</script></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>"),
      lit("<div id=\"main\"><h1>"), source, lit(" "), lang, lit("</h1><p>"),
      esc(p1), lit("</p><p>"), esc(p2),
      lit("</p></div><footer>&copy; 2024 Example&amp;Co</footer>"),
      lit("</body></html>"))
  }

  /** The same page — DuckDB SQL expression over documents columns. */
  val syntheticHtmlSql: String = {
    def escSql(e: String) =
      s"replace(replace(replace($e, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val p1 = "array_to_string(list_slice(string_split(text, ' '), 1, " +
      "len(string_split(text, ' ')) - len(string_split(text, ' ')) // 2), ' ')"
    val p2 = "array_to_string(list_slice(string_split(text, ' '), " +
      "len(string_split(text, ' ')) - len(string_split(text, ' ')) // 2 + 1, " +
      "len(string_split(text, ' '))), ' ')"
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || " +
      "'</title><style>p{margin:0;}</style>" +
      "<script>var a=1;if(a<2){a=a+1;}</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>" +
      "<div id=\"main\"><h1>' || source || ' ' || lang || '</h1><p>' || " +
      escSql(p1) + " || '</p><p>' || " + escSql(p2) +
      " || '</p></div><footer>&copy; 2024 Example&amp;Co</footer>" +
      "</body></html>'"
  }

  /** DuckDB replay of the declarative pipeline over a relation `rel`
    * with (doc_id, html) — the `text_extract` oracle body, reusable
    * as a CTE by the composed pipeline gates.
    */
  def extractSqlCtes(rel: String, minWords: Int = 5): String =
    s"""x1 AS (SELECT doc_id, regexp_replace(html,
       |    '(?is)<script[^>]*>.*?</script[ \\t]*>', ' ', 'g') AS s FROM $rel),
       |x2 AS (SELECT doc_id, regexp_replace(s,
       |    '(?is)<style[^>]*>.*?</style[ \\t]*>', ' ', 'g') AS s FROM x1),
       |x3 AS (SELECT doc_id, regexp_replace(s,
       |    '(?i)<(br|hr)[ \\t]*/?>|</(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|nav|footer|header|title|blockquote|section|article)[ \\t]*>',
       |    chr(10), 'g') AS s FROM x2),
       |x4 AS (SELECT doc_id, regexp_replace(s, '<[^>]*>', ' ', 'g') AS s FROM x3),
       |x5 AS (SELECT doc_id,
       |    replace(replace(replace(replace(replace(replace(s,
       |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
       |      '&nbsp;', ' '), '&amp;', '&') AS s FROM x4),
       |x6 AS (SELECT doc_id, list_filter(
       |    list_transform(string_split(s, chr(10)),
       |      l -> trim(regexp_replace(l, '[ \\t\\f\\r]+', ' ', 'g'))),
       |    l -> l <> '') AS nz FROM x5),
       |x7 AS (SELECT doc_id, nz,
       |    list_filter(nz, l -> len(string_split(l, ' ')) >= $minWords) AS ks
       |  FROM x6)""".stripMargin
}
