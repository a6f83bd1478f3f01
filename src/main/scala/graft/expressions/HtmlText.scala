package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML → text extractor: ONE character scan replacing the
  * five-regex + split + per-line-HOF declarative pipeline
  * ([[graft.text.Extract.fromHtmlDeclarative]]) that defines the
  * semantics. The raw-crawl front stage of the text family: strip
  * `<script>`/`<style>` raw-text blocks, turn block-close tags into
  * line breaks, drop every other tag, decode the six ubiquitous
  * entities, and keep only lines with at least `minWords`
  * space-separated words — the classic line-density boilerplate rule
  * (navigation, headers, footers, and cookie banners are short lines;
  * body prose is long lines).
  *
  * Why a custom `Expression` (extension tier (b), like [[TokenRuns]]):
  * the declarative form materializes FIVE full-size intermediate
  * strings per document (one per `regexp_replace` pass) and then
  * evaluates interpreted HOF lambdas per line; on a crawl this stage
  * touches every byte the pipeline will ever see, making it the
  * single hottest scan of the whole corpus. This scanner allocates
  * one output line buffer and visits each input character once.
  *
  * Bit-compatibility contract (spec'd by `ExtractSpec` against the
  * declarative form; the `text_extract` DuckDB oracle keeps the
  * regex formulation and re-verifies on real fixtures every round):
  *   - equivalence holds for HTML whose block-level tag patterns do
  *     not appear inside attribute VALUES (`alt="a<br>b"`), and whose
  *     `<script>`/`<style>` raw text does not contain the OTHER
  *     block's closing tag — in both pathological cases the sequential
  *     regex passes and the single scan bracket different spans. Real
  *     boilerplate does neither, and either reading of such input is
  *     defensible;
  *   - an unterminated `<script`/`<style` block (no matching close)
  *     degrades exactly like the regex form: the open tag strips as a
  *     generic tag and the block's text survives into the line rules;
  *   - entity decoding matches the sequential `replace` chain with
  *     `&amp;` LAST: no entity is a prefix of another and no
  *     replacement output is rescanned, so first-match single-pass
  *     decoding is literally the same function.
  */
case class HtmlText(child: Expression, minWords: Int)
    extends UnaryExpression {

  require(minWords >= 1, s"minWords must be >= 1, got $minWords")

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def prettyName: String = "html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String], minWords)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.HtmlText.extract($a, $minWords);")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  /** Tags whose CLOSING form (`</p>`, `</div>`, …) becomes a line
    * break; `<br>`/`<hr>` (open, optionally self-closed) break too.
    * Everything else — open tags, unknown tags, comments-as-tags —
    * becomes a single space so inline markup never glues words.
    */
  private val BlockClose: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "table", "nav", "footer", "header", "title", "blockquote",
    "section", "article")

  private val Entities: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&#39;" -> '\'',
    "&nbsp;" -> ' ', "&amp;" -> '&')

  private def lowerAt(h: String, i: Int): Char = {
    val c = h.charAt(i)
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  /** True if h[i..] starts with the (lowercase) word, case-insens. */
  private def matchesWord(h: String, i: Int, w: String): Boolean = {
    if (i + w.length > h.length) return false
    var j = 0
    while (j < w.length) {
      if (lowerAt(h, i + j) != w.charAt(j)) return false
      j += 1
    }
    true
  }

  /** End index (exclusive) of a `<script …>…</script[ \t]*>` or
    * `<style …>…</style[ \t]*>` raw-text block opening at `i`, or -1.
    * Mirrors `(?is)<script[^>]*>.*?</script[ \t]*>`: the open tag's
    * `[^>]*` attribute run, then the EARLIEST well-formed close.
    */
  private def rawBlockEnd(h: String, i: Int, name: String): Int = {
    if (!matchesWord(h, i + 1, name)) return -1
    var j = i + 1 + name.length
    // open tag: [^>]* then '>', and the name must not continue
    // ("<scriptx" is not a script tag: regex `<script[^>]*>` would
    // match it — but so would this scan, since 'x' is in [^>]. Keep
    // regex semantics: no word-boundary check.)
    while (j < h.length && h.charAt(j) != '>') j += 1
    if (j >= h.length) return -1
    j += 1 // past the open '>'
    // earliest `</name[ \t]*>`
    val close = "</" + name
    while (j < h.length) {
      if (h.charAt(j) == '<' && matchesWord(h, j, close)) {
        var k = j + close.length
        while (k < h.length && (h.charAt(k) == ' ' || h.charAt(k) == '\t')) k += 1
        if (k < h.length && h.charAt(k) == '>') return k + 1
      }
      j += 1
    }
    -1
  }

  /** End index (exclusive) of a line-break tag at `i` — br/hr with an
    * optional [ \t] run and self-closing slash, or the closing form of
    * a [[BlockClose]] tag — or -1. Mirrors the pass-3 regex exactly.
    */
  private def blockBreakEnd(h: String, i: Int): Int = {
    var j = i + 1
    if (j >= h.length) return -1
    val isClose = h.charAt(j) == '/'
    if (isClose) j += 1
    val nameStart = j
    while (j < h.length && { val c = lowerAt(h, j)
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') }) j += 1
    if (j == nameStart) return -1
    val name = h.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
    var k = j
    while (k < h.length && (h.charAt(k) == ' ' || h.charAt(k) == '\t')) k += 1
    if (!isClose) {
      if (name != "br" && name != "hr") return -1
      if (k < h.length && h.charAt(k) == '/') k += 1
      if (k < h.length && h.charAt(k) == '>') k + 1 else -1
    } else {
      if (!BlockClose.contains(name)) return -1
      if (k < h.length && h.charAt(k) == '>') k + 1 else -1
    }
  }

  /** End index (exclusive) of the generic-strip (pass 4) match for a
    * '<' at `i`, or -1 when no terminator survives. Pass 4 runs AFTER
    * raw-block removal and block breaking, so its `[^>]*` run skips
    * straight over the SPANS those passes already replaced — a '>'
    * inside a script block or belonging to a `</p>` is not available
    * to close an earlier dangling '<' — and terminates at the first
    * '>' the earlier passes left standing (a literal text '>' or a
    * later generic tag's close). Interior content of the match — \n
    * breaks included — collapses into the single ' ' replacement,
    * exactly like the regex.
    */
  private def genericTagEnd(h: String, i: Int): Int = {
    var j = i + 1
    while (j < h.length) {
      val c = h.charAt(j)
      if (c == '>') return j + 1
      if (c == '<') {
        val se = {
          val s = rawBlockEnd(h, j, "script")
          if (s >= 0) s else rawBlockEnd(h, j, "style")
        }
        if (se >= 0) j = se
        else {
          val be = blockBreakEnd(h, j)
          if (be >= 0) j = be else j += 1
        }
      } else j += 1
    }
    -1
  }

  /** The scanner — static so generated and interpreted eval share one
    * implementation. Returns (text, n_lines, n_kept): kept lines
    * joined with '\n', the count of nonempty cleaned lines, and the
    * count that passed the `minWords` rule.
    */
  def extract(s: UTF8String, minWords: Int): InternalRow = {
    val h = s.toString
    val n = h.length
    val line = new java.lang.StringBuilder(96)
    val kept = new java.lang.StringBuilder(n / 2)
    var nLines = 0
    var nKept = 0

    def finishLine(): Unit = {
      // collapse [ \t\f\r]+ to single spaces, trim, count words
      val m = line.length
      val cleaned = new java.lang.StringBuilder(m)
      var i = 0
      var pendingSpace = false
      while (i < m) {
        val c = line.charAt(i)
        if (c == ' ' || c == '\t' || c == '\f' || c == '\r') {
          pendingSpace = cleaned.length > 0
        } else {
          if (pendingSpace) { cleaned.append(' '); pendingSpace = false }
          cleaned.append(c)
        }
        i += 1
      }
      line.setLength(0)
      if (cleaned.length > 0) {
        nLines += 1
        var words = 1
        var j = 0
        while (j < cleaned.length) {
          if (cleaned.charAt(j) == ' ') words += 1
          j += 1
        }
        if (words >= minWords) {
          if (nKept > 0) kept.append('\n')
          kept.append(cleaned)
          nKept += 1
        }
      }
    }

    var i = 0
    while (i < n) {
      val c = h.charAt(i)
      if (c == '<') {
        val scriptEnd = rawBlockEnd(h, i, "script")
        val end = if (scriptEnd >= 0) scriptEnd else rawBlockEnd(h, i, "style")
        if (end >= 0) {
          line.append(' ')
          i = end
        } else {
          val be = blockBreakEnd(h, i)
          if (be >= 0) {
            finishLine()
            i = be
          } else {
            val ge = genericTagEnd(h, i)
            if (ge >= 0) {
              line.append(' ')
              i = ge
            } else {
              // no surviving terminator: pass 4 leaves the '<' (and
              // everything after it) literal
              line.append(c)
              i += 1
            }
          }
        }
      } else if (c == '&') {
        var e = 0
        var matched = false
        while (e < Entities.length && !matched) {
          val (pat, rep) = Entities(e)
          if (h.startsWith(pat, i)) {
            line.append(rep)
            i += pat.length
            matched = true
          }
          e += 1
        }
        if (!matched) { line.append(c); i += 1 }
      } else if (c == '\n') {
        finishLine()
        i += 1
      } else {
        line.append(c)
        i += 1
      }
    }
    finishLine()
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), nLines, nKept))
  }

  def apply(html: Column, minWords: Int): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(html), minWords))
}
