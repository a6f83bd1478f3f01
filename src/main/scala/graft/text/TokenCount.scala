package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex ("BPE-ish") tokenization counts.
  *
  * Tokens are maximal runs of letters or of digits — the word/number
  * split every byte-pair-encoding pre-tokenizer performs. The pattern
  * uses only plain character classes so Spark's Java regex and the
  * oracle's RE2 agree. Per-row projection, zero shuffle.
  */
object TokenCount {

  /** Letter runs or digit runs. */
  val TokenPattern = "[a-z]+|[0-9]+"

  /** Unicode-mode pattern: letter runs of ANY script. The oracle form
    * applies `lower()` per MATCH (not per string) — see
    * [[graft.expressions.TokenRunsUnicode]] for the case-folding
    * contract that keeps the two engines bit-identical.
    */
  val TokenPatternUnicode = "[\\p{L}]+|[0-9]+"

  /** Tokenizer selection for every token-consuming operator: [[Ascii]]
    * (the default — the reference corpora are English, and the ASCII
    * byte scan is the fastest path) or [[Unicode]] (any-script letter
    * runs — the 100 TB multilingual setting, where CJK/Cyrillic text
    * must survive tokenization instead of dissolving into separators).
    * On pure-ASCII input the two modes produce IDENTICAL token arrays
    * (ScalaCheck'd in TokenRunsUnicodeSpec), so switching a pipeline
    * to Unicode never changes its behavior on the data the Ascii mode
    * was built for.
    */
  sealed trait Mode
  case object Ascii extends Mode
  case object Unicode extends Mode

  /** Tokenize via the native one-pass byte scanner
    * ([[graft.expressions.TokenRuns]]) — equivalent to
    * `regexp_extract_all(lower(text), TokenPattern)` (the form every
    * DuckDB oracle keeps, so the equivalence is re-proved by every
    * token-consuming gate each round; see TokenRuns for the exotic
    * non-ASCII case-folding caveat), without the regex machinery or
    * the full-row lowered copy.
    */
  def tokens(text: Column): Column =
    graft.expressions.TokenRuns(text)

  /** Mode-routed tokenization — the production entry point: Ascii
    * keeps the established byte scan, Unicode routes to the code-point
    * scan ([[graft.expressions.TokenRunsUnicode]]). Both are native
    * one-pass codegen'd expressions; the route is decided at PLAN
    * time, so the mode costs nothing per row.
    */
  def tokens(text: Column, mode: Mode): Column = mode match {
    case Ascii => graft.expressions.TokenRuns(text)
    case Unicode => graft.expressions.TokenRunsUnicode(text)
  }

  /** The regex formulation, kept for equivalence testing. */
  def tokensRegex(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** (id, n_tokens, n_distinct_tokens, n_numeric_tokens) per document. */
  def counts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      size(filter(t, x => x.rlike("^[0-9]+$"))).as("n_numeric_tokens"))
  }
}
