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
