package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-fertility audit: bytes-per-token by predicted language —
  * the read a team takes BEFORE training or adopting a tokenizer on a
  * multilingual corpus. A language whose bytes/token ratio is far
  * above the corpus norm is under-served by the token inventory (its
  * text fragments into many short tokens — more sequence positions
  * per byte of content, worse effective context length), the standard
  * fertility argument from multilingual-tokenizer evaluations.
  *
  * Shape: language vote, byte length, and token count fold into ONE
  * per-row projection (no join back — [[LangId.predictCol]] is a
  * column, [[TokenCount.tokens]] a native scan), then one map-side-
  * combined aggregate keyed by language. Shuffle = |languages| rows of
  * three long sums; output is a |languages|-row summary frame.
  *
  * Determinism: counts and byte lengths are integers; the ratio leaves
  * as an integer-division fixed point (milli, not ppm — `n_bytes·1000`
  * stays inside a long through ~9 PB per language, a bound a 100 TB
  * corpus clears with two orders of magnitude to spare).
  */
object Fertility {

  /** Per-language (n_docs, n_bytes, n_tokens, bpt_milli) sorted by
    * language code. `bpt_milli` = ⌊1000 · bytes / tokens⌋, null for a
    * language bucket with no tokens at all.
    */
  def byLanguage(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(
        LangId.predictCol(TextFeatures.words(col(textCol))).as("lang"),
        octet_length(col(textCol)).cast("long").as("bytes"),
        size(TokenCount.tokens(col(textCol))).cast("long").as("toks"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("bytes").as("n_bytes"),
        sum("toks").as("n_tokens"))
      .withColumn("bpt_milli",
        when(col("n_tokens") > 0,
          expr("(n_bytes * 1000L) div n_tokens")))
      .orderBy("lang")
}
