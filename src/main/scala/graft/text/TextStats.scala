package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document quality statistics for corpus filtering.
  *
  * Everything is a per-row projection over built-ins — zero shuffle, so
  * at 100 TB this runs at parquet-scan speed and the only cost is the
  * scan itself (and column pruning keeps that to id + text).
  *
  * Cross-engine note: every double is produced by a SINGLE division (or
  * multiplication chain in fixed order) over integers, so the DuckDB
  * oracle reproduces the bits exactly.
  */
object TextStats {

  /** English-ish stopword set used for the stopword-ratio feature. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to")

  def nWords(w: Column): Column = size(w)

  /** Native one-loop membership count ([[graft.expressions.CountInSet]]
    * — the HOF `size(filter(w, isin))` evaluates interpreted);
    * equivalence spec'd, and the stats oracle re-proves it per round.
    */
  def stopwordCount(w: Column): Column =
    graft.expressions.CountInSet(w, Stopwords)

  /** Heuristic quality score in [0,1]:
    * length factor (saturates at 50 words) × lexical diversity
    * (distinct/total words). Deliberately simple and fully deterministic;
    * real pipelines swap in their own formula via [[describe]]'s columns.
    */
  def qualityScore(w: Column): Column = {
    val lengthFactor = least(lit(1.0), size(w).cast("double") / 50.0)
    val diversity = size(array_distinct(w)).cast("double") / size(w)
    lengthFactor * diversity
  }

  /** (id, n_chars, n_words, n_distinct_words, stopword_ratio,
    * avg_word_len, quality) — one row per document.
    */
  def describe(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nw = size(w)
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      nw.as("n_words"),
      size(array_distinct(w)).as("n_distinct_words"),
      (stopwordCount(w).cast("double") / nw).as("stopword_ratio"),
      // single-space-joined corpus: word chars = n_chars - (n_words - 1)
      ((length(col(textCol)) - nw + 1).cast("double") / nw).as("avg_word_len"),
      qualityScore(w).as("quality"))
  }
}
