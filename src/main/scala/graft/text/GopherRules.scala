package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composite rule-based quality screen — the Gopher/Dolma-style
  * filter policy: a document is kept only if it passes EVERY rule, and
  * each drop carries the machine-readable list of rules it broke (the
  * audit trail a curation pipeline needs to tune thresholds without
  * re-running the corpus).
  *
  * Rules (thresholds calibrated to the synthetic corpus so each rule
  * genuinely fires — real pipelines pass their own [[Config]]):
  *   - `wordcount`: n_words outside [minWords, maxWords]
  *   - `meanlen`:   avg word length outside [minAvgWordLen, maxAvgWordLen]
  *   - `stopword`:  stopword ratio below minStopwordRatio (no function
  *                  words → word salad / non-prose)
  *   - `diversity`: distinct/total words below minDiversity (looping
  *                  or template text)
  *   - `repetition`: most frequent bigram above maxTopBigramFrac of
  *                  all bigrams (degenerate repetition)
  *
  * Shape: the scalar rules are one shuffle-free projection; the
  * repetition signal is [[Repetition.metrics]]' bounded per-doc
  * aggregate, joined back id-keyed (summary frames only). All
  * comparisons are single-division doubles against literals — the
  * oracle reproduces every verdict bit-exactly.
  */
object GopherRules {

  case class Config(
      minWords: Int = 20, maxWords: Int = 90,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 4.8,
      minStopwordRatio: Double = 0.01,
      minDiversity: Double = 0.30,
      maxTopBigramFrac: Double = 0.10)

  /** (doc_id, n_words, avg_word_len, stopword_ratio, diversity,
    * top_2gram_frac, keep, reasons) — `reasons` is the comma-joined
    * broken-rule list in fixed rule order, empty when kept.
    */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val w = words(col(textCol))
    val nw = size(w)
    val scalar = docs.select(
      col(idCol).as("doc_id"),
      nw.cast("bigint").as("n_words"),
      ((length(col(textCol)) - nw + 1).cast("double") / nw)
        .as("avg_word_len"),
      (TextStats.stopwordCount(w).cast("double") / nw).as("stopword_ratio"),
      (size(array_distinct(w)).cast("double") / nw).as("diversity"))
    val rep = Repetition.metrics(docs, idCol, textCol)
      .select(col("doc_id"), col("top_2gram_frac"))
    val joined = scalar.join(rep, "doc_id")
    def broken(cond: Column, name: String): Column =
      when(cond, lit(name)).otherwise(lit(null).cast("string"))
    val reasons = concat_ws(",",
      broken(col("n_words") < cfg.minWords ||
        col("n_words") > cfg.maxWords, "wordcount"),
      broken(col("avg_word_len") < cfg.minAvgWordLen ||
        col("avg_word_len") > cfg.maxAvgWordLen, "meanlen"),
      broken(col("stopword_ratio") < cfg.minStopwordRatio, "stopword"),
      broken(col("diversity") < cfg.minDiversity, "diversity"),
      broken(col("top_2gram_frac") > cfg.maxTopBigramFrac, "repetition"))
    joined
      .withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
      .select("doc_id", "n_words", "avg_word_len", "stopword_ratio",
        "diversity", "top_2gram_frac", "keep", "reasons")
  }
}
