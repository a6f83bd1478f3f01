package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocations: the corpus's top word pairs by pointwise mutual
  * information — the classic collocation-mining statistic (Church &
  * Hanks 1990), and the corpus-level companion to the per-document
  * bigram histograms of [[Repetition]] (a pipeline uses it to spot
  * template phrases and tokenizer-merge candidates).
  *
  * PMI = log(p(ab) / (p(a)·p(b))). The log is monotone, so ranking by
  * the RATIO c_ab·N² / (M·c_a·c_b) is ranking by PMI without the
  * non-portable libm call ([[TfIdf]]'s trick). The numerator and
  * denominator are built as EXACT decimal integers (c_ab·N² can pass
  * 2^63 on a large corpus) and the score is one int→double conversion
  * each plus one division — all correctly-rounded IEEE ops, so the
  * doubles are bit-identical cross-engine and the top-k cut is
  * portable.
  *
  * Scale shape: bigrams and unigrams aggregate map-side combined
  * (shuffle = distinct grams, not token count); the two count tables
  * join on the token (vocabulary-sized relations); corpus totals ride a
  * broadcast 1-row frame; the final top-k is `orderBy.limit` →
  * TakeOrderedAndProject (per-task k-heap + driver merge — no reducer
  * ever holds the full pair table).
  */
object Collocations {


  /** Top-`k` adjacent-word pairs by PMI ratio among pairs seen at least
    * `minPairCount` times: (tok_a, tok_b, c_ab, c_a, c_b, pmi_ratio),
    * ordered by (pmi_ratio desc, tok_a, tok_b).
    */
  def topPmi(docs: DataFrame, textCol: String, k: Int,
      minPairCount: Long = 5L): DataFrame = {
    // Adjacent pairs ride the native bigram scan ([[TextFeatures.
    // textGrams]]): tokens are split on single spaces so they never
    // CONTAIN one — each bigram's one space is the separator, and
    // `substring_index` recovers both sides losslessly (empty tokens
    // included). Fully codegen'd; replaces an interpreted
    // struct-building HOF (was the slowest text-family scan).
    val pairs = docs
      .select(explode(TextFeatures.textGrams(col(textCol), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("tok_a"),
        substring_index(col("g"), " ", -1).as("tok_b"))
    val toks = docs
      .select(explode(TextFeatures.words(col(textCol))).as("tok"))

    val pairCounts = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
    val uniCounts = toks.groupBy("tok").agg(count(lit(1)).as("c_tok"))
    // totals BEFORE the min-count filter — M is the real pair mass
    val totals = pairs.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(toks.agg(count(lit(1)).as("n_toks")))

    val dec = "decimal(38,0)"
    pairCounts
      .join(uniCounts.select(col("tok").as("tok_a"), col("c_tok").as("c_a")),
        "tok_a")
      .join(uniCounts.select(col("tok").as("tok_b"), col("c_tok").as("c_b")),
        "tok_b")
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        (col("c_ab").cast(dec) * col("n_toks") * col("n_toks"))
          .cast(dec).cast("double")
          ./((col("n_pairs").cast(dec) * col("c_a") * col("c_b"))
            .cast(dec).cast("double"))
          .as("pmi_ratio"))
      .orderBy(desc("pmi_ratio"), asc("tok_a"), asc("tok_b"))
      .limit(k)
  }
}
