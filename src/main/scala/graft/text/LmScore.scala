package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the classic corpus-quality signal
  * (CCNet-style): score each document by how surprising its tokens are
  * under a unigram model of the corpus itself. Gibberish and
  * boilerplate land far from the corpus mean in opposite directions.
  *
  * The model is the TOP-`k` vocabulary with add-one smoothing over a
  * fixed denominator `total + k + 1`; everything outside the vocab is
  * one shared OOV class. A bounded vocabulary is what makes the
  * operator scale: the token→count map stays a k-entry broadcast no
  * matter how large the corpus vocabulary grows (same design as
  * [[Vocab.encode]]), and scoring is a pure per-row projection — the
  * corpus never shuffles.
  *
  * Two scores per document, both left-fold sums in token order:
  *   - `rarity_mean`: mean of denom/(count+1) — every step is a single
  *     IEEE division or addition, bit-identical in any engine that
  *     folds in the same order (the oracle hash-gates it);
  *   - `nll_q`: mean negative log-likelihood, floor-quantized to 1e-6
  *     — ln comes from the platform libm, where engines may differ in
  *     the last ulp; quantization makes the cross-engine comparison
  *     robust (a boundary-straddling ulp remains astronomically
  *     unlikely per corpus).
  */
object LmScore {

  /** (doc_id, n_tokens, n_oov, rarity_mean, nll_q) per document; empty
    * docs score (0, 0, 0.0, 0).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val counts = Vocab.topTokens(docs, idCol, textCol, k)
      .select(col("token"), col("n_occurrences").as("cnt"))
    val model = counts
      .agg(map_from_entries(collect_list(struct(col("token"), col("cnt"))))
        .as("__m"))
      .crossJoin(
        docs.select(explode(TokenCount.tokens(coalesce(col(textCol),
          lit("")))).as("t"))
          .agg(count(lit(1)).as("__total")))
      .select(col("__m"),
        (col("__total") + lit(k.toLong) + lit(1L)).cast("double")
          .as("__denom"))
    // per-token smoothed count: vocab hit -> cnt+1, OOV -> 1
    def smoothed(t: Column) =
      (coalesce(element_at(col("__m"), t), lit(0L)) + lit(1L)).cast("double")
    val toks = TokenCount.tokens(coalesce(col(textCol), lit("")))
    docs.crossJoin(broadcast(model))
      .withColumn("__n", size(toks).cast("bigint"))
      .withColumn("__rarsum",
        aggregate(transform(toks, t => col("__denom") / smoothed(t)),
          lit(0.0d), (acc, x) => acc + x))
      .withColumn("__nllsum",
        aggregate(transform(toks, t => -log(smoothed(t) / col("__denom"))),
          lit(0.0d), (acc, x) => acc + x))
      .select(
        col(idCol).as("doc_id"),
        col("__n").as("n_tokens"),
        size(filter(toks, t => element_at(col("__m"), t).isNull))
          .cast("bigint").as("n_oov"),
        when(col("__n") > 0, col("__rarsum") / col("__n"))
          .otherwise(0.0d).as("rarity_mean"),
        when(col("__n") > 0,
            floor(col("__nllsum") / col("__n") * 1e6d).cast("bigint"))
          .otherwise(0L).as("nll_q"))
  }
}
