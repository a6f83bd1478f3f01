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

  /** The fitted model as a ONE-ROW frame (__m: token→count map,
    * __denom: smoothing denominator) — broadcastable, persistable, and
    * usable as the static side of a stream-static join so live
    * documents score against a frozen corpus model.
    */
  def model(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    // ONE corpus tokenize feeds both the top-k cut and the smoothing
    // denominator: the per-token table persists (vocabulary-sized —
    // the staging table a 100 TB model build would write anyway) and
    // the two tiny aggregates read it back, instead of re-scanning and
    // re-tokenizing the corpus for the total. The model is computed
    // EAGERLY (it is one bounded row by construction) so the staging
    // cache can drop before this returns; the returned frame is a
    // local relation — broadcastable, persistable, and stream-static
    // joinable exactly like the lazy form it replaces.
    // ONE token-keyed aggregate (r16): the old per-(token, doc_id)
    // pre-grouping summed to the same totals but shuffled the larger
    // (token, doc) key space through an extra exchange — a unigram
    // model never needs doc attribution, and map-side combine on the
    // token key alone is strictly tighter.
    val tokTable = docs
      .select(explode(TokenCount.tokens(coalesce(col(textCol), lit(""))))
        .as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .persist()
    try {
      val fitted = tokTable
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(k)
        .agg(map_from_entries(
          collect_list(struct(col("token"), col("n_occurrences"))))
          .as("__m"))
        .crossJoin(tokTable.agg(sum(col("n_occurrences")).as("__total")))
        .select(col("__m"),
          (col("__total") + lit(k.toLong) + lit(1L)).cast("double")
            .as("__denom"))
      val row = fitted.head()
      fitted.sparkSession.createDataFrame(
        java.util.List.of(row), fitted.schema)
    } finally tokTable.unpersist()
  }

  /** (doc_id, n_tokens, n_oov, rarity_mean, nll_q) per document; empty
    * docs score (0, 0, 0.0, 0). One-corpus form: fit on `docs`, score
    * `docs`.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame =
    scoreWith(docs, idCol, textCol, model(docs, idCol, textCol, k))

  /** [[scoreWith]] through the native codegen'd
    * [[graft.expressions.UnigramScore]] expression: the bounded model
    * row is collected once at plan build (the same driver-side class
    * as a broadcast) and the three accumulators fold in ONE generated
    * loop with O(1) hash-map lookups — vs interpreted lambda dispatch
    * plus a LINEAR vocabulary scan per `element_at` in the HOF form.
    * Bit-identical output (spec'd; the oracle re-proves it per round).
    */
  def scoreFast(docs: DataFrame, idCol: String, textCol: String,
      fitted: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val row = fitted.select(col("__m"), col("__denom")).head()
    val vocab = row.getAs[Map[String, Long]](0)
    val denom = row.getDouble(1)
    val u = col("__u")
    docs
      .withColumn("__toks", TokenCount.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__n", size(col("__toks")).cast("bigint"))
      .withColumn("__u",
        graft.expressions.UnigramScore(col("__toks"), vocab, denom))
      .select(Seq(
        col(idCol).as("doc_id"),
        col("__n").as("n_tokens"),
        u.getItem(2).cast("bigint").as("n_oov"),
        when(col("__n") > 0, u.getItem(0) / col("__n"))
          .otherwise(0.0d).as("rarity_mean"),
        when(col("__n") > 0,
            floor(u.getItem(1) / col("__n") * 1e6d).cast("bigint"))
          .otherwise(0L).as("nll_q"))
        // `keep`: grouping columns ride the projection (a re-join on
        // doc_id to recover them would be a corpus-scale shuffle)
        ++ keep.map(col): _*)
  }

  /** Score any frame (batch or stream) against a fitted [[model]].
    *
    * ONE fold computes all three accumulators (higher-order functions
    * evaluate interpreted — three separate passes cost 3× the lambda
    * dispatch, measured ~2× wall-clock on the 500k-doc stress), and
    * the token array is a named column so the tokenizer regex runs
    * once per row, not once per consumer. `acc - log(x)` folds
    * bit-identically to `acc + (-log(x))` — IEEE subtraction IS
    * addition of the negation — so the oracle's term-wise formulation
    * still hash-matches.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      fitted: DataFrame): DataFrame = {
    docs.crossJoin(broadcast(fitted))
      .withColumn("__toks", TokenCount.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__n", size(col("__toks")).cast("bigint"))
      // ONE vocab lookup per token (interpreted HOFs do no CSE — the
      // fold referencing element_at three times would linear-scan the
      // map three times per token); cnt = 0 means OOV since every
      // vocab entry has >= 1 occurrence
      .withColumn("__cnts",
        transform(col("__toks"),
          t => coalesce(element_at(col("__m"), t), lit(0L))))
      .withColumn("__acc",
        aggregate(col("__cnts"),
          struct(lit(0.0d).as("rar"), lit(0.0d).as("nll"),
            lit(0L).as("oov")),
          (acc, c) => {
            val sm = (c + lit(1L)).cast("double")
            struct(
              (acc("rar") + col("__denom") / sm).as("rar"),
              (acc("nll") - log(sm / col("__denom"))).as("nll"),
              (acc("oov") + when(c === 0L, 1L).otherwise(0L)).as("oov"))
          }))
      .select(
        col(idCol).as("doc_id"),
        col("__n").as("n_tokens"),
        col("__acc")("oov").as("n_oov"),
        when(col("__n") > 0, col("__acc")("rar") / col("__n"))
          .otherwise(0.0d).as("rarity_mean"),
        when(col("__n") > 0,
            floor(col("__acc")("nll") / col("__n") * 1e6d).cast("bigint"))
          .otherwise(0L).as("nll_q"))
  }
}
