package graft.text

import graft.expressions.UnigramScore
import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes domain classifier — the model-based quality
  * filter of the GPT-3 / CCNet lineage: train a bag-of-words classifier
  * to recognize a trusted reference domain, then keep crawl documents
  * the model scores as reference-like. (The reference engine has no
  * model-based filter; this is a north-star extension alongside the
  * rule-based `text_gopher` screen — the two are complementary: rules
  * catch structural junk, the classifier catches fluent-but-off-domain
  * text.)
  *
  * Training is exact counting — NB's likelihoods are closed-form token
  * frequencies, no gradient loop — which is what makes the trainer a
  * natural TWO-aggregate Spark job and the whole operator
  * oracle-replayable (a logistic/fastText trainer would put a
  * float-order-sensitive SGD loop between the data and the gate):
  *
  *   1. seed labeling is pure projection: positive = the trusted
  *      sources, negative = a deterministic md5-coordinate sample of
  *      the rest ([[graft.operators.Sampling.coordinate]] — retry-safe,
  *      engine-reproducible, no `rand()`);
  *   2. ONE map-side-combined (token) aggregate computes each token's
  *      per-class occurrence counts over the seed docs; the shared
  *      vocabulary is the top-`vocabK` rows by total count via
  *      `TakeOrderedAndProject` (per-task k-row heaps — the full seed
  *      vocabulary never lands on one reducer, same shape as
  *      [[Vocab.topTokens]]);
  *   3. ONE scalar aggregate computes per-class token totals and doc
  *      counts (the priors).
  *
  * Scoring is a pure per-row projection — the corpus NEVER shuffles:
  * both class models are bounded `vocabK`-entry maps embedded in two
  * [[graft.expressions.UnigramScore]] native expressions (O(1) hash
  * lookups inside whole-stage codegen), and the per-doc log-odds is
  *
  *   lo = (ln n_pos_docs − ln n_neg_docs) + (nll_neg − nll_pos)
  *
  * where `nll_c = Σ_t −ln((cnt_c(t)+1)/denom_c)` with
  * `denom_c = total_c + vocabK + 1` (add-one smoothing, one shared OOV
  * class — exactly [[LmScore]]'s smoothing, per class). Both engines
  * fold the nll in token order and apply the same parenthesization, so
  * the only cross-engine wiggle is libm's last ulp — absorbed by
  * floor-quantizing the log-odds at 1e-6 before it crosses the gate
  * (the `nll_q` discipline).
  *
  * Output: (doc_id, n_tokens, n_oov, logodds_q, pred) for EVERY corpus
  * document; `pred = 1` iff `logodds_q > 0` (so the decision is made on
  * the quantized value both engines agree on). Empty/null docs carry
  * the prior alone.
  */
object NbQuality {

  /** @param posSources sources whose documents form the positive
    *                   (reference-domain) seed
    * @param negRate    md5-coordinate sampling rate for the negative
    *                   seed drawn from all non-positive sources
    * @param negSalt    salt for the negative draw (independent samples
    *                   per experiment)
    * @param vocabK     shared-vocabulary size (both class models are
    *                   bounded by it)
    */
  final case class Config(
      posSources: Seq[String] = Seq("src0", "src1"),
      negRate: Double = 0.25,
      negSalt: String = "nbneg",
      vocabK: Int = 200)

  /** Driver-side fitted model: bounded `vocabK`-entry per-class count
    * maps plus the smoothing denominators and doc-count priors.
    * Collected in TWO jobs (vocab top-k, scalar totals) regardless of
    * corpus size.
    */
  /** `vocabK` is the K used in the smoothing denominators
    * (`denom = total + vocabK + 1`) — stored explicitly because the
    * count maps can hold FEWER than K entries (a seed corpus with a
    * small vocabulary), so [[merge]] must not infer K from map size.
    */
  final case class Model(
      posCounts: Map[String, Long], posDenom: Double,
      negCounts: Map[String, Long], negDenom: Double,
      nPosDocs: Long, nNegDocs: Long, vocabK: Int)

  private def isPos(cfg: Config) = col("source").isin(cfg.posSources: _*)

  /** The labeled seed frame: (doc_id, text, __lbl 1/0). */
  private def seed(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame =
    docs
      .filter(isPos(cfg) ||
        Sampling.coordinate(col(idCol), cfg.negSalt) < cfg.negRate)
      .select(col(idCol).as("doc_id"),
        coalesce(col(textCol), lit("")).as("text"),
        when(isPos(cfg), 1L).otherwise(0L).as("__lbl"))

  def fit(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): Model = {
    val s = seed(docs, idCol, textCol, cfg)
    // one (token)-keyed aggregate; the conditional sums ride the same
    // map-side combine, so the shuffle carries one row per distinct
    // seed token with both class counts aboard
    val vocab = s
      .select(col("__lbl"), explode(TokenCount.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(sum(col("__lbl")).as("n_pos"),
        sum(lit(1L) - col("__lbl")).as("n_neg"))
      .orderBy((col("n_pos") + col("n_neg")).desc, col("token"))
      .limit(cfg.vocabK)
      .collect()
    // scalar totals: per-class token totals over ALL seed tokens (not
    // just vocabulary survivors — LmScore's denominator convention) and
    // the doc-count priors
    val t = s
      .select(col("__lbl"),
        size(TokenCount.tokens(col("text"))).cast("long").as("__n"))
      .agg(
        sum(when(col("__lbl") === 1L, col("__n")).otherwise(0L)).as("tp"),
        sum(when(col("__lbl") === 0L, col("__n")).otherwise(0L)).as("tn"),
        sum(col("__lbl")).as("dp"),
        sum(lit(1L) - col("__lbl")).as("dn"))
      .head()
    val k = cfg.vocabK.toLong
    Model(
      posCounts = vocab.map(r => r.getString(0) -> r.getLong(1)).toMap,
      posDenom = (t.getLong(0) + k + 1L).toDouble,
      negCounts = vocab.map(r => r.getString(0) -> r.getLong(2)).toMap,
      negDenom = (t.getLong(1) + k + 1L).toDouble,
      nPosDocs = t.getLong(2), nNegDocs = t.getLong(3),
      vocabK = cfg.vocabK)
  }

  /** [[fit]] against a FIXED caller-supplied vocabulary instead of the
    * seed's top-K — the incremental-maintenance form: with the
    * vocabulary pinned, every model component is an exact integer (or
    * derived from one), so batch models [[merge]] EXACTLY into a
    * standing model (the AggMerge discipline) — a nightly crawl folds
    * in without ever re-scanning the corpus. The shuffle also shrinks:
    * only vocabulary tokens survive the pre-aggregate filter.
    */
  def fitWithVocab(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config, vocab: Seq[String]): Model = {
    require(vocab.nonEmpty, "vocabulary must be non-empty")
    require(vocab.distinct.size == vocab.size, "vocabulary has duplicates")
    val s = seed(docs, idCol, textCol, cfg)
    val seen = s
      .select(col("__lbl"), explode(TokenCount.tokens(col("text"))).as("token"))
      .filter(col("token").isin(vocab: _*))
      .groupBy(col("token"))
      .agg(sum(col("__lbl")).as("n_pos"),
        sum(lit(1L) - col("__lbl")).as("n_neg"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val t = s
      .select(col("__lbl"),
        size(TokenCount.tokens(col("text"))).cast("long").as("__n"))
      .agg(
        sum(when(col("__lbl") === 1L, col("__n")).otherwise(0L)).as("tp"),
        sum(when(col("__lbl") === 0L, col("__n")).otherwise(0L)).as("tn"),
        sum(col("__lbl")).as("dp"),
        sum(lit(1L) - col("__lbl")).as("dn"))
      .head()
    val k = vocab.size.toLong
    def lng(i: Int): Long = if (t.isNullAt(i)) 0L else t.getLong(i)
    Model(
      posCounts = vocab.map(t0 => t0 -> seen.get(t0).map(_._1).getOrElse(0L))
        .toMap,
      posDenom = (lng(0) + k + 1L).toDouble,
      negCounts = vocab.map(t0 => t0 -> seen.get(t0).map(_._2).getOrElse(0L))
        .toMap,
      negDenom = (lng(1) + k + 1L).toDouble,
      nPosDocs = lng(2), nNegDocs = lng(3), vocabK = vocab.size)
  }

  /** Exact merge of two fixed-vocabulary models (same key set
    * required): counts and totals sum pointwise — integers, so
    * `merge(fit(a), fit(b)) == fitWithVocab(a ∪ b)` EXACTLY (spec'd),
    * bit-equal scores included. Token totals are recovered from the
    * denominators (`denom = total + k + 1`, all integer-valued).
    */
  def merge(a: Model, b: Model): Model = {
    require(a.posCounts.keySet == b.posCounts.keySet &&
      a.negCounts.keySet == b.negCounts.keySet,
      "models must share one fixed vocabulary")
    require(a.vocabK == b.vocabK,
      s"models smooth over different K: ${a.vocabK} vs ${b.vocabK}")
    // token totals recovered via the STORED K, not map size — a fit()
    // model's maps can be smaller than its smoothing K
    val k = a.vocabK.toLong
    def total(denom: Double): Long = denom.toLong - k - 1L
    Model(
      posCounts = a.posCounts.map { case (t, n) => t -> (n + b.posCounts(t)) },
      posDenom = (total(a.posDenom) + total(b.posDenom) + k + 1L).toDouble,
      negCounts = a.negCounts.map { case (t, n) => t -> (n + b.negCounts(t)) },
      negDenom = (total(a.negDenom) + total(b.negDenom) + k + 1L).toDouble,
      nPosDocs = a.nPosDocs + b.nPosDocs,
      nNegDocs = a.nNegDocs + b.nNegDocs, vocabK = a.vocabK)
  }

  /** Score every document against a fitted model. Pure projection (two
    * native UnigramScore folds over ONE shared token array); the class
    * prior folds in driver-side so the whole log-odds agrees with the
    * oracle's explicit parenthesization.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame = {
    require(m.nPosDocs > 0 && m.nNegDocs > 0,
      s"both seed classes must be non-empty, got pos=${m.nPosDocs} " +
        s"neg=${m.nNegDocs}")
    val prior = math.log(m.nPosDocs.toDouble) - math.log(m.nNegDocs.toDouble)
    val toks = col("__toks")
    val lo = lit(prior) +
      (col("__un").getItem(1) - col("__up").getItem(1))
    docs
      .withColumn("__toks", TokenCount.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__up", UnigramScore(toks, m.posCounts, m.posDenom))
      .withColumn("__un", UnigramScore(toks, m.negCounts, m.negDenom))
      .withColumn("__loq", floor(lo * 1e6d).cast("bigint"))
      .select(
        col(idCol).as("doc_id"),
        size(toks).cast("bigint").as("n_tokens"),
        col("__up").getItem(2).cast("bigint").as("n_oov"),
        col("__loq").as("logodds_q"),
        when(col("__loq") > 0L, 1).otherwise(0).as("pred"))
  }

  /** Fit-and-score in one call (the gate face). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    scoreWith(docs, idCol, textCol, fit(docs, idCol, textCol, cfg))
}
