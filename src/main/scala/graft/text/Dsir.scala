package graft.text

import graft.expressions.UnigramScore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023, public
  * method): score every raw document by how much more likely its hashed
  * n-gram features are under a trusted TARGET distribution than under
  * the RAW corpus distribution,
  *
  *   log w(d) = Σ_f  ln p_target(f) − ln p_raw(f)
  *
  * with features = unigrams then bigrams, each hashed into `buckets`
  * cells. The hashing is the whole scale story: both distributions are
  * bounded `buckets`-cell count tables no matter how large either
  * corpus' vocabulary is, so the fitted model broadcasts and scoring is
  * a pure per-row projection — the corpus NEVER shuffles for scoring.
  *
  * Spark shape:
  *   - features: one projection — [[TokenCount.tokens]] (native
  *     one-pass scanner), bigrams via `zip_with` against the shifted
  *     array, buckets via the native md5-prefix hash
  *     ([[graft.text.TextFeatures.hash32]] mod `buckets`), all inside
  *     whole-stage codegen;
  *   - fitting: ONE map-side-combined (bucket) aggregate per
  *     distribution — the shuffle carries ≤ `buckets` rows per side
  *     regardless of corpus size (the HLL-register shape);
  *   - scoring: TWO [[graft.expressions.UnigramScore]] native folds
  *     over the SAME feature array (O(1) hash lookups in generated
  *     code); `log w = nll_raw − nll_target` since each nll is
  *     Σ −ln(smoothed/denom).
  *
  * Smoothing: add-one over the bucket space, `denom_c = total_c +
  * buckets` — unseen buckets read count 0 from the map-miss path, the
  * same smoothed mass as an explicit zero entry.
  *
  * Cross-engine determinism: both engines fold the feature array in
  * position order (unigrams first, then bigrams), apply the same
  * parenthesization, and the log-weight floor-quantizes at 1e-6 before
  * crossing the gate (the `nll_q` discipline — libm's last ulp cannot
  * flip a floor except on a boundary measure-zero set).
  *
  * `keep = 1` iff `logw_q > 0`: the document looks more target-like
  * than raw-average. (True DSIR resamples ∝ exp(log w); the
  * deterministic threshold face is the gate-friendly screen, and a
  * caller can feed `logw_q` into [[graft.operators.Sampling]] for the
  * stochastic variant.)
  */
object Dsir {

  final case class Config(
      targetSources: Seq[String] = Seq("src0", "src1"),
      buckets: Int = 512)

  /** Driver-side fitted importance model: two bounded bucket→count
    * maps (keys are bucket ids rendered as strings — the vocabulary
    * type of the shared native fold) plus their denominators.
    */
  final case class Model(
      targetCounts: Map[String, Long], targetDenom: Double,
      rawCounts: Map[String, Long], rawDenom: Double)

  /** Hashed feature array of a text column: unigram buckets in token
    * order, then bigram buckets in position order.
    */
  def features(text: Column, buckets: Int): Column = {
    val toks = TokenCount.tokens(coalesce(text, lit("")))
    def bucket(s: Column): Column =
      pmod(TextFeatures.hash32(s), lit(buckets.toLong)).cast("string")
    val uni = transform(toks, t => bucket(t))
    // zip_with pads the shorter side with null; the trailing null
    // bigram is filtered before hashing so position order is exact.
    // (slice length must be a real size — start+length saturating at
    // Int.MaxValue silently yields an empty slice)
    val bi = transform(
      filter(zip_with(toks, slice(toks, lit(2), greatest(size(toks), lit(1))),
        (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
        p => p.isNotNull),
      p => bucket(p))
    concat(uni, bi)
  }

  def fit(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): Model = {
    val feats = docs.select(
      col("source"),
      explode(features(col(textCol), cfg.buckets)).as("b"))
    val isTarget = col("source").isin(cfg.targetSources: _*)
    // one (bucket)-keyed aggregate carries both distributions: raw =
    // every doc, target = the trusted-source slice
    val counts = feats
      .groupBy(col("b"))
      .agg(sum(when(isTarget, 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_r"))
      .collect()
    val nT = counts.map(_.getLong(1)).sum
    val nR = counts.map(_.getLong(2)).sum
    Model(
      targetCounts = counts.filter(_.getLong(1) > 0L)
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      targetDenom = (nT + cfg.buckets).toDouble,
      rawCounts = counts.map(r => r.getString(0) -> r.getLong(2)).toMap,
      rawDenom = (nR + cfg.buckets).toDouble)
  }

  /** (doc_id, n_feats, logw_q, keep) for every document; empty docs
    * carry logw_q = 0 (no evidence either way) and keep = 0.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, m: Model): DataFrame = {
    val f = col("__f")
    val lw = col("__ur").getItem(1) - col("__ut").getItem(1)
    docs
      .withColumn("__f", features(col(textCol), buckets))
      .withColumn("__ut", UnigramScore(f, m.targetCounts, m.targetDenom))
      .withColumn("__ur", UnigramScore(f, m.rawCounts, m.rawDenom))
      .withColumn("__lwq", floor(lw * 1e6d).cast("bigint"))
      .select(
        col(idCol).as("doc_id"),
        size(f).cast("bigint").as("n_feats"),
        col("__lwq").as("logw_q"),
        when(col("__lwq") > 0L, 1).otherwise(0).as("keep"))
  }

  /** Fit-and-score in one call (the gate face): raw = `docs`, target =
    * the trusted-source slice of `docs`.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    scoreWith(docs, idCol, textCol, cfg.buckets,
      fit(docs, idCol, textCol, cfg))
}
