package graft.queries

import graft.text.{Dsir, NbQuality, TokenCount}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, when}

/** Model-based corpus filters: classifiers whose training is exact
  * counting, so trainer AND scorer replay in the DuckDB oracle (a
  * gradient trainer would put a float-order-sensitive loop between the
  * data and the gate).
  */
object ClassifierQueries {

  private val NbCfg = NbQuality.Config(
    posSources = Seq("src0", "src1"), negRate = 0.25,
    negSalt = "nbneg", vocabK = 200)

  /** Naive Bayes reference-domain classifier over the whole corpus:
    * fit on the src0/src1 positive seed vs a deterministic negative
    * draw, score every document. The oracle replays seed labeling, the
    * per-class token counts, the shared top-K vocabulary, both
    * smoothing denominators, the priors, and every token-ordered nll
    * fold — one hash pins trainer and scorer together.
    */
  def textNbQuality(spark: SparkSession, dir: String): DataFrame =
    NbQuality.score(Tables.loadSpread(spark, dir, "documents"),
        "doc_id", "text", NbCfg)
      .orderBy("doc_id")

  val textNbQualitySql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      s"md5('${NbCfg.negSalt}:'||CAST(doc_id AS VARCHAR))", 8)
    val posList = OracleDialect.stringList(NbCfg.posSources).stripPrefix("[")
      .stripSuffix("]")
    val k = NbCfg.vocabK
    s"""WITH s AS (SELECT doc_id,
       |    regexp_extract_all(lower(coalesce(text, '')),
       |      '${TokenCount.TokenPattern}') AS t,
       |    CASE WHEN source IN ($posList) THEN 1 ELSE 0 END AS lbl
       |  FROM documents
       |  WHERE source IN ($posList)
       |     OR CAST($coord AS DOUBLE) / 4294967296 < ${NbCfg.negRate}),
       |p AS (SELECT lbl, unnest(t) AS token FROM s),
       |vc AS (SELECT token, sum(lbl) AS n_pos, sum(1 - lbl) AS n_neg
       |  FROM p GROUP BY token),
       |v AS (SELECT token, n_pos, n_neg FROM vc
       |  ORDER BY (n_pos + n_neg) DESC, token LIMIT $k),
       |tot AS (SELECT
       |    sum(CASE WHEN lbl = 1 THEN len(t) ELSE 0 END) AS tp,
       |    sum(CASE WHEN lbl = 0 THEN len(t) ELSE 0 END) AS tn,
       |    sum(lbl) AS dp, sum(1 - lbl) AS dn
       |  FROM s),
       |d AS (SELECT CAST(tp + $k + 1 AS DOUBLE) AS dpos,
       |    CAST(tn + $k + 1 AS DOUBLE) AS dneg,
       |    ln(CAST(dp AS DOUBLE)) - ln(CAST(dn AS DOUBLE)) AS prior
       |  FROM tot),
       |at AS (SELECT doc_id,
       |    regexp_extract_all(lower(coalesce(text, '')),
       |      '${TokenCount.TokenPattern}') AS t
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t
       |  FROM at),
       |tok2 AS (SELECT doc_id, pos, t[pos] AS token FROM tok),
       |j AS (SELECT tok2.doc_id, tok2.pos,
       |    CAST(COALESCE(v.n_pos, 0) + 1 AS DOUBLE) AS cp,
       |    CAST(COALESCE(v.n_neg, 0) + 1 AS DOUBLE) AS cn,
       |    CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tok2 LEFT JOIN v ON v.token = tok2.token),
       |terms AS (SELECT j.doc_id, j.pos, j.oov,
       |    -ln(j.cp / d.dpos) AS nllp, -ln(j.cn / d.dneg) AS nlln
       |  FROM j CROSS JOIN d),
       |agg AS (SELECT doc_id, count(*) AS n,
       |    CAST(sum(oov) AS BIGINT) AS n_oov,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(nllp ORDER BY pos)), (a, b) -> a + b) AS np,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(nlln ORDER BY pos)), (a, b) -> a + b) AS nn
       |  FROM terms GROUP BY doc_id),
       |sc AS (SELECT doc.doc_id,
       |    CAST(COALESCE(a.n, 0) AS BIGINT) AS n_tokens,
       |    COALESCE(a.n_oov, 0) AS n_oov,
       |    CAST(floor((d.prior +
       |      (COALESCE(a.nn, 0.0) - COALESCE(a.np, 0.0))) * 1e6)
       |      AS BIGINT) AS logodds_q
       |  FROM documents doc
       |  LEFT JOIN agg a ON a.doc_id = doc.doc_id
       |  CROSS JOIN d)
       |SELECT doc_id, n_tokens, n_oov, logodds_q,
       |  CASE WHEN logodds_q > 0 THEN 1 ELSE 0 END AS pred
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  private val UncK = 50 // labeling budget per active-learning round

  /** Active-learning selection ([[graft.operators.UncertaintySample]]):
    * the $UncK documents whose NB log-odds sit closest to the decision
    * boundary — the "label these next" face over the `text_nbquality`
    * classifier. Gate-only: scoring is the benched NB face; selection
    * is a TakeOrderedAndProject (per-partition top-k, no global sort).
    * The oracle nests the full NB replay and re-ranks by
    * (|logodds_q|, doc_id) — exact because the score is already a
    * quantized LONG.
    */
  def clfUncertain(spark: SparkSession, dir: String): DataFrame =
    graft.operators.UncertaintySample.topUncertain(
      NbQuality.score(Tables.loadSpread(spark, dir, "documents"),
        "doc_id", "text", NbCfg),
      "doc_id", "logodds_q", UncK)

  val clfUncertainSql: String =
    s"""WITH nb AS MATERIALIZED (
       |$textNbQualitySql
       |)
       |SELECT rank, doc_id, logodds_q FROM (
       |  SELECT doc_id, logodds_q,
       |    ROW_NUMBER() OVER (ORDER BY abs(logodds_q), doc_id) AS rank
       |  FROM nb)
       |WHERE rank <= $UncK ORDER BY rank""".stripMargin

  /** Decile lift/calibration audit ([[graft.operators.LiftCurve]]) of
    * the NB domain classifier against its own ground truth (source ∈
    * posSources): exact global (score DESC, id) ranks via the
    * range-exchange bucket plan, then a 10-row summary frame of
    * per-decile and cumulative positive rates in ppm fixed-point.
    * Gate-only: scoring is the benched NB face and ranking is
    * `text_ppl_buckets`' grouped-exact-rank shape (one stratum);
    * what this gate adds is the cumulative lift arithmetic, pinned
    * exactly. The oracle nests the full NB replay and restates rank,
    * buckets, and every ppm ratio.
    */
  def clfLift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val scored = NbQuality.score(docs, "doc_id", "text", NbCfg)
      .select("doc_id", "logodds_q")
    val labeled = scored.join(
      docs.select(col("doc_id"),
        when(col("source").isin(NbCfg.posSources: _*), 1L)
          .otherwise(0L).as("label")),
      "doc_id")
    graft.operators.LiftCurve.deciles(labeled, "doc_id", "logodds_q",
      "label", nBuckets = 10)
  }

  val clfLiftSql: String = {
    val posList = OracleDialect.stringList(NbCfg.posSources)
      .stripPrefix("[").stripSuffix("]")
    s"""WITH nb AS MATERIALIZED (
       |$textNbQualitySql
       |),
       |lab AS (SELECT nb.doc_id, nb.logodds_q,
       |    CASE WHEN d.source IN ($posList) THEN 1 ELSE 0 END AS label
       |  FROM nb JOIN documents d ON d.doc_id = nb.doc_id),
       |r AS (SELECT doc_id, logodds_q, label,
       |    row_number() OVER (ORDER BY logodds_q DESC, doc_id) - 1 AS rk,
       |    count(*) OVER () AS nn
       |  FROM lab),
       |b AS (SELECT (rk * 10) // nn AS bucket, label FROM r),
       |per AS (SELECT bucket, count(*) AS n,
       |    CAST(sum(label) AS BIGINT) AS n_pos
       |  FROM b GROUP BY bucket),
       |c AS (SELECT bucket, n, n_pos,
       |    CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
       |    CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos,
       |    CAST(sum(n) OVER () AS BIGINT) AS tn,
       |    CAST(sum(n_pos) OVER () AS BIGINT) AS tp
       |  FROM per)
       |SELECT bucket, n, n_pos,
       |  (1000000 * n_pos) // n AS rate_ppm,
       |  cum_n, cum_pos,
       |  (1000000 * cum_pos) // cum_n AS cum_rate_ppm,
       |  CAST((1000000 * CAST(cum_pos AS HUGEINT) * tn)
       |    // (CAST(cum_n AS HUGEINT) * tp) AS BIGINT) AS cum_lift_ppm
       |FROM c ORDER BY bucket""".stripMargin
  }

  private val DsirCfg = Dsir.Config(
    targetSources = Seq("src0", "src1"), buckets = 512)

  /** DSIR hashed-ngram importance weights over the whole corpus: fit
    * target (src0/src1) and raw bucket distributions, score every
    * document's log importance weight. The oracle replays the feature
    * hashing (unigrams then bigrams, md5-prefix mod buckets), both
    * histograms, and every position-ordered ln fold.
    */
  def textDsir(spark: SparkSession, dir: String): DataFrame =
    Dsir.score(Tables.loadSpread(spark, dir, "documents"),
        "doc_id", "text", DsirCfg)
      .orderBy("doc_id")

  val textDsirSql: String = {
    val b = DsirCfg.buckets
    val posList = OracleDialect.stringList(DsirCfg.targetSources)
      .stripPrefix("[").stripSuffix("]")
    def bucket(expr: String) =
      s"CAST((${OracleDialect.hexPrefixToLong(s"md5($expr)", 8)}) % $b AS VARCHAR)"
    s"""WITH at AS (SELECT doc_id, source,
       |    regexp_extract_all(lower(coalesce(text, '')),
       |      '${TokenCount.TokenPattern}') AS t
       |  FROM documents),
       |f AS (SELECT doc_id, source,
       |    list_concat(
       |      list_transform(t, x -> ${bucket("x")}),
       |      list_transform(generate_series(1, len(t) - 1),
       |        i -> ${bucket("t[i] || ' ' || t[i + 1]")})) AS f
       |  FROM at),
       |p AS (SELECT source, unnest(f) AS b FROM f),
       |vc AS (SELECT b,
       |    sum(CASE WHEN source IN ($posList) THEN 1 ELSE 0 END) AS n_t,
       |    count(*) AS n_r
       |  FROM p GROUP BY b),
       |tot AS (SELECT sum(n_t) AS tt, sum(n_r) AS tr FROM vc),
       |d AS (SELECT CAST(tt + $b AS DOUBLE) AS dt,
       |    CAST(tr + $b AS DOUBLE) AS dr FROM tot),
       |tok AS (SELECT doc_id, unnest(generate_series(1, len(f))) AS pos, f
       |  FROM f),
       |tok2 AS (SELECT doc_id, pos, f[pos] AS b FROM tok),
       |j AS (SELECT tok2.doc_id, tok2.pos,
       |    CAST(COALESCE(vc.n_t, 0) + 1 AS DOUBLE) AS ct,
       |    CAST(COALESCE(vc.n_r, 0) + 1 AS DOUBLE) AS cr
       |  FROM tok2 LEFT JOIN vc ON vc.b = tok2.b),
       |terms AS (SELECT j.doc_id, j.pos,
       |    -ln(j.ct / d.dt) AS nt, -ln(j.cr / d.dr) AS nr
       |  FROM j CROSS JOIN d),
       |agg AS (SELECT doc_id, count(*) AS n,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(nt ORDER BY pos)), (a, b) -> a + b) AS nts,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(nr ORDER BY pos)), (a, b) -> a + b) AS nrs
       |  FROM terms GROUP BY doc_id),
       |sc AS (SELECT doc.doc_id,
       |    CAST(COALESCE(a.n, 0) AS BIGINT) AS n_feats,
       |    CAST(floor((COALESCE(a.nrs, 0.0) - COALESCE(a.nts, 0.0)) * 1e6)
       |      AS BIGINT) AS logw_q
       |  FROM documents doc LEFT JOIN agg a ON a.doc_id = doc.doc_id)
       |SELECT doc_id, n_feats, logw_q,
       |  CASE WHEN logw_q > 0 THEN 1 ELSE 0 END AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_nbquality" -> (textNbQuality(_, _)),
    "clf_uncertain" -> (clfUncertain(_, _)),
    "clf_lift" -> (clfLift(_, _)),
    "text_dsir" -> (textDsir(_, _)))

  val oracleSql: Map[String, String] = Map(
    "text_nbquality" -> textNbQualitySql,
    "clf_uncertain" -> clfUncertainSql,
    "clf_lift" -> clfLiftSql,
    "text_dsir" -> textDsirSql)
}
