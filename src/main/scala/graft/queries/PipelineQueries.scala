package graft.queries

import graft.operators.{CorpusOrder, Sampling, Sharding}
import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline as ONE oracle-checked query:
  * quality scoring + language ID + exact dedup + MinHash near-dedup,
  * composed exactly as [[graft.text.Curation.curate]] runs them. The
  * oracle chains the already-proven per-family SQL generators over the
  * same intermediate CTEs, so a pass here verifies the COMPOSITION
  * (stage ordering, column threading, keep-first policy), not just the
  * pieces.
  */
object PipelineQueries {

  private val cfg = Curation.Config() // quality>=0.4, lang=en, lsh defaults

  def pipelineCurate(spark: SparkSession, dir: String): DataFrame =
    Curation.curate(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .orderBy("doc_id")

  /** The curate oracle body over any (doc_id, text) relation — shared
    * by `pipeline_curate` (straight off `documents`) and
    * `pipeline_curate_html` (off the extraction CTE).
    */
  private def curateSqlFrom(rel: String): String = {
    import TextQueries.{langBestExpr, langPredCase, langScoreSelect, qualityExpr}
    s"""WITH w0 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
       |  FROM $rel),
       |feat AS (SELECT doc_id, text,
       |    $qualityExpr AS quality,
       |    $langScoreSelect
       |  FROM w0),
       |ranked AS (SELECT *, $langBestExpr AS best FROM feat),
       |scored AS (SELECT doc_id, text, quality,
       |    $langPredCase AS lang_pred
       |  FROM ranked),
       |kept AS (SELECT doc_id, text, quality, lang_pred FROM scored
       |  WHERE quality >= ${cfg.minQuality} AND lang_pred = '${cfg.lang}'),
       |dedup AS (SELECT doc_id, text, quality, lang_pred FROM (
       |    SELECT doc_id, text, quality, lang_pred,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM kept) WHERE rn = 1),
       |${DedupQueries.minhashJacCtes("dedup")},
       |losers AS (SELECT DISTINCT doc_b FROM jac
       |  WHERE jaccard >= ${cfg.lsh.threshold})
       |SELECT doc_id, lang_pred, quality FROM dedup
       |WHERE doc_id NOT IN (SELECT doc_b FROM losers)
       |ORDER BY doc_id""".stripMargin
  }

  val pipelineCurateSql: String = curateSqlFrom("documents")

  /** The raw-crawl composition: HTML fixture → [[graft.text.Extract]]
    * → the full curate pipeline — the missing front stage wired into
    * the existing flow, so the whole documents→html→text→curated
    * chain is pinned by one hash. The extraction runs the NATIVE
    * scanner; the oracle chains the declarative extraction CTEs into
    * the already-proven curate body.
    */
  def pipelineCurateHtml(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val ext = graft.text.Extract.fromHtml(
      docs.select(col("doc_id"),
        graft.text.Extract.syntheticHtml(col("doc_id"), col("source"),
          col("lang"), col("text")).as("html")),
      "doc_id", "html")
    Curation.curate(ext.select(col("doc_id"), col("text")),
        "doc_id", "text", cfg)
      .orderBy("doc_id")
  }

  val pipelineCurateHtmlSql: String = {
    import graft.text.Extract
    s"""WITH hh AS (SELECT doc_id, ${Extract.syntheticHtmlSql} AS html
       |  FROM documents),
       |${Extract.extractSqlCtes("hh")},
       |ext AS (SELECT doc_id, array_to_string(ks, chr(10)) AS text FROM x7),
       |${curateSqlFrom("ext").stripPrefix("WITH ")}""".stripMargin
  }

  // ---- URL/domain-level curation (graft.operators.DomainCuration) --
  // The testdata has no URL column; the gates plant a deterministic
  // one (3 hosts × 13 registrable domains), mirrored in SQL.

  private def withUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(
      lit("https://w"), (col("doc_id") % 3).cast("string"),
      lit(".d"), (col("doc_id") % 13).cast("string"),
      lit(".example/doc/"), col("doc_id").cast("string")))

  private val urlSqlExpr: String =
    "'https://w' || CAST(doc_id % 3 AS VARCHAR) || '.d' || " +
      "CAST(doc_id % 13 AS VARCHAR) || '.example/doc/' || " +
      "CAST(doc_id AS VARCHAR)"

  /** url → (doc_id…, domain) CTE chain shared by both domain oracles:
    * authority-host regex, then the last-two-labels registrable
    * domain (the [[graft.operators.DomainCuration]] definitions).
    */
  private def domainCtes(cols: String): String =
    s"""u AS (SELECT $cols, $urlSqlExpr AS url FROM documents),
       |hp AS (SELECT $cols, lower(regexp_extract(url,
       |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))
       |    AS host FROM u),
       |dp AS (SELECT $cols, host,
       |    CASE WHEN len(string_split(host, '.')) <= 2 THEN host
       |         ELSE string_split(host, '.')[-2] || '.' ||
       |              string_split(host, '.')[-1] END AS domain
       |  FROM hp)""".stripMargin

  /** Per-domain curation datasheet
    * ([[graft.operators.DomainCuration.domainStats]]): docs, hosts,
    * tokens, fixed-point quality mass, within-domain dup rows — the
    * numbers a per-domain governance review keys on.
    */
  def domainStats(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DomainCuration.domainStats(
        withUrls(Tables.loadSpread(spark, dir, "documents")), "url", "text")
      .orderBy("domain")

  val domainStatsSql: String = {
    import TextQueries.qualityExpr
    s"""WITH ${domainCtes("doc_id, text")},
       |w AS (SELECT domain, host, md5(text) AS h,
       |    string_split(lower(text), ' ') AS w FROM dp),
       |sc AS (SELECT domain, host, h,
       |    CAST(len(w) AS BIGINT) AS n_toks,
       |    CAST(floor(($qualityExpr) * 1048576e0) AS BIGINT) AS q_fp
       |  FROM w),
       |base AS (SELECT domain, count(*) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(q_fp) AS BIGINT) AS q_sum_fp
       |  FROM sc GROUP BY domain),
       |h0 AS (SELECT domain, host, count(*) AS c FROM sc
       |  GROUP BY domain, host),
       |hosts AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts
       |  FROM h0 GROUP BY domain),
       |d0 AS (SELECT domain, h, count(*) AS cnt FROM sc GROUP BY domain, h),
       |dups AS (SELECT domain,
       |    CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
       |      AS n_dup_rows
       |  FROM d0 GROUP BY domain)
       |SELECT b.domain, b.n_docs, h.n_hosts, b.n_tokens, b.q_sum_fp,
       |  d.n_dup_rows
       |FROM base b JOIN hosts h ON h.domain = b.domain
       |JOIN dups d ON d.domain = b.domain
       |ORDER BY b.domain""".stripMargin
  }

  private val BlockedDomains = Seq("d3.example", "d7.example")

  /** Blocklist screen + per-domain quota
    * ([[graft.operators.DomainCuration.screenBlocked]] →
    * [[graft.operators.DomainCuration.capPerDomain]]): blocked
    * domains anti-joined out (broadcast), then at most 5 docs per
    * surviving domain chosen by the deterministic salted coordinate —
    * the per-domain governance levers composed end to end.
    */
  def pipelineDomainCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = withUrls(Tables.loadSpread(spark, dir, "documents"))
      .select(col("doc_id"), col("url"))
    val screened = graft.operators.DomainCuration.screenBlocked(
      docs, "url", BlockedDomains.toDF("domain"))
    graft.operators.DomainCuration.capPerDomain(screened, "doc_id", "url", 5)
      .select(col("doc_id"), col("domain"))
      .orderBy("doc_id")
  }

  val pipelineDomainCapSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('domain-quota:'||CAST(doc_id AS VARCHAR))", 8)
    val blocked = BlockedDomains.map(d => s"'$d'").mkString(", ")
    s"""WITH ${domainCtes("doc_id")},
       |scr AS (SELECT doc_id, domain FROM dp
       |  WHERE domain NOT IN ($blocked))
       |SELECT doc_id, domain FROM scr
       |QUALIFY row_number() OVER (PARTITION BY domain
       |  ORDER BY CAST($coord AS DOUBLE) / 4294967296, doc_id) <= 5
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-document curation decision log
    * ([[graft.text.Curation.curateAudit]]): every doc with its
    * verdict (kept / first dropping stage) and the representative a
    * dedup drop lost to. Gate-only: runtime face is pipeline_curate
    * plus one md5-keyed window. The oracle replays every stage verdict
    * independently, so the hash pins the WHOLE decision table, not
    * just the kept set.
    */
  def pipelineAudit(spark: SparkSession, dir: String): DataFrame =
    Curation.curateAudit(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .orderBy("doc_id")

  /** The audit CTE chain (scores, exact-dup reps, survivor LSH,
    * near-dup losers) — shared by the audit and funnel oracles.
    */
  private val pipelineAuditCtes: String = {
    import TextQueries.{langBestExpr, langPredCase, langScoreSelect, qualityExpr}
    s"""w0 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |rep AS (SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY md5(text)) AS rep
       |  FROM documents),
       |feat AS (SELECT doc_id, text,
       |    $qualityExpr AS quality,
       |    $langScoreSelect
       |  FROM w0),
       |ranked AS (SELECT *, $langBestExpr AS best FROM feat),
       |scored AS (SELECT doc_id, text, quality,
       |    $langPredCase AS lang_pred
       |  FROM ranked),
       |surv AS (SELECT s.doc_id, s.text FROM scored s
       |  JOIN rep r ON r.doc_id = s.doc_id
       |  WHERE r.rep = s.doc_id AND s.quality >= ${cfg.minQuality}
       |    AND s.lang_pred = '${cfg.lang}'),
       |${DedupQueries.minhashJacCtes("surv")},
       |losers AS (SELECT doc_b AS doc_id, min(doc_a) AS lost_to FROM jac
       |  WHERE jaccard >= ${cfg.lsh.threshold} GROUP BY doc_b)""".stripMargin
  }

  val pipelineAuditSql: String =
    s"""WITH $pipelineAuditCtes
       |SELECT s.doc_id, s.quality, s.lang_pred,
       |  CASE WHEN s.doc_id != r.rep THEN 'exact_dup'
       |       WHEN s.quality < ${cfg.minQuality} THEN 'quality'
       |       WHEN s.lang_pred != '${cfg.lang}' THEN 'language'
       |       WHEN l.lost_to IS NOT NULL THEN 'near_dup'
       |       ELSE 'kept' END AS verdict,
       |  CASE WHEN s.doc_id != r.rep THEN r.rep ELSE l.lost_to END AS lost_to
       |FROM scored s
       |JOIN rep r ON r.doc_id = s.doc_id
       |LEFT JOIN losers l ON l.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Stage-wise attrition funnel ([[graft.text.Curation.funnel]]):
    * docs AND tokens each pipeline stage dropped, and the corpus left
    * after it. Gate-only: the corpus-scale work is pipeline_audit's
    * benched composition (runtime face pipeline_curate) plus one
    * token-count join; the funnel itself is ≤6-row arithmetic. The
    * oracle re-derives every verdict, both token totals, and the
    * cumulative remainders — the hash pins the whole report.
    */
  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame =
    Curation.funnel(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .orderBy("stage_idx")

  val pipelineFunnelSql: String =
    s"""WITH $pipelineAuditCtes,
       |verd AS (SELECT s.doc_id,
       |    CASE WHEN s.doc_id != r.rep THEN 'exact_dup'
       |         WHEN s.quality < ${cfg.minQuality} THEN 'quality'
       |         WHEN s.lang_pred != '${cfg.lang}' THEN 'language'
       |         WHEN l.lost_to IS NOT NULL THEN 'near_dup'
       |         ELSE 'kept' END AS verdict
       |  FROM scored s
       |  JOIN rep r ON r.doc_id = s.doc_id
       |  LEFT JOIN losers l ON l.doc_id = s.doc_id),
       |tk AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt FROM w0),
       |bv AS (SELECT verdict, count(*) AS nd, CAST(sum(tk.nt) AS BIGINT) AS nt
       |  FROM verd JOIN tk ON tk.doc_id = verd.doc_id GROUP BY verdict),
       |tot AS (SELECT CAST(sum(nd) AS BIGINT) AS td,
       |    CAST(sum(nt) AS BIGINT) AS tt FROM bv),
       |st AS (SELECT * FROM (VALUES ('input', 0), ('exact_dup', 1),
       |    ('quality', 2), ('language', 3), ('near_dup', 4))
       |  AS v(stage, stage_idx)),
       |j AS (SELECT st.stage, st.stage_idx,
       |    CAST(COALESCE(bv.nd, 0) AS BIGINT) AS docs_dropped,
       |    CAST(COALESCE(bv.nt, 0) AS BIGINT) AS tokens_dropped
       |  FROM st LEFT JOIN bv ON bv.verdict = st.stage)
       |SELECT j.stage, j.stage_idx, j.docs_dropped, j.tokens_dropped,
       |  CAST(tot.td - sum(j.docs_dropped) OVER (ORDER BY j.stage_idx)
       |    AS BIGINT) AS docs_left,
       |  CAST(tot.tt - sum(j.tokens_dropped) OVER (ORDER BY j.stage_idx)
       |    AS BIGINT) AS tokens_left
       |FROM j CROSS JOIN tot ORDER BY j.stage_idx""".stripMargin

  /** [[pipelineFunnel]] broken out per source
    * ([[graft.text.Curation.funnelBy]]): which feed loses most tokens
    * at which stage. Gate-only like the corpus funnel (same benched
    * composition); the oracle re-derives the whole sources × stages
    * grid, so the hash pins every feed's report.
    */
  def pipelineSrcFunnel(spark: SparkSession, dir: String): DataFrame =
    Curation.funnelBy(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        Seq("source"), cfg)
      .orderBy("source", "stage_idx")

  val pipelineSrcFunnelSql: String =
    s"""WITH $pipelineAuditCtes,
       |verd AS (SELECT s.doc_id,
       |    CASE WHEN s.doc_id != r.rep THEN 'exact_dup'
       |         WHEN s.quality < ${cfg.minQuality} THEN 'quality'
       |         WHEN s.lang_pred != '${cfg.lang}' THEN 'language'
       |         WHEN l.lost_to IS NOT NULL THEN 'near_dup'
       |         ELSE 'kept' END AS verdict
       |  FROM scored s
       |  JOIN rep r ON r.doc_id = s.doc_id
       |  LEFT JOIN losers l ON l.doc_id = s.doc_id),
       |tk AS (SELECT w0.doc_id, d.source, CAST(len(w0.w) AS BIGINT) AS nt
       |  FROM w0 JOIN documents d ON d.doc_id = w0.doc_id),
       |bv AS (SELECT tk.source, verdict, count(*) AS nd,
       |    CAST(sum(tk.nt) AS BIGINT) AS nt
       |  FROM verd JOIN tk ON tk.doc_id = verd.doc_id
       |  GROUP BY tk.source, verdict),
       |tot AS (SELECT source, CAST(sum(nd) AS BIGINT) AS td,
       |    CAST(sum(nt) AS BIGINT) AS tt FROM bv GROUP BY source),
       |st AS (SELECT * FROM (VALUES ('input', 0), ('exact_dup', 1),
       |    ('quality', 2), ('language', 3), ('near_dup', 4))
       |  AS v(stage, stage_idx)),
       |grid AS (SELECT g.source, st.stage, st.stage_idx
       |  FROM (SELECT DISTINCT source FROM bv) g CROSS JOIN st),
       |j AS (SELECT grid.source, grid.stage, grid.stage_idx,
       |    CAST(COALESCE(bv.nd, 0) AS BIGINT) AS docs_dropped,
       |    CAST(COALESCE(bv.nt, 0) AS BIGINT) AS tokens_dropped
       |  FROM grid LEFT JOIN bv
       |    ON bv.source = grid.source AND bv.verdict = grid.stage)
       |SELECT j.source, j.stage, j.stage_idx, j.docs_dropped,
       |  j.tokens_dropped,
       |  CAST(tot.td - sum(j.docs_dropped)
       |    OVER (PARTITION BY j.source ORDER BY j.stage_idx)
       |    AS BIGINT) AS docs_left,
       |  CAST(tot.tt - sum(j.tokens_dropped)
       |    OVER (PARTITION BY j.source ORDER BY j.stage_idx)
       |    AS BIGINT) AS tokens_left
       |FROM j JOIN tot ON tot.source = j.source
       |ORDER BY j.source, j.stage_idx""".stripMargin

  /** Dedup flow matrix: for every exact/near-dup drop, which source
    * lost content to which — the redundancy structure BETWEEN feeds
    * ("src3 is mostly re-hosting src1"), invisible in any per-source
    * rollup. Built from [[graft.text.Curation.curateAudit]]'s
    * `lost_to` column: two doc-keyed joins onto the (doc_id, source)
    * projection — the loser side is only the dropped rows — then one
    * bounded sources² aggregate. Gate-only: runtime face is
    * pipeline_curate's benched composition, like the audit itself.
    */
  def pipelineDedupFlow(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    Curation.curateAudit(docs, "doc_id", "text", cfg)
      .filter(col("lost_to").isNotNull)
      .select(col("doc_id"), col("verdict"), col("lost_to"))
      .join(src, "doc_id")
      .join(src.select(col("doc_id").as("lost_to"),
        col("source").as("won_source")), "lost_to")
      .groupBy("verdict", "source", "won_source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("verdict", "source", "won_source")
  }

  val pipelineDedupFlowSql: String =
    s"""WITH $pipelineAuditCtes,
       |av AS (SELECT s.doc_id,
       |    CASE WHEN s.doc_id != r.rep THEN 'exact_dup'
       |         WHEN s.quality < ${cfg.minQuality} THEN 'quality'
       |         WHEN s.lang_pred != '${cfg.lang}' THEN 'language'
       |         WHEN l.lost_to IS NOT NULL THEN 'near_dup'
       |         ELSE 'kept' END AS verdict,
       |    CASE WHEN s.doc_id != r.rep THEN r.rep ELSE l.lost_to END
       |      AS lost_to
       |  FROM scored s
       |  JOIN rep r ON r.doc_id = s.doc_id
       |  LEFT JOIN losers l ON l.doc_id = s.doc_id)
       |SELECT av.verdict, dl.source, dw.source AS won_source,
       |  count(*) AS n_docs
       |FROM av
       |JOIN documents dl ON dl.doc_id = av.doc_id
       |JOIN documents dw ON dw.doc_id = av.lost_to
       |WHERE av.lost_to IS NOT NULL
       |GROUP BY av.verdict, dl.source, dw.source
       |ORDER BY av.verdict, dl.source, won_source""".stripMargin

  // ------------------------------------------------- deterministic mixing

  private val MixRates = Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.25)
  private val MixDefault = 0.1
  private val MixSalt = "mix"

  /** Deterministic per-source downsampling (training-mix weights): the
    * kept ROW SET, not just counts, is pinned by the oracle — both
    * engines compute the same md5 coordinate per doc.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "source",
        MixRates, MixDefault, MixSalt)
      .select("doc_id", "source")
      .orderBy("doc_id")

  val sampleStratifiedSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      s"md5('$MixSalt:'||CAST(doc_id AS VARCHAR))", 8)
    val rateCase = MixRates.foldLeft(MixDefault.toString) {
      case (other, (k, r)) => s"CASE WHEN source = '$k' THEN $r ELSE $other END"
    }
    s"""SELECT doc_id, source FROM documents
       |WHERE CAST($coord AS DOUBLE) / 4294967296 < $rateCase
       |ORDER BY doc_id""".stripMargin
  }

  /** Temperature-2 mix rebalancing: rates DERIVED from observed source
    * sizes (∝ sqrt(n_s), capped at 1), kept row set pinned by the
    * oracle recomputing the counts, the sorted-order weight fold, each
    * rate, and every md5 coordinate.
    */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureSample(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "source",
        temperature = 2.0, targetFrac = 0.5)
      .select("doc_id", "source")
      .orderBy("doc_id")

  val sampleTemperatureSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('temp:'||CAST(doc_id AS VARCHAR))", 8)
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
       |    list_reduce(
       |      list_prepend(0.0, list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)),
       |      (a, b) -> a + b) AS wsum
       |  FROM c),
       |r AS (SELECT c.source,
       |    least(1.0, 0.5 * CAST(t.total AS DOUBLE) * sqrt(CAST(c.n AS DOUBLE))
       |      / t.wsum / CAST(c.n AS DOUBLE)) AS rate
       |  FROM c CROSS JOIN t)
       |SELECT d.doc_id, d.source FROM documents d
       |JOIN r ON r.source = d.source
       |WHERE CAST($coord AS DOUBLE) / 4294967296 < r.rate
       |ORDER BY doc_id""".stripMargin
  }

  /** Deterministic curriculum order ([[graft.operators.CorpusOrder]]):
    * length-banded stages (short docs first), seeded md5 shuffle within
    * each stage. The oracle states the SPEC — a single global
    * `row_number() OVER (ORDER BY stage, h, doc_id)` — so the hash
    * match is a machine-checked proof that the distributed two-level
    * scan equals the global-sort definition it replaces.
    */
  def corpusOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    CorpusOrder.orderPlan(docs.select("doc_id", "n_chars"), "doc_id",
        when(col("n_chars") < 500, 0)
          .when(col("n_chars") < 2000, 1).otherwise(2))
      .orderBy("pos")
  }

  val corpusOrderSql: String = {
    val h = OracleDialect.hexPrefixToLong(
      "md5('order:'||CAST(doc_id AS VARCHAR))", 8)
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN n_chars < 500 THEN 0
       |         WHEN n_chars < 2000 THEN 1 ELSE 2 END AS stage,
       |    CAST($h AS BIGINT) AS h
       |  FROM documents)
       |SELECT doc_id, stage,
       |  CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1 AS BIGINT)
       |    AS pos
       |FROM d ORDER BY pos""".stripMargin
  }

  /** Shard assignment verified row-exactly: per-shard count plus the
    * doc_id sum — an order-independent integer checksum, so a hash
    * match proves EVERY row's shard, not just the histogram shape.
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Sharding.withShard(
        Tables.load(spark, dir, "documents").select("doc_id"), "doc_id", 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy("shard")

  val shardAssignSql: String = {
    val h = OracleDialect.hexPrefixToLong(
      "md5('shard:'||CAST(doc_id AS VARCHAR))", 8)
    s"""SELECT ($h) % 8 AS shard,
       |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin
  }

  /** Per-source quota: at most 15 docs per source, deterministic
    * md5-coordinate preference. Oracle replays the same rank with a
    * QUALIFY row_number — verifying the WindowGroupLimit-optimized
    * Spark plan picks the identical row set.
    */
  def quotaCap(spark: SparkSession, dir: String): DataFrame =
    Sampling.capPerStratum(
        Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", cap = 15)
      .orderBy("doc_id")

  val quotaCapSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('quota:'||CAST(doc_id AS VARCHAR))", 8)
    s"""SELECT doc_id, source FROM documents
       |QUALIFY row_number() OVER (PARTITION BY source
       |  ORDER BY CAST($coord AS DOUBLE) / 4294967296, doc_id) <= 15
       |ORDER BY doc_id""".stripMargin
  }

  /** The full training-mix pipeline composed end-to-end: curation
    * (quality + langid + exact dedup + near-dedup) → per-source quota
    * (5 docs/source) → sequence packing at 256 tokens. One oracle hash
    * over the final pack assignment transitively checks every stage's
    * row set AND the deterministic ordering the pack offsets depend on.
    */
  def pipelineMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{SeqPack, TokenCount}
    val docs = Tables.loadSpread(spark, dir, "documents")
    val curated = Curation.curate(docs, "doc_id", "text", cfg)
      .select("doc_id")
    val withSrc = curated
      .join(docs.select("doc_id", "source", "text"), "doc_id")
    val capped = Sampling.capPerStratum(withSrc, "doc_id", "source", cap = 5)
    // tiny post-quota frame consumed by THREE plan branches (packPlan's
    // two prefix-sum levels + the source join-back): persist it so the
    // whole curate subtree runs once, not per branch (Verify/Bench
    // clear caches between queries)
    val counts = capped.select(col("doc_id"), col("source"),
        size(TokenCount.tokens(col("text"))).cast("bigint").as("n_tokens"))
      .persist()
    SeqPack.packPlan(counts, "doc_id", "n_tokens",
        seqLen = 256, bucketWidth = 100)
      .join(counts.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "n_tokens", "start_off", "pack_first")
      .orderBy("doc_id")
  }

  val pipelineMixSql: String = {
    val curateBody = pipelineCurateSql
      .stripPrefix("WITH ")
      .replace("SELECT doc_id, lang_pred, quality FROM dedup",
        ",curated AS (SELECT doc_id FROM dedup")
      .replace("WHERE doc_id NOT IN (SELECT doc_b FROM losers)\nORDER BY doc_id",
        "WHERE doc_id NOT IN (SELECT doc_b FROM losers))")
    val coord = OracleDialect.hexPrefixToLong(
      "md5('quota:'||CAST(doc_id AS VARCHAR))", 8)
    s"""WITH $curateBody,
       |src AS (SELECT d.doc_id, d.source, d.text FROM documents d
       |  JOIN curated c ON c.doc_id = d.doc_id),
       |capped AS (SELECT doc_id, source, text FROM src
       |  QUALIFY row_number() OVER (PARTITION BY source
       |    ORDER BY CAST($coord AS DOUBLE) / 4294967296, doc_id) <= 5),
       |tok AS (SELECT doc_id, source,
       |  CAST(len(regexp_extract_all(lower(text),
       |    '${graft.text.TokenCount.TokenPattern}')) AS BIGINT) AS n_tokens
       |  FROM capped),
       |o AS (SELECT doc_id, source, n_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS start_off
       |  FROM tok)
       |SELECT doc_id, source, n_tokens, start_off,
       |  start_off // 256 AS pack_first
       |FROM o ORDER BY doc_id""".stripMargin
  }

  /** Quality-weighted (soft) downsampling: each doc kept with
    * probability quality², via [[graft.operators.Sampling
    * .weightedSample]] — no hard threshold cliff. Gate-only: runtime
    * face is sample_stratified's pushed-filter projection. The oracle
    * replays the quality score, the squared threshold, and the md5
    * coordinate, pinning the exact kept row SET.
    */
  def sampleQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFeatures, TextStats}
    val docs = Tables.loadSpread(spark, dir, "documents")
    val scored = docs.select(col("doc_id"),
      TextStats.qualityScore(TextFeatures.words(col("text"))).as("quality"))
    Sampling.weightedSample(scored, "doc_id", "quality",
        power = 2, salt = "wq")
      .orderBy("doc_id")
  }

  val sampleQualitySql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('wq:'||CAST(doc_id AS VARCHAR))", 8)
    s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |q AS (SELECT doc_id, ${TextQueries.qualityExpr} AS quality FROM w)
       |SELECT doc_id, quality FROM q
       |WHERE CAST($coord AS DOUBLE) / 4294967296 < quality * quality
       |ORDER BY doc_id""".stripMargin
  }

  private val WkK = 20 // exact sample size per source

  /** Exact-size weighted sampling per stratum
    * ([[graft.operators.Sampling.weightedTopK]], Efraimidis–Spirakis):
    * exactly $WkK docs per source, selection probability ∝ n_chars —
    * the fixed-token-budget data-selection primitive. Gate-only: one
    * projection + the `sim_topk` WindowGroupLimit top-k shape
    * (~k·|strata| rows shuffle). The oracle replays the md5 uniform,
    * the 1e-9-quantized ln race key, and the (key DESC, id) ranks.
    */
  def sampleWeightedK(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedTopK(Tables.loadSpread(spark, dir, "documents"),
        "doc_id", "source", "n_chars", WkK)
      .orderBy("source", "rank")

  val sampleWeightedKSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      "md5('aes:'||CAST(doc_id AS VARCHAR))", 8)
    s"""WITH d AS (SELECT source, doc_id,
       |    CAST(n_chars AS DOUBLE) AS w FROM documents
       |  WHERE CAST(n_chars AS DOUBLE) > 0),
       |kx AS (SELECT source, doc_id,
       |  CAST(floor(ln((CAST($coord AS DOUBLE) + 0.5) / 4294967296)
       |    / w * 1000000000.0) AS BIGINT) AS key_q FROM d)
       |SELECT source, rank, doc_id, key_q FROM (
       |  SELECT source, doc_id, key_q,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY key_q DESC, doc_id) AS rank
       |  FROM kx)
       |WHERE rank <= $WkK ORDER BY source, rank""".stripMargin
  }

  private val MixTarget = Map(
    "src0" -> 0.20, "src1" -> 0.20, "src2" -> 0.10).withDefaultValue(0.0)
  private val MixTargetDefault = 0.5 / 17 // remaining mass over 17 sources

  /** Training-mix audit: per-source ACTUAL token share vs the
    * configured TARGET mix, with each source's KL contribution
    * `p·ln(p/q)` — the governance number a mix change is judged by
    * (sum the contributions for the headline divergence). One
    * map-side-combined (source, token-count) aggregate; shares are
    * single divisions of exact integers; the ln term floor-quantizes
    * at 1e-9 (the PSI discipline). Gate-only: runtime face is
    * text_tokens' projection + a tiny aggregate.
    */
  def pipelineMixAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TokenCount
    val docs = Tables.loadSpread(spark, dir, "documents")
    val bySrc = docs
      .select(col("source"),
        size(TokenCount.tokens(coalesce(col("text"), lit(""))))
          .cast("long").as("__n"))
      .groupBy("source").agg(sum(col("__n")).as("n_tokens"))
    val total = bySrc.agg(sum(col("n_tokens")).as("t"))
    val target = MixTarget.toSeq.foldLeft(lit(MixTargetDefault)) {
      case (other, (k, v)) => when(col("source") === k, v).otherwise(other)
    }
    val p = col("n_tokens").cast("double") / col("t").cast("double")
    bySrc.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), target.as("q_target"),
        p.as("p_actual"),
        floor((p * log(p / target)) * 1e9d).cast("bigint").as("kl_q"))
      .orderBy("source")
  }

  val pipelineMixAuditSql: String = {
    val targetCase = MixTarget.toSeq.foldLeft(MixTargetDefault.toString) {
      case (other, (k, v)) => s"CASE WHEN source = '$k' THEN $v ELSE $other END"
    }
    s"""WITH c AS (SELECT source,
       |    CAST(sum(len(regexp_extract_all(lower(coalesce(text, '')),
       |      '${graft.text.TokenCount.TokenPattern}'))) AS BIGINT)
       |      AS n_tokens
       |  FROM documents GROUP BY source),
       |t AS (SELECT sum(n_tokens) AS t FROM c)
       |SELECT source, n_tokens, $targetCase AS q_target,
       |  CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE) AS p_actual,
       |  CAST(floor(((CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE)) *
       |    ln((CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE)) /
       |      ($targetCase))) * 1e9) AS BIGINT) AS kl_q
       |FROM c, t ORDER BY source""".stripMargin
  }

  private val EpochMap = Map("src0" -> 0.25, "src1" -> 1.5, "src2" -> 3.0)
  private val EpochDefault = 1.0
  private val EpochSalt = "epoch"

  /** Epoch-weighted mix materialization: src0 downsampled to a quarter
    * epoch, src1 at 1.5 (all rows once, a deterministic half twice),
    * src2 replicated 3×, everything else one epoch. The oracle replays
    * the copy-count arithmetic and regenerates every (doc, epoch_copy)
    * row, so the hash pins the exact multiset of replicas. Epoch values
    * are dyadic or integral — `e - floor(e)` is exact in both engines.
    */
  def sampleEpochs(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochMix(
        Tables.loadSpread(spark, dir, "documents")
          .select("doc_id", "source"),
        "doc_id", "source", EpochMap, EpochDefault, EpochSalt)
      .orderBy("doc_id", "epoch_copy")

  val sampleEpochsSql: String = {
    val coord = OracleDialect.hexPrefixToLong(
      s"md5('$EpochSalt:'||CAST(doc_id AS VARCHAR))", 8)
    val epCase = EpochMap.foldLeft(EpochDefault.toString) {
      case (other, (k, v)) => s"CASE WHEN source = '$k' THEN $v ELSE $other END"
    }
    s"""WITH n AS (
       |  SELECT doc_id, source,
       |    CAST(floor(ep) AS BIGINT) +
       |      CASE WHEN CAST($coord AS DOUBLE) / 4294967296 < ep - floor(ep)
       |           THEN 1 ELSE 0 END AS nc
       |  FROM (SELECT doc_id, source, $epCase AS ep FROM documents))
       |SELECT doc_id, source,
       |       unnest(generate_series(0, nc - 1)) AS epoch_copy
       |FROM n WHERE nc > 0
       |ORDER BY doc_id, epoch_copy""".stripMargin
  }

  /** Deterministic messy-URL fixture over orders: mixed-case scheme
    * and host, default and non-default ports (":80" lands on BOTH
    * schemes across the key space — default for http, semantic for
    * https), empty paths, tracking params scrambled among real ones,
    * fragments containing a fake '?', and a non-URL band (k%97=31)
    * that must pass through unchanged. Mirrored expression-for-
    * expression in SQL (the withUrls discipline).
    */
  private def withMessyUrls(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    orders.select(k).withColumn("url",
      when(k % 97 === 31, concat(lit("not-a-url-"), k.cast("string")))
        .when(k % 97 === 62, concat(
          when(k % 2 === 0, lit("HTTP://[2001:DB8::1]:80"))
            .otherwise(lit("https://User@[2001:DB8::1]:8443")),
          lit("/v6/"), (k % 7).cast("string")))
        .when(k % 97 === 93,
          concat(lit("http://[::1/broken/"), k.cast("string")))
        .otherwise(concat(
          when(k % 2 === 0, lit("HtTp")).otherwise(lit("HTTPS")),
          lit("://WWW.Site"), (k % 5).cast("string"), lit(".Example.COM"),
          when(k % 3 === 0, lit(":80"))
            .when(k % 3 === 1, lit(":8080")).otherwise(lit("")),
          when(k % 4 === 0, lit(""))
            .otherwise(concat(lit("/P/"), (k % 7).cast("string"))),
          when(k % 2 === 0, lit("?utm_source=x&b=2&a=1&utm_campaign=y"))
            .otherwise(lit("?z=9&utm_medium=m&gclid=123&a=1")),
          when(k % 5 === 0, lit("#frag?fake=1")).otherwise(lit("")))))
  }

  // NOTE: embedded into stripMargin'd outer templates — no line here
  // may START with '|' after this inner strip (the outer strip would
  // eat the first pipe of a leading '||'), so concatenations trail.
  private val messyUrlSqlExpr: String =
    """CASE WHEN o_orderkey % 97 = 31
      |  THEN 'not-a-url-' || CAST(o_orderkey AS VARCHAR)
      |  WHEN o_orderkey % 97 = 62
      |  THEN (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTP://[2001:DB8::1]:80'
      |             ELSE 'https://User@[2001:DB8::1]:8443' END) ||
      |    '/v6/' || CAST(o_orderkey % 7 AS VARCHAR)
      |  WHEN o_orderkey % 97 = 93
      |  THEN 'http://[::1/broken/' || CAST(o_orderkey AS VARCHAR)
      |  ELSE (CASE WHEN o_orderkey % 2 = 0 THEN 'HtTp' ELSE 'HTTPS' END) ||
      |    '://WWW.Site' || CAST(o_orderkey % 5 AS VARCHAR) ||
      |    '.Example.COM' ||
      |    (CASE WHEN o_orderkey % 3 = 0 THEN ':80'
      |          WHEN o_orderkey % 3 = 1 THEN ':8080' ELSE '' END) ||
      |    (CASE WHEN o_orderkey % 4 = 0 THEN ''
      |          ELSE '/P/' || CAST(o_orderkey % 7 AS VARCHAR) END) ||
      |    (CASE WHEN o_orderkey % 2 = 0
      |          THEN '?utm_source=x&b=2&a=1&utm_campaign=y'
      |          ELSE '?z=9&utm_medium=m&gclid=123&a=1' END) ||
      |    (CASE WHEN o_orderkey % 5 = 0 THEN '#frag?fake=1' ELSE '' END)
      |END""".stripMargin

  /** The full [[graft.operators.UrlCanon]] rule set replayed in DuckDB
    * over the fixture CTE `u(o_orderkey, url)` → `canon(o_orderkey,
    * url, canon_url)`.
    */
  private val canonCtesSql: String = {
    val tracking = graft.operators.UrlCanon.TrackingParams
      .map(p => s"'$p'").mkString("[", ", ", "]")
    s"""c AS (SELECT o_orderkey, url,
       |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
       |      AS sch,
       |    lower(regexp_extract(url,
       |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]/?#]*\\]|[^/?#:]+)',
       |      1)) AS hst,
       |    regexp_extract(url,
       |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(?:\\[[^\\]/?#]*\\]|[^/?#:]+):([0-9]+)',
       |      1) AS prt,
       |    regexp_extract(url,
       |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
       |    regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS qry
       |  FROM u),
       |cq AS (SELECT o_orderkey, url, sch, hst, prt, pth,
       |    coalesce(array_to_string(list_sort(list_filter(
       |      string_split(qry, '&'),
       |      p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
       |        AND NOT list_contains($tracking, split_part(p, '=', 1)))),
       |      '&'), '') AS qs
       |  FROM c),
       |canon AS (SELECT o_orderkey, url,
       |    CASE WHEN hst = ''
       |           OR (hst LIKE '[%' AND hst NOT LIKE '%]') THEN url ELSE
       |      sch || '://' || hst ||
       |      (CASE WHEN prt <> '' AND NOT (sch = 'http' AND prt = '80')
       |            AND NOT (sch = 'https' AND prt = '443')
       |            THEN ':' || prt ELSE '' END) ||
       |      (CASE WHEN pth = '' THEN '/' ELSE pth END) ||
       |      (CASE WHEN qs = '' THEN '' ELSE '?' || qs END)
       |    END AS canon_url
       |  FROM cq)""".stripMargin
  }

  /** URL canonicalization ([[graft.operators.UrlCanon]]): the messy
    * fixture canonicalized row by row — scheme/host case, default
    * ports, tracking params, param order, fragments, empty paths, and
    * the non-URL passthrough all pinned byte-exact against the DuckDB
    * replay of every rule.
    */
  def urlCanon(spark: SparkSession, dir: String): DataFrame =
    withMessyUrls(Tables.load(spark, dir, "orders"))
      .select(col("o_orderkey"),
        graft.operators.UrlCanon.canonicalize(col("url")).as("canon_url"))
      .orderBy("o_orderkey")

  val urlCanonSql: String =
    s"""WITH u AS (SELECT o_orderkey, $messyUrlSqlExpr AS url FROM orders),
       |$canonCtesSql
       |SELECT o_orderkey, canon_url FROM canon
       |ORDER BY o_orderkey""".stripMargin

  /** URL dedup BEFORE content dedup — the standard crawl stage the
    * canon exists for: group by canonical URL, keep the smallest key
    * (deterministic representative), count the spellings collapsed.
    * The fixture's dozen spellings per resource compress ~40:1 here;
    * at crawl scale this is one hash aggregate at full parallelism.
    */
  def pipelineUrlDedup(spark: SparkSession, dir: String): DataFrame =
    withMessyUrls(Tables.load(spark, dir, "orders"))
      .select(col("o_orderkey"),
        graft.operators.UrlCanon.canonicalize(col("url")).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col("o_orderkey")).as("keep_key"),
        count(lit(1)).as("n_spellings"))
      .orderBy("canon_url")

  val pipelineUrlDedupSql: String =
    s"""WITH u AS (SELECT o_orderkey, $messyUrlSqlExpr AS url FROM orders),
       |$canonCtesSql
       |SELECT canon_url, CAST(min(o_orderkey) AS BIGINT) AS keep_key,
       |  count(*) AS n_spellings
       |FROM canon GROUP BY canon_url
       |ORDER BY canon_url""".stripMargin

  /** PSL-host fixture: co.uk / com.au hosts at several depths, plain
    * .com with and without www, a bare-suffix degenerate, and — round
    * 15 — the full rule algebra: a `*.kawasaki.jp` wildcard host, its
    * `!city.kawasaki.jp` exception, a three-label `k12.ak.us` exact,
    * a `*.ck` wildcard, and the `!www.ck` exception. Every case where
    * the two-label heuristic, the two-label snapshot, and the full
    * PSL resolution DISAGREE.
    */
  private def withPslUrls(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.withColumn("url", concat(lit("https://"),
      when(id % 18 === 0,
        concat(lit("www.s"), (id % 5).cast("string"), lit(".co.uk")))
        .when(id % 18 === 1,
          concat(lit("shop.s"), (id % 5).cast("string"), lit(".co.uk")))
        .when(id % 18 === 2,
          concat(lit("s"), (id % 5).cast("string"), lit(".com.au")))
        .when(id % 18 === 3,
          concat(lit("a.b.s"), (id % 5).cast("string"), lit(".com.au")))
        .when(id % 18 === 4,
          concat(lit("plain"), (id % 4).cast("string"), lit(".com")))
        .when(id % 18 === 5,
          concat(lit("www.plain"), (id % 4).cast("string"), lit(".com")))
        .when(id % 18 === 6,
          concat(lit("a.docs.w"), (id % 3).cast("string"),
            lit(".kawasaki.jp")))
        .when(id % 18 === 7, lit("www.city.kawasaki.jp"))
        .when(id % 18 === 8,
          concat(lit("x.s"), (id % 3).cast("string"), lit(".k12.ak.us")))
        .when(id % 18 === 9,
          concat(lit("www.ex"), (id % 3).cast("string"), lit(".ck")))
        .when(id % 18 === 10, lit("a.www.ck"))
        // — beyond the old curated subset (round 16, full data file) —
        .when(id % 18 === 11, // private section: github.io
          concat(lit("a.p"), (id % 3).cast("string"), lit(".github.io")))
        .when(id % 18 === 12, // 4-label exact: pvt.k12.ma.us
          concat(lit("h"), (id % 3).cast("string"),
            lit(".pvt.k12.ma.us")))
        .when(id % 18 === 13, // 5-label exact (regional object store)
          concat(lit("b"), (id % 2).cast("string"),
            lit(".s3.cn-north-1.amazonaws.com.cn")))
        .when(id % 18 === 14, // base-3 wildcard: *.compute.amazonaws.com
          concat(lit("h"), (id % 3).cast("string"),
            lit(".zone.compute.amazonaws.com")))
        .when(id % 18 === 15, // ICANN entry absent from the old subset
          concat(lit("www.agency"), (id % 3).cast("string"),
            lit(".gov.scot")))
        .when(id % 18 === 16, // 3-label exact jp geographic sibling
          concat(lit("site"), (id % 3).cast("string"),
            lit(".aisai.aichi.jp")))
        .otherwise(lit("co.uk")),
      lit("/doc/"), id.cast("string")))
  }

  private val pslUrlSqlExpr: String =
    """'https://' ||
      |  (CASE doc_id % 18
      |     WHEN 0 THEN 'www.s'  || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      |     WHEN 1 THEN 'shop.s' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      |     WHEN 2 THEN 's'      || CAST(doc_id % 5 AS VARCHAR) || '.com.au'
      |     WHEN 3 THEN 'a.b.s'  || CAST(doc_id % 5 AS VARCHAR) || '.com.au'
      |     WHEN 4 THEN 'plain'     || CAST(doc_id % 4 AS VARCHAR) || '.com'
      |     WHEN 5 THEN 'www.plain' || CAST(doc_id % 4 AS VARCHAR) || '.com'
      |     WHEN 6 THEN 'a.docs.w' || CAST(doc_id % 3 AS VARCHAR) ||
      |                 '.kawasaki.jp'
      |     WHEN 7 THEN 'www.city.kawasaki.jp'
      |     WHEN 8 THEN 'x.s' || CAST(doc_id % 3 AS VARCHAR) || '.k12.ak.us'
      |     WHEN 9 THEN 'www.ex' || CAST(doc_id % 3 AS VARCHAR) || '.ck'
      |     WHEN 10 THEN 'a.www.ck'
      |     WHEN 11 THEN 'a.p' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  '.github.io'
      |     WHEN 12 THEN 'h' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  '.pvt.k12.ma.us'
      |     WHEN 13 THEN 'b' || CAST(doc_id % 2 AS VARCHAR) ||
      |                  '.s3.cn-north-1.amazonaws.com.cn'
      |     WHEN 14 THEN 'h' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  '.zone.compute.amazonaws.com'
      |     WHEN 15 THEN 'www.agency' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  '.gov.scot'
      |     WHEN 16 THEN 'site' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  '.aisai.aichi.jp'
      |     ELSE 'co.uk' END) ||
      |  '/doc/' || CAST(doc_id AS VARCHAR)""".stripMargin

  /** The datasheet keyed by the PSL-backed registrable domain
    * ([[graft.operators.DomainCuration.registrableDomainPsl]]) — same
    * aggregates as `domain_stats`, grouping decided by the pinned
    * public-suffix snapshot (shared VERBATIM with this oracle's IN
    * list, so both engines group with literally the same data file).
    */
  def domainStatsPsl(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DomainCuration.domainStats(
        withPslUrls(Tables.loadSpread(spark, dir, "documents")),
        "url", "text", psl = true)
      .orderBy("domain")

  val domainStatsPslSql: String = {
    import TextQueries.qualityExpr
    // GENERATED from the same parsed data file the Spark expression
    // compiles from (graft.operators.Psl.rules) — one source of truth
    // for ~10k rules; the CASE arms mirror registrableDomainPsl's
    // precedence verbatim (exceptions deepest-first, then suffix
    // lengths descending, then the implicit * default). Out-of-range
    // list indexes are NULL in DuckDB, so lastK concats go NULL and
    // never match — the same never-matches answer Spark's slice gives.
    def sqlList(xs: Seq[String]) =
      xs.map(s => s"'${s.replace("'", "''")}'").mkString("[", ", ", "]")
    val r = graft.operators.Psl.rules
    val maxL = r.suffixLengths.max + 1
    val lDefs = (1 to maxL).map { k =>
      val cat = (k to 1 by -1)
        .map(i => s"string_split(host, '.')[-$i]").mkString(" || '.' || ")
      s"    $cat AS l$k"
    }.mkString(",\n")
    val excArms = r.exc.toSeq.sortBy(-_._1).map { case (d, es) =>
      s"         WHEN n >= $d AND list_contains(${sqlList(es)}, l$d) " +
        s"THEN l$d"
    }
    val sufArms = r.suffixLengths.map { k =>
      val tests =
        r.exact.get(k).map(es =>
          s"list_contains(${sqlList(es)}, l$k)").toSeq ++
          r.wild.get(k - 1).map(ws =>
            s"list_contains(${sqlList(ws)}, l${k - 1})")
      s"         WHEN n >= $k AND (${tests.mkString("\n           OR ")})" +
        s"\n           THEN CASE WHEN n = $k THEN host ELSE l${k + 1} END"
    }
    val arms = (excArms ++ sufArms).mkString("\n")
    s"""WITH u AS (SELECT doc_id, text, $pslUrlSqlExpr AS url
       |  FROM documents),
       |hp AS (SELECT doc_id, text, lower(regexp_extract(url,
       |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))
       |    AS host FROM u),
       |pieces AS (SELECT doc_id, text, host,
       |    len(string_split(host, '.')) AS n,
       |$lDefs
       |  FROM hp),
       |dp AS (SELECT doc_id, text, host,
       |    CASE
       |$arms
       |         ELSE CASE WHEN n <= 2 THEN host ELSE l2 END
       |    END AS domain
       |  FROM pieces),
       |w AS (SELECT domain, host, md5(text) AS h,
       |    string_split(lower(text), ' ') AS w FROM dp),
       |sc AS (SELECT domain, host, h,
       |    CAST(len(w) AS BIGINT) AS n_toks,
       |    CAST(floor(($qualityExpr) * 1048576e0) AS BIGINT) AS q_fp
       |  FROM w),
       |base AS (SELECT domain, count(*) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(q_fp) AS BIGINT) AS q_sum_fp
       |  FROM sc GROUP BY domain),
       |h0 AS (SELECT domain, host, count(*) AS c FROM sc
       |  GROUP BY domain, host),
       |hosts AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts
       |  FROM h0 GROUP BY domain),
       |d0 AS (SELECT domain, h, count(*) AS cnt FROM sc GROUP BY domain, h),
       |dups AS (SELECT domain,
       |    CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
       |      AS n_dup_rows
       |  FROM d0 GROUP BY domain)
       |SELECT b.domain, b.n_docs, h.n_hosts, b.n_tokens, b.q_sum_fp,
       |  d.n_dup_rows
       |FROM base b JOIN hosts h ON h.domain = b.domain
       |JOIN dups d ON d.domain = b.domain
       |ORDER BY b.domain""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_canon" -> (urlCanon(_, _)),
    "pipeline_url_dedup" -> (pipelineUrlDedup(_, _)),
    "domain_stats_psl" -> (domainStatsPsl(_, _)),
    "pipeline_curate" -> (pipelineCurate(_, _)),
    "pipeline_curate_html" -> (pipelineCurateHtml(_, _)),
    "domain_stats" -> (domainStats(_, _)),
    "pipeline_domain_cap" -> (pipelineDomainCap(_, _)),
    "pipeline_audit" -> (pipelineAudit(_, _)),
    "pipeline_funnel" -> (pipelineFunnel(_, _)),
    "pipeline_src_funnel" -> (pipelineSrcFunnel(_, _)),
    "pipeline_dedup_flow" -> (pipelineDedupFlow(_, _)),
    "pipeline_mix" -> (pipelineMix(_, _)),
    "pipeline_mix_audit" -> (pipelineMixAudit(_, _)),
    "sample_stratified" -> (sampleStratified(_, _)),
    "sample_temperature" -> (sampleTemperature(_, _)),
    "sample_quality" -> (sampleQuality(_, _)),
    "sample_weighted_k" -> (sampleWeightedK(_, _)),
    "sample_epochs" -> (sampleEpochs(_, _)),
    "shard_assign" -> (shardAssign(_, _)),
    "corpus_order" -> (corpusOrder(_, _)),
    "quota_cap" -> (quotaCap(_, _)))

  val oracleSql: Map[String, String] = Map(
    "url_canon" -> urlCanonSql,
    "pipeline_url_dedup" -> pipelineUrlDedupSql,
    "domain_stats_psl" -> domainStatsPslSql,
    "pipeline_curate" -> pipelineCurateSql,
    "pipeline_curate_html" -> pipelineCurateHtmlSql,
    "domain_stats" -> domainStatsSql,
    "pipeline_domain_cap" -> pipelineDomainCapSql,
    "pipeline_audit" -> pipelineAuditSql,
    "pipeline_funnel" -> pipelineFunnelSql,
    "pipeline_src_funnel" -> pipelineSrcFunnelSql,
    "pipeline_dedup_flow" -> pipelineDedupFlowSql,
    "pipeline_mix" -> pipelineMixSql,
    "pipeline_mix_audit" -> pipelineMixAuditSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_quality" -> sampleQualitySql,
    "sample_weighted_k" -> sampleWeightedKSql,
    "sample_epochs" -> sampleEpochsSql,
    "shard_assign" -> shardAssignSql,
    "corpus_order" -> corpusOrderSql,
    "quota_cap" -> quotaCapSql)
}
