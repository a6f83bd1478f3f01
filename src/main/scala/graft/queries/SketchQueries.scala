package graft.queries

import graft.operators.{KmvSketch, ZOrder}
import graft.text.TextFeatures
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch + data-layout queries: KMV distinct-count estimation and
  * Z-order clustering audit. Both are hash-match oracle-checked — the
  * KMV sketch is md5-based, so unlike HLL the ESTIMATE itself is
  * bit-reproducible in DuckDB, and the z-value is plain bit
  * arithmetic.
  */
object SketchQueries {

  private val KmvK = 64
  private val CmsCfg = graft.operators.CountMin.Config()
  private val CmsDenom = 512 // heavy = share > 1/512 of the token stream

  /** Distinct 3-gram estimate per document source — the sketch pass a
    * corpus profiler runs when exact count-distinct per group is too
    * expensive (at 100 TB: one partial+final dedupe shuffle and a
    * per-group bottom-k instead of a giant distinct aggregation per
    * group... the sketch state is k longs per group).
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val posts = docs.select(col("source"),
      explode(TextFeatures.textShingles(col("text"), 3)).as("gram"))
    // single-aggregation form (custom bottom-k buffer, one exchange);
    // the DuckDB oracle recomputes the sketch the composable way and
    // must hash-match — proving the aggregate's exactness per round
    KmvSketch.distinctEstimateAgg(posts, "source", "gram", KmvK)
      .orderBy("grp")
  }

  val kmvDistinctSql: String = {
    val h = OracleDialect.hexPrefixToLong("md5(gram)", 12)
    // e-notation → DOUBLE literal (a decimal-point literal is DECIMAL
    // in DuckDB and overflows the k-1 multiplication)
    val space = "281474976710656e0" // 2^48
    s"""WITH w AS (SELECT source, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |g AS (SELECT source, CASE WHEN len(w) >= 3 THEN
       |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |      for i in generate_series(1, len(w) - 2)])
       |  ELSE [] END AS grams FROM w),
       |p AS (SELECT source AS grp, unnest(grams) AS gram FROM g),
       |h AS (SELECT DISTINCT grp, CAST($h AS BIGINT) AS h FROM p),
       |r AS (SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM h)
       |SELECT grp, count(*) AS n_hashes, max(h) AS kth_hash,
       |  CASE WHEN count(*) < $KmvK THEN CAST(count(*) AS DOUBLE)
       |    ELSE ${KmvK - 1} * $space / max(h) END AS est_distinct
       |FROM r WHERE rk <= $KmvK GROUP BY grp ORDER BY grp""".stripMargin
  }

  /** HLL distinct 3-gram estimate per source — same postings as
    * `kmv_distinct`, the constant-size register sketch instead of the
    * bottom-k ([[graft.operators.HllSketch]]). Runs the
    * single-aggregation [[graft.expressions.HllRegisters]] form; the
    * oracle recomputes every register and the exact-integer harmonic
    * sum the composable way, so the hash gate re-proves the custom
    * aggregate bit-identical each round (including the one double
    * division both engines must agree on).
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val posts = docs.select(col("source"),
      explode(TextFeatures.textShingles(col("text"), 3)).as("gram"))
    graft.operators.HllSketch.distinctEstimateAgg(posts, "source", "gram")
      .orderBy("grp")
  }

  val hllDistinctSql: String = {
    val h = OracleDialect.hexPrefixToLong("md5(gram)", 12)
    s"""WITH w AS (SELECT source, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |g AS (SELECT source, CASE WHEN len(w) >= 3 THEN
       |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |      for i in generate_series(1, len(w) - 2)])
       |  ELSE [] END AS grams FROM w),
       |p AS (SELECT source AS grp, unnest(grams) AS gram FROM g),
       |h AS (SELECT grp, CAST($h AS BIGINT) AS h FROM p),
       |r AS (SELECT grp, h >> 40 AS bucket,
       |    h & 1099511627775 AS wlow FROM h),
       |reg AS (SELECT grp, bucket,
       |    max(CASE WHEN wlow = 0 THEN 41
       |             ELSE 41 - length(bin(wlow)) END) AS m
       |  FROM r GROUP BY grp, bucket),
       |agg AS (SELECT grp, count(*) AS n_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << (41 - m)) AS BIGINT) AS s_present
       |  FROM reg GROUP BY grp)
       |SELECT grp, 256 - n_regs AS n_zero,
       |  s_present + (256 - n_regs) * 2199023255552 AS s41,
       |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 2199023255552.0
       |    / (s_present + (256 - n_regs) * 2199023255552) AS est_raw
       |FROM agg ORDER BY grp""".stripMargin
  }

  /** Incremental HLL maintenance ([[graft.operators.HllSketch.merge]]):
    * a standing register table built from pre-cut events folds in the
    * post-cut delta batch WITHOUT rescanning history; the oracle
    * recomputes the sketch from ALL events in one pass, so the hash
    * match is a machine-checked incremental ≡ recompute identity —
    * the sketch-table analogue of `q_agg_upsert`. Gate-only (no bench
    * slot): runtime is the hll family's, the identity is the point.
    */
  def hllUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.HllSketch
    val ev = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("ts"),
        col("event_id").cast("string").as("item"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    // exhaustive split: a null ts must land SOMEWHERE (the oracle
    // recomputes from ALL events — a row dropped by both filters
    // would break the identity on dirty data)
    val standing = HllSketch.registers(ev.filter(col("ts") < cut),
      "event_type", "item")
    val delta = HllSketch.registers(
      ev.filter(col("ts").isNull || col("ts") >= cut), "event_type", "item")
    HllSketch.estimate(HllSketch.merge(standing, delta)).orderBy("grp")
  }

  val hllUpsertSql: String = {
    val h = OracleDialect.hexPrefixToLong("md5(CAST(event_id AS VARCHAR))", 12)
    s"""WITH h AS (SELECT event_type AS grp, CAST($h AS BIGINT) AS h
       |  FROM events),
       |r AS (SELECT grp, h >> 40 AS bucket,
       |    h & 1099511627775 AS wlow FROM h),
       |reg AS (SELECT grp, bucket,
       |    max(CASE WHEN wlow = 0 THEN 41
       |             ELSE 41 - length(bin(wlow)) END) AS m
       |  FROM r GROUP BY grp, bucket),
       |agg AS (SELECT grp, count(*) AS n_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << (41 - m)) AS BIGINT) AS s_present
       |  FROM reg GROUP BY grp)
       |SELECT grp, 256 - n_regs AS n_zero,
       |  s_present + (256 - n_regs) * 2199023255552 AS s41,
       |  0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 2199023255552.0
       |    / (s_present + (256 - n_regs) * 2199023255552) AS est_raw
       |FROM agg ORDER BY grp""".stripMargin
  }

  /** Incremental quantile-sketch maintenance
    * ([[graft.operators.LogQuantile]]): a standing (grp, bucket, cnt)
    * sketch built from pre-cut events folds in the post-cut delta by
    * bucket-count ADDITION — no history rescan — and quantiles extract
    * from the merged frame. The oracle recomputes the sketch from ALL
    * events in one pass, so the hash match is a machine-checked
    * incremental ≡ recompute identity: the `hll_upsert` pattern for
    * the quantile family. Gate-only (no bench slot): runtime is
    * `quantile_sketch`'s, the identity is the point.
    */
  def quantileUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.LogQuantile
    val ev = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("ts"), col("value"))
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    // exhaustive split, like hll_upsert: null ts must land somewhere
    val standing = LogQuantile.sketch(
      ev.filter(col("ts") < cut), "event_type", "value")
    val delta = LogQuantile.sketch(
      ev.filter(col("ts").isNull || col("ts") >= cut),
      "event_type", "value")
    val merged = standing.unionByName(delta)
      .groupBy(col("grp"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    LogQuantile.quantilesFromSketch(merged).orderBy("grp", "p")
  }

  /** Count-Min point-frequency estimates
    * ([[graft.operators.CountMin]]) for the corpus's heavy tokens:
    * every token whose exact occurrence count exceeds `1/CmsDenom` of
    * the stream is probed against a depth×width sketch built from the
    * SAME stream, and the output carries both the
    * exact count and the sketch's (≥-biased) estimate — so the hash
    * gate re-proves every counter cell AND the min-over-rows probe
    * arithmetic each round, and the est/exact gap on collisions is
    * visible in the gated rows rather than asserted away.
    */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CountMin
    import graft.text.TokenCount
    val docs = Tables.loadSpread(spark, dir, "documents")
    val toks = docs.select(
      explode(TokenCount.tokens(col("text"))).as("token"))
    val sketch = CountMin.cells(toks, "token", CmsCfg)
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
    val total = exact.agg(sum(col("exact_cnt")).as("n"))
    val probes = exact.crossJoin(broadcast(total))
      .filter(col("exact_cnt") * CmsDenom > col("n"))
      .select("token", "exact_cnt")
    CountMin.estimates(sketch, probes, "token", CmsCfg)
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  val cmsCountsSql: String = {
    val w = CmsCfg.width - 1
    val h = OracleDialect.hexPrefixToLong(
      "md5(CAST(rr.r AS VARCHAR) || ':' || token)", 12)
    s"""WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
       |    '${graft.text.TokenCount.TokenPattern}')) AS token
       |  FROM documents),
       |ex AS (SELECT token, count(*) AS exact_cnt FROM t GROUP BY token),
       |tot AS (SELECT CAST(sum(exact_cnt) AS BIGINT) AS n FROM ex),
       |pr AS (SELECT token, exact_cnt FROM ex, tot
       |  WHERE exact_cnt * $CmsDenom > n),
       |rb AS (SELECT token, rr.r AS r,
       |    (CAST($h AS BIGINT) & $w) AS bucket
       |  FROM t CROSS JOIN range(${CmsCfg.depth}) rr(r)),
       |sk AS (SELECT r, bucket, count(*) AS cnt FROM rb
       |  GROUP BY r, bucket),
       |pb AS (SELECT p.token, p.exact_cnt, rr.r AS r,
       |    (CAST($h AS BIGINT) & $w) AS bucket
       |  FROM pr p CROSS JOIN range(${CmsCfg.depth}) rr(r))
       |SELECT pb.token, pb.exact_cnt, min(sk.cnt) AS est_cnt
       |FROM pb JOIN sk ON sk.r = pb.r AND sk.bucket = pb.bucket
       |GROUP BY pb.token, pb.exact_cnt
       |ORDER BY exact_cnt DESC, token""".stripMargin
  }

  /** Per-event-type p50/p95/p99 of `value` via the log-bucketed
    * quantile sketch ([[graft.operators.LogQuantile]]) — the raw
    * stream crosses ONE (grp, bucket) count shuffle; ranks and edges
    * are pure integer arithmetic mirrored verbatim by the oracle, so
    * the hash gate proves bucket ids, cumulative ranks AND the
    * reported edges identical.
    */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    graft.operators.LogQuantile.quantiles(events, "event_type", "value")
      .orderBy("grp", "p")
  }

  val quantileSketchSql: String = {
    import graft.operators.LogQuantile.{bucketSql, lowerEdgeSql}
    s"""WITH iv AS (SELECT event_type AS grp,
       |    CAST(round(value * 100) AS BIGINT) AS iv FROM events),
       |b AS (SELECT grp, ${bucketSql("iv")} AS bucket FROM iv),
       |sk AS (SELECT grp, bucket, count(*) AS cnt FROM b GROUP BY grp, bucket),
       |cum AS (SELECT grp, bucket, cnt, sum(cnt) OVER (PARTITION BY grp
       |    ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum FROM sk),
       |tot AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM sk GROUP BY grp),
       |pr AS (SELECT * FROM (VALUES (50, 100, 'p50'), (95, 100, 'p95'),
       |    (99, 100, 'p99')) AS t(num, den, p)),
       |sel AS (SELECT c.grp, pr.p, min(c.bucket) AS bucket, max(t.n) AS n
       |  FROM cum c JOIN tot t ON c.grp = t.grp CROSS JOIN pr
       |  WHERE c.cum >= (pr.num * t.n + pr.den - 1) // pr.den
       |  GROUP BY c.grp, pr.p)
       |SELECT grp, p, CAST(${lowerEdgeSql("bucket")} AS DOUBLE) / 100 AS q, n
       |FROM sel ORDER BY grp, p""".stripMargin
  }

  /** Z-order layout audit over orders, dimensions (o_custkey,
    * order-day): rows bucketed by z-value prefix, each bucket's
    * bounding box in both dimensions — the min/max spans parquet
    * row-group pruning would act on after a Z-order write.
    */
  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    ZOrder.bucketStats(orders,
        col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")),
        prefixShift = 18)
      .orderBy("z_bucket")
  }

  val zorderStatsSql: String = {
    val day = "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    // mirror ZOrder.bucketStats: per-dimension scale-aware shift
    // (integer CASE ladder) before the 16-bit interleave, so keys
    // wider than 2^16 never alias
    val z = ZOrder.zvalue16Sql("(x >> xs)", "(y >> ys)")
    s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS x,
       |    CAST($day AS BIGINT) AS y FROM orders),
       |s AS (SELECT ${ZOrder.quantShiftSql("max(x)")} AS xs,
       |    ${ZOrder.quantShiftSql("max(y)")} AS ys FROM base),
       |z AS (SELECT CAST($z AS BIGINT) AS z, x, y FROM base, s)
       |SELECT z >> 18 AS z_bucket, count(*) AS n,
       |  min(x) AS x_min, max(x) AS x_max,
       |  min(y) AS y_min, max(y) AS y_max
       |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin
  }

  /** Hilbert-layout audit ([[graft.operators.HilbertLayout]]): the
    * `zorder_stats` frame on the locality-superior curve, over the
    * same (custkey, order-day) dimensions. Gate-only: runtime face is
    * `zorder_stats`' quantize + bucket aggregate (the index swap is a
    * per-row expression). The oracle replays Hamilton's 16-step walk
    * as chained CTEs, so the hash verifies every index bit.
    */
  def hilbertStats(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    graft.operators.HilbertLayout.bucketStats(orders,
        col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")),
        prefixShift = 18)
      .orderBy("h_bucket")
  }

  val hilbertStatsSql: String = {
    val day = "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    val (walk, last) = graft.expressions.HilbertIndex.walkSql("q",
      keep = Seq("hx", "hy"))
    s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS hx,
       |    CAST($day AS BIGINT) AS hy FROM orders),
       |s AS (SELECT ${ZOrder.quantShiftSql("max(hx)")} AS xs,
       |    ${ZOrder.quantShiftSql("max(hy)")} AS ys FROM base),
       |q AS (SELECT (hx >> xs) & 65535 AS x, (hy >> ys) & 65535 AS y,
       |    CAST(0 AS BIGINT) AS d, hx, hy FROM base, s),
       |$walk
       |SELECT d >> 18 AS h_bucket, count(*) AS n,
       |  min(hx) AS x_min, max(hx) AS x_max,
       |  min(hy) AS y_min, max(hy) AS y_max
       |FROM $last GROUP BY 1 ORDER BY h_bucket""".stripMargin
  }

  /** Pairwise cross-source content overlap from KMV sketches
    * ([[KmvSketch.pairwiseOverlap]]) — the theta-sketch intersection
    * rule over the SAME per-source 3-gram sketches as `kmv_distinct`:
    * estimated Jaccard and distinct-intersection size for all 190
    * source pairs WITHOUT joining the full gram populations (at
    * 100 TB: one sketch-construction pass, then sketch-frame-only
    * joins — the cross-corpus contamination/overlap audit an ingest
    * pipeline runs per snapshot pair). Gate-only: the data-scale
    * runtime face is `kmv_distinct`'s sketch construction; everything
    * past it runs on ≤ groups·k rows. The oracle replays the bottom-k
    * sketches, the per-pair θ = min rule, and both estimate divisions.
    */
  def sketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val posts = docs.select(col("source"),
      explode(TextFeatures.textShingles(col("text"), 3)).as("gram"))
    KmvSketch.pairwiseOverlap(posts, "source", "gram", KmvK)
      .orderBy("src_a", "src_b")
  }

  val sketchOverlapSql: String = {
    val h = OracleDialect.hexPrefixToLong("md5(gram)", 12)
    val spaceInt = KmvSketch.HashSpaceLong // 2^48 as exact BIGINT
    val spaceDbl = "281474976710656e0"
    s"""WITH w AS (SELECT source, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |g0 AS (SELECT source, CASE WHEN len(w) >= 3 THEN
       |    list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |      for i in generate_series(1, len(w) - 2)])
       |  ELSE [] END AS grams FROM w),
       |p AS (SELECT source AS grp, unnest(grams) AS gram FROM g0),
       |h AS (SELECT DISTINCT grp, CAST($h AS BIGINT) AS h FROM p),
       |r AS (SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM h),
       |sk AS (SELECT grp, h FROM r WHERE rk <= $KmvK),
       |g AS (SELECT grp, CASE WHEN count(*) < $KmvK THEN $spaceInt
       |    ELSE max(h) END AS theta FROM sk GROUP BY grp),
       |pr AS (SELECT a.grp AS src_a, b.grp AS src_b,
       |    least(a.theta, b.theta) AS theta
       |  FROM g a JOIN g b ON a.grp < b.grp),
       |cm AS (SELECT a.grp AS src_a, b.grp AS src_b,
       |    count(*) AS n_common
       |  FROM sk a JOIN sk b ON b.h = a.h AND a.grp < b.grp
       |  GROUP BY 1, 2),
       |ba AS (SELECT p.src_a, p.src_b, count(*) AS n_a FROM pr p
       |  JOIN sk s ON s.grp = p.src_a AND s.h <= p.theta GROUP BY 1, 2),
       |bb AS (SELECT p.src_a, p.src_b, count(*) AS n_b FROM pr p
       |  JOIN sk s ON s.grp = p.src_b AND s.h <= p.theta GROUP BY 1, 2),
       |j AS (SELECT p.src_a, p.src_b, p.theta,
       |    COALESCE(cm.n_common, 0) AS n_common,
       |    COALESCE(ba.n_a, 0) + COALESCE(bb.n_b, 0)
       |      - COALESCE(cm.n_common, 0) AS n_union
       |  FROM pr p
       |  LEFT JOIN ba ON ba.src_a = p.src_a AND ba.src_b = p.src_b
       |  LEFT JOIN bb ON bb.src_a = p.src_a AND bb.src_b = p.src_b
       |  LEFT JOIN cm ON cm.src_a = p.src_a AND cm.src_b = p.src_b)
       |SELECT src_a, src_b, theta, n_common, n_union,
       |  CASE WHEN n_union = 0 THEN 0.0
       |    ELSE CAST(n_common AS DOUBLE) / n_union END AS est_jaccard,
       |  CAST(n_common AS DOUBLE) * $spaceDbl / theta AS est_inter
       |FROM j ORDER BY src_a, src_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_overlap" -> (sketchOverlap(_, _)),
    "hilbert_stats" -> (hilbertStats(_, _)),
    "kmv_distinct" -> (kmvDistinct(_, _)),
    "hll_distinct" -> (hllDistinct(_, _)),
    "hll_upsert" -> (hllUpsert(_, _)),
    "cms_counts" -> (cmsCounts(_, _)),
    "quantile_sketch" -> (quantileSketch(_, _)),
    "quantile_upsert" -> (quantileUpsert(_, _)),
    "zorder_stats" -> (zorderStats(_, _)))

  val oracleSql: Map[String, String] = Map(
    "sketch_overlap" -> sketchOverlapSql,
    "hilbert_stats" -> hilbertStatsSql,
    "kmv_distinct" -> kmvDistinctSql,
    "hll_distinct" -> hllDistinctSql,
    "hll_upsert" -> hllUpsertSql,
    "cms_counts" -> cmsCountsSql,
    "quantile_sketch" -> quantileSketchSql,
    "quantile_upsert" -> quantileSketchSql,
    "zorder_stats" -> zorderStatsSql)
}
