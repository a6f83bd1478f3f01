package graft.queries

import graft.operators.{AsOfJoin, PageRank, RangeJoin, TrendFit}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-verifiable temporal-join queries over the events table.
  *
  * The as-of oracle uses DuckDB's native ASOF JOIN — an independent
  * implementation of the same semantics, so a hash match really checks
  * the union+carry-forward formulation against a reference engine. The
  * right side is pre-aggregated to unique (user, ts) so both engines'
  * tie policies coincide.
  */
object TemporalQueries {

  /** Each click annotated with the user's latest purchase at-or-before
    * the click (point-in-time feature lookup).
    */
  def qAsofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("pvalue"))
    AsOfJoin.joinAsOf(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("pvalue"))
      .orderBy("event_id")
  }

  val qAsofPurchaseSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |pur AS (
      |  SELECT user_id, ts, max(value) AS pvalue FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts,
      |       p.ts AS asof_ts, p.pvalue AS asof_pvalue
      |FROM clicks c ASOF LEFT JOIN pur p
      |  ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** Each click annotated with the user's NEXT purchase at-or-after
    * the click ([[graft.operators.AsOfJoin.joinAsOfForward]]) — the
    * time-to-conversion / next-event attribution label. Same
    * one-shuffle union-scan shape as `q_asof_purchase`, scanning
    * descending; the oracle is DuckDB's native ASOF with the
    * inequality flipped.
    */
  def qAsofNext(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("pvalue"))
    AsOfJoin.joinAsOfForward(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("pvalue"))
      .orderBy("event_id")
  }

  val qAsofNextSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |pur AS (
      |  SELECT user_id, ts, max(value) AS pvalue FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts,
      |       p.ts AS next_ts, p.pvalue AS next_pvalue
      |FROM clicks c ASOF LEFT JOIN pur p
      |  ON c.user_id = p.user_id AND p.ts >= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** Per purchase: how many clicks the user made in the hour leading up
    * to it (attribution-window count; purchases with zero clicks in
    * window are absent — inner range-join).
    */
  def qRangeClicks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    RangeJoin.joinRange(purchases, clicks, Seq("user_id"),
        "w_start", "p_ts", "c_ts", "hour")
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("p_id")
  }

  val qRangeClicksSql: String =
    """WITH pur AS (
      |  SELECT event_id AS p_id, user_id, ts AS p_ts,
      |         ts - INTERVAL 1 HOUR AS w_start
      |  FROM events WHERE event_type = 'purchase'),
      |clicks AS (
      |  SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
      |SELECT p.p_id, count(*) AS n_clicks
      |FROM pur p JOIN clicks c
      |  ON c.user_id = p.user_id AND c.c_ts >= p.w_start AND c.c_ts <= p.p_ts
      |GROUP BY p.p_id ORDER BY p.p_id""".stripMargin

  /** Interval-OVERLAP attribution ([[graft.operators.RangeJoin
    * .joinOverlap]]): per user, purchase attribution windows
    * [ts−1h, ts] × click engagement windows [ts, ts+30m] — how many
    * engagement windows INTERSECT each purchase window (window×window,
    * where `q_range_clicks` is window×point). Gate-only: runtime face
    * is `q_range_clicks`' bucketized equi-join; what this gate adds is
    * the two-sided explode + the emit-once first-overlap-bucket rule
    * (no result-wide DISTINCT), which the naive theta-join oracle
    * proves pair-exact.
    */
  def qOverlapAttr(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("p_start"),
        col("ts").as("p_end"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_start"),
        (col("ts") + expr("INTERVAL 30 MINUTE")).as("c_end"))
    graft.operators.RangeJoin.joinOverlap(pur, clk, Seq("user_id"),
        "p_start", "p_end", "c_start", "c_end", "hour")
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy("p_id")
  }

  val qOverlapAttrSql: String =
    """WITH pur AS (
      |  SELECT event_id AS p_id, user_id,
      |         ts - INTERVAL 1 HOUR AS p_start, ts AS p_end
      |  FROM events WHERE event_type = 'purchase'),
      |clk AS (
      |  SELECT user_id, ts AS c_start, ts + INTERVAL 30 MINUTE AS c_end
      |  FROM events WHERE event_type = 'click')
      |SELECT p.p_id, count(*) AS n_windows
      |FROM pur p JOIN clk c
      |  ON c.user_id = p.user_id
      | AND p.p_start <= c.c_end AND c.c_start <= p.p_end
      |GROUP BY p.p_id ORDER BY p.p_id""".stripMargin

  /** Batch sessionization via Spark's `session_window` (the batch face
    * of [[graft.streaming.Sessionize]]): per-user sessions split at
    * ≥30-minute gaps. The oracle derives the same sessions through the
    * classic gaps-and-islands SQL (lag + running sum) — a structurally
    * different algorithm agreeing on every boundary. A gap of exactly
    * the threshold starts a NEW session in both (session_window's
    * half-open [start, end) ↔ the oracle's `>=`).
    */
  def qSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val qSessionsSql: String =
    """WITH flags AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flags)
      |SELECT user_id, min(ts) AS session_start,
      |       max(ts) + INTERVAL 30 MINUTE AS session_end,
      |       count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Impression→conversion label join: each view paired with the same
    * user's purchases in the 2 hours after it, aggregated to conversion
    * count + value per impression. This is the BATCH face of
    * [[graft.streaming.StreamJoin.withinHorizon]] — the identical
    * function powers the watermarked stream-stream join, so an oracle
    * hash match here DuckDB-verifies the streaming operator's join
    * semantics too (the stream≡batch equality is spec-asserted).
    */
  def qLabelJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("v_ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    graft.streaming.StreamJoin
      .withinHorizon(views, conv, "user_id", "v_ts", "p_ts", "2 HOUR")
      .groupBy(col("view_id"))
      .agg(
        count(lit(1)).as("n_conv"),
        sum(col("value").cast("decimal(24,4)")).cast("double")
          .as("conv_value"))
      .orderBy("view_id")
  }

  val qLabelJoinSql: String =
    """WITH v AS (
      |  SELECT event_id AS view_id, user_id, ts AS v_ts
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, ts AS p_ts, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT v.view_id, count(*) AS n_conv,
      |       CAST(SUM(CAST(p.value AS DECIMAL(24,4))) AS DOUBLE) AS conv_value
      |FROM v JOIN p
      |  ON p.user_id = v.user_id
      | AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 2 HOUR
      |GROUP BY v.view_id ORDER BY v.view_id""".stripMargin

  /** Sequential funnel view → click → purchase per user. The oracle
    * derives each stage as its own join-against-previous-stage CTE —
    * a different algorithm from the Spark side's chained windowed mins
    * over one partitioning, so the hash match checks the strictly-after
    * semantics, not a shared plan.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    graft.operators.Funnel.stages(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step")
  }

  val qFunnelSql: String =
    """WITH s0 AS (
      |  SELECT user_id, min(ts) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (
      |  SELECT e.user_id, min(e.ts) AS t1 FROM events e
      |  JOIN s0 ON s0.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id),
      |c AS (SELECT
      |  (SELECT count(DISTINCT user_id) FROM events) AS nt,
      |  (SELECT count(*) FROM s0) AS n0,
      |  (SELECT count(*) FROM s1) AS n1,
      |  (SELECT count(*) FROM s2) AS n2)
      |SELECT step, stage, CAST(n_entities AS BIGINT) AS n_entities,
      |  CASE WHEN n_prev > 0
      |    THEN CAST(n_entities AS DOUBLE) / CAST(n_prev AS DOUBLE)
      |    ELSE 0.0 END AS conv
      |FROM (
      |  SELECT 1 AS step, 'view' AS stage, n0 AS n_entities, nt AS n_prev FROM c
      |  UNION ALL
      |  SELECT 2, 'click', n1, n0 FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase', n2, n1 FROM c)
      |ORDER BY step""".stripMargin

  /** Cohort retention: users grouped by signup week, retention = share
    * active (any event) in week k after signup. Week buckets are
    * Monday-aligned `date_trunc` in both engines; week offsets are
    * exact integer arithmetic on epoch seconds; retention is one
    * double division. Shape: one user-keyed shuffle for first-signup,
    * one distinct over (user, week), one broadcast-sized cohort join.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("signup_ts"))
      .select(col("user_id"), col("signup_ts"),
        date_trunc("week", col("signup_ts")).as("cohort"))
    val activity = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("week"), col("ts"))
    val active = activity.join(signup, "user_id")
      .filter(col("ts") >= col("signup_ts"))
      .select(col("user_id"), col("cohort"),
        ((col("week").cast("long") - col("cohort").cast("long")) / 604800L)
          .cast("int").as("week_k"))
      .distinct()
    val cohortSizes = signup.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    active.groupBy(col("cohort"), col("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSizes, "cohort")
      .select(col("cohort"), col("week_k"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
      .orderBy("cohort", "week_k")
  }

  val qRetentionSql: String =
    """WITH s AS (
      |  SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |sc AS (SELECT user_id, signup_ts,
      |    date_trunc('week', signup_ts) AS cohort FROM s),
      |act AS (SELECT DISTINCT e.user_id, sc.cohort,
      |    CAST((epoch(date_trunc('week', e.ts)) - epoch(sc.cohort))
      |      // 604800 AS INT) AS week_k
      |  FROM events e JOIN sc ON sc.user_id = e.user_id
      |  WHERE e.ts >= sc.signup_ts),
      |cs AS (SELECT cohort, count(*) AS n_cohort FROM sc GROUP BY cohort)
      |SELECT a.cohort, a.week_k, count(*) AS n_active, cs.n_cohort,
      |  CAST(count(*) AS DOUBLE) / cs.n_cohort AS retention
      |FROM act a JOIN cs ON cs.cohort = a.cohort
      |GROUP BY a.cohort, a.week_k, cs.n_cohort
      |ORDER BY a.cohort, a.week_k""".stripMargin

  /** Event transition matrix: for each user's time-ordered stream,
    * count (event_type → next event_type) steps and each source
    * type's outgoing share — the Markov/path-analysis staple. Ties in
    * ts break by event_id so `lead` is deterministic in both engines;
    * one user-keyed shuffle, then a tiny pair aggregate.
    */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("event_type"))
    steps
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(totals))
      .orderBy("event_type", "next_type")
  }

  val qTransitionsSql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |c AS (SELECT event_type, next_type, count(*) AS n FROM s
      |  WHERE next_type IS NOT NULL GROUP BY event_type, next_type)
      |SELECT event_type, next_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type) AS share
      |FROM c ORDER BY event_type, next_type""".stripMargin

  /** Top user journeys: each user's first five events (time-ordered,
    * event_id tie-break) concatenated into a path string, ranked by how
    * many users share the path — the sequence-level companion to the
    * step-level [[qTransitions]]. One user-keyed shuffle feeds BOTH the
    * rank filter and the ordered reassembly (the same window key);
    * path counting is a tiny aggregate; the final cut is orderBy+limit
    * → TakeOrderedAndProject. The oracle reassembles paths with
    * `string_agg(... ORDER BY)` — an independent formulation of the
    * sort_array/transform fold.
    */
  def qPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path"))
      .limit(20)
  }

  val qPathsSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, count(*) AS n_users
      |FROM p GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin

  /** Fixed-point PageRank ([[graft.operators.PageRank]]) over the
    * event-type transition graph (the same weighted edges as
    * [[qTransitions]]): Markov importance of event states. The oracle
    * REPLAYS THE RECURRENCE — five generated CTE rounds of the
    * identical integer arithmetic — so the hash match proves every
    * 64-bit rank of an iterative distributed algorithm, something a
    * floating-point PageRank could never put behind a hash gate.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    PageRank.ranks(edges, "src", "dst", "w", iters = 5)
      .orderBy(col("rank_fp").desc, col("node"))
  }

  val qPagerankSql: String = {
    val S = PageRank.Scale
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (
         |  SELECT n.node,
         |    (3 * $S) // (20 * (SELECT cnt FROM nn))
         |      + (17 * coalesce(c.m, 0)) // 20 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(e.w * (p.r // o.outw)) AS m
         |    FROM e JOIN r${k - 1} p ON p.node = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS dst
       |  FROM events),
       |e AS (SELECT src, dst, count(*) AS w FROM s
       |  WHERE dst IS NOT NULL GROUP BY src, dst),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT count(*) AS cnt FROM nodes),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e
       |  GROUP BY src),
       |r0 AS (SELECT node, $S // (SELECT cnt FROM nn) AS r FROM nodes),
       |$rounds
       |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r5
       |ORDER BY rank_fp DESC, node""".stripMargin
  }

  private val PprSeeds = Seq("signup", "purchase")

  /** Personalized PageRank ([[graft.operators.PageRank
    * .personalizedRanks]]): all teleport mass restarts at
    * {signup, purchase}, so rank becomes proximity to the conversion
    * states instead of global centrality — the related-entities form.
    * Gate-only: runtime face is `graph_pagerank`'s per-round join +
    * aggregate; the oracle replays the seeded recurrence for all five
    * rounds.
    */
  def qPpr(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    PageRank.personalizedRanks(edges, "src", "dst", "w", PprSeeds,
        iters = 5)
      .orderBy(col("rank_fp").desc, col("node"))
  }

  val qPprSql: String = {
    val S = PageRank.Scale
    val seedList = PprSeeds.map(s => s"'$s'").mkString("(", ", ", ")")
    val nSeeds = PprSeeds.length
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (
         |  SELECT n.node,
         |    (CASE WHEN n.node IN $seedList
         |       THEN (3 * $S) // (20 * $nSeeds) ELSE 0 END)
         |      + (17 * coalesce(c.m, 0)) // 20 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(e.w * (p.r // o.outw)) AS m
         |    FROM e JOIN r${k - 1} p ON p.node = e.src
         |    JOIN outw o ON o.src = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS dst
       |  FROM events),
       |e AS (SELECT src, dst, count(*) AS w FROM s
       |  WHERE dst IS NOT NULL GROUP BY src, dst),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e
       |  GROUP BY src),
       |r0 AS (SELECT node,
       |  CASE WHEN node IN $seedList THEN $S // $nSeeds ELSE 0 END AS r
       |  FROM nodes),
       |$rounds
       |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r5
       |ORDER BY rank_fp DESC, node""".stripMargin
  }

  /** Epoch seconds of 2024-01-01 UTC — the x baseline for the trend
    * gate (relative x keeps the 128-bit closed-form pieces far from
    * the DECIMAL(38,0) bound; see [[TrendFit]] overflow note).
    */
  private val TrendEpoch = 1704067200L

  /** Per-event-type metric trend ([[graft.operators.TrendFit]]): the
    * exact-rational OLS slope of `value` on seconds-since-2024 — the
    * "which feeds are drifting, which way, how fast" monitor as ONE
    * grouped aggregate (|event_type| summary rows after map-side
    * combine). Gate-only: the runtime face is the `q1_agg`-class
    * grouped-aggregate scan shape; what this gate adds is the
    * 128-bit closed-form arithmetic, pinned digit-for-digit.
    */
  def eventsTrend(spark: SparkSession, dir: String): DataFrame =
    TrendFit.fit(Tables.loadEvents(spark, dir), Seq("event_type"),
        // ntz → ltz is a wall-clock reinterpretation under the pinned
        // UTC session, so the long matches the oracle's epoch(ts)
        col("ts").cast("timestamp").cast("long") - TrendEpoch,
        col("value"))
      .orderBy("event_type")

  val eventsTrendSql: String =
    s"""WITH e AS (SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) - $TrendEpoch AS x,
       |    CAST(floor(value * ${TrendFit.Scale}.0) AS BIGINT) AS y
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
       |m AS (SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(y) AS BIGINT) AS sy_fp,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * y) AS syy
       |  FROM e GROUP BY event_type)
       |SELECT event_type, n, sx, sy_fp,
       |  CAST(CAST(n AS HUGEINT) * sxy
       |    - CAST(sx AS HUGEINT) * sy_fp AS VARCHAR) AS slope_num,
       |  CAST(CAST(n AS HUGEINT) * sxx
       |    - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS slope_den,
       |  CAST(CAST(n AS HUGEINT) * syy
       |    - CAST(sy_fp AS HUGEINT) * sy_fp AS VARCHAR) AS yvar_num
       |FROM m ORDER BY event_type""".stripMargin

  /** Weekly seasonality profile ([[graft.operators.Seasonality]]) of
    * event volume per type: phase = epoch-day mod 7, calendar-exact
    * denominators, ppm fixed-point indices — the cadence baseline the
    * anomaly/trend monitors normalize against. Gate-only: runtime
    * face is the `q_events_hourly` grouped-aggregate scan (the phase
    * rollup and broadcast joins run on summary frames); what this
    * gate adds is the closed-form calendar-day arithmetic, pinned
    * exactly.
    */
  /** Exact dyadic EWMA ([[graft.operators.Ewma.dailyHalfLife]]):
    * half-life-one-day smoothed daily volume per event type at the
    * latest day, all integer arithmetic (power-of-two decay in a 2^60
    * DECIMAL fixed point — no floating point anywhere). Gate-only:
    * the daily census is `q_events_hourly`'s aggregate face; the fold
    * runs over ≤ 60·|groups| summary rows.
    */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Ewma.dailyHalfLife(Tables.loadEvents(spark, dir),
        Seq("event_type"), col("ts"))
      .orderBy("event_type")

  val eventsEwmaSql: String = {
    val h = graft.operators.Ewma.HorizonDays
    s"""WITH e AS (SELECT event_type,
       |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
       |  FROM events WHERE ts IS NOT NULL),
       |daily AS (SELECT event_type, day, count(*) AS n FROM e
       |  GROUP BY 1, 2),
       |mx AS (SELECT event_type, max(day) AS maxd FROM daily
       |  GROUP BY 1),
       |t AS (SELECT d.event_type, d.n, d.day, m.maxd
       |  FROM daily d JOIN mx m USING (event_type)
       |  WHERE d.day > m.maxd - $h),
       |s AS (SELECT event_type, maxd,
       |    sum(CAST((1::BIGINT << CAST($h + t.day - t.maxd AS INTEGER))
       |        AS HUGEINT) * t.n) AS num
       |  FROM t GROUP BY event_type, maxd)
       |SELECT event_type, maxd AS day,
       |  CAST(num // ${1L << (h - 20)} AS BIGINT) AS ewma_q
       |FROM s ORDER BY event_type""".stripMargin
  }

  def qSeasonal(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Seasonality.profile(Tables.loadEvents(spark, dir),
        Seq("event_type"), col("ts"), period = 7)
      .orderBy("event_type", "phase")

  val qSeasonalSql: String =
    """WITH e AS (SELECT event_type,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
      |  FROM events WHERE ts IS NOT NULL),
      |daily AS (SELECT event_type, day, count(*) AS n FROM e
      |  GROUP BY 1, 2),
      |rng AS (SELECT min(day) AS mind, max(day) AS maxd FROM daily),
      |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
      |  FROM daily GROUP BY 1),
      |ph AS (SELECT event_type, day % 7 AS phase,
      |    CAST(sum(n) AS BIGINT) AS n_events, count(*) AS obs_days
      |  FROM daily GROUP BY 1, 2),
      |c AS (SELECT p.event_type, p.phase, p.n_events, p.obs_days,
      |    r.mind + (((p.phase - r.mind % 7) % 7 + 7) % 7) AS first_day,
      |    r.maxd, r.maxd - r.mind + 1 AS span, t.total
      |  FROM ph p CROSS JOIN rng r
      |  JOIN tot t ON t.event_type = p.event_type),
      |c2 AS (SELECT event_type, phase, n_events, obs_days,
      |    CASE WHEN first_day > maxd THEN 0
      |         ELSE (maxd - first_day) // 7 + 1 END AS cal_days,
      |    span, total
      |  FROM c)
      |SELECT event_type, phase, n_events, obs_days, cal_days,
      |  (1000000 * n_events) // cal_days AS mean_ppm,
      |  CAST((1000000 * CAST(n_events AS HUGEINT) * span)
      |    // (CAST(cal_days AS HUGEINT) * total) AS BIGINT) AS season_ppm
      |FROM c2 ORDER BY event_type, phase""".stripMargin

  /** Seasonally-adjusted daily anomalies
    * ([[graft.operators.Seasonality.dailyAnomalies]]): every (type,
    * day) judged against ITS OWN weekday phase's mean — the weekly
    * rhythm stops masquerading as anomaly (`q_anomaly`'s rolling z
    * reads calendar-blind). Gate-only: the `q_events_hourly` daily
    * aggregate + a broadcast join of the (groups × period) profile;
    * what the gate adds is the per-day ratio/verdict arithmetic,
    * all-integer.
    */
  def qSeasonalAnom(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Seasonality.dailyAnomalies(
        Tables.loadEvents(spark, dir), Seq("event_type"), col("ts"),
        period = 7, loPpm = 950000L, hiPpm = 1050000L)
      .orderBy("event_type", "day")

  val qSeasonalAnomSql: String =
    """WITH e AS (SELECT event_type,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
      |  FROM events WHERE ts IS NOT NULL),
      |daily AS (SELECT event_type, day, count(*) AS n FROM e
      |  GROUP BY 1, 2),
      |rng AS (SELECT min(day) AS mind, max(day) AS maxd FROM daily),
      |ph AS (SELECT event_type, day % 7 AS phase,
      |    CAST(sum(n) AS BIGINT) AS pt
      |  FROM daily GROUP BY 1, 2),
      |c AS (SELECT p.event_type, p.phase, p.pt,
      |    r.mind + (((p.phase - r.mind % 7) % 7 + 7) % 7) AS first_day,
      |    r.maxd
      |  FROM ph p CROSS JOIN rng r),
      |c2 AS (SELECT event_type, phase, pt,
      |    CASE WHEN first_day > maxd THEN 0
      |         ELSE (maxd - first_day) // 7 + 1 END AS cd
      |  FROM c),
      |j AS (SELECT d.event_type, d.day, d.day % 7 AS phase, d.n,
      |    (1000000 * d.n * c2.cd) // c2.pt AS ratio_ppm
      |  FROM daily d JOIN c2 ON c2.event_type = d.event_type
      |    AND c2.phase = d.day % 7)
      |SELECT event_type, day, phase, n, ratio_ppm,
      |  CASE WHEN ratio_ppm > 1050000 THEN 'SPIKE'
      |       WHEN ratio_ppm < 950000 THEN 'DROP'
      |       ELSE 'QUIET' END AS verdict
      |FROM j ORDER BY event_type, day""".stripMargin

  /** Theil-Sen robust daily-volume trend ([[graft.operators.TheilSen]])
    * per event type: median pairwise slope over the (type, day, count)
    * summary frame — the outlier-immune companion of `events_trend`'s
    * OLS (a crawler-outage day drags OLS, not the median). Gate-only:
    * the corpus-scale work is the `q_events_hourly`-class daily
    * aggregate; the pair join + rank run calendar-bounded (30 days →
    * 435 pairs/group). The oracle replays pairs, the (value, num, den)
    * rank, the lower-median pick, and the quantization.
    */
  def eventsTheilsen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.loadEvents(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(col("event_type"),
        // ntz → ltz → long under the pinned UTC session (the
        // events_trend convention), then the epoch-day bucket
        expr("cast(cast(ts as timestamp) as long) div 86400").as("day"))
      .agg(count(lit(1)).as("y"))
    graft.operators.TheilSen.fit(daily, Seq("event_type"),
        col("day"), col("y"))
      .orderBy("event_type")
  }

  val eventsTheilsenSql: String =
    """WITH e AS (SELECT event_type,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS x,
      |    count(*) AS y
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |p AS (SELECT a.event_type, b.y - a.y AS num, b.x - a.x AS den
      |  FROM e a JOIN e b ON b.event_type = a.event_type AND a.x < b.x),
      |r AS (SELECT event_type, num, den,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS np
      |  FROM p),
      |d AS (SELECT event_type, count(*) AS n_days FROM e GROUP BY 1)
      |SELECT r.event_type, d.n_days, CAST(np AS BIGINT) AS n_pairs,
      |  num AS med_num, den AS med_den,
      |  CAST(floor(1000000.0 * num / den) AS BIGINT) AS slope_q
      |FROM r JOIN d ON d.event_type = r.event_type
      |WHERE rn = (np + 1) // 2
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonal" -> (qSeasonal(_, _)),
    "events_ewma" -> (eventsEwma(_, _)),
    "events_theilsen" -> (eventsTheilsen(_, _)),
    "q_seasonal_anom" -> (qSeasonalAnom(_, _)),
    "events_trend" -> (eventsTrend(_, _)),
    "q_asof_purchase" -> (qAsofPurchase(_, _)),
    "q_asof_next" -> (qAsofNext(_, _)),
    "graph_pagerank" -> (qPagerank(_, _)),
    "graph_ppr" -> (qPpr(_, _)),
    "q_paths" -> (qPaths(_, _)),
    "q_range_clicks" -> (qRangeClicks(_, _)),
    "q_overlap_attr" -> (qOverlapAttr(_, _)),
    "q_sessions" -> (qSessions(_, _)),
    "q_label_join" -> (qLabelJoin(_, _)),
    "q_funnel" -> (qFunnel(_, _)),
    "q_retention" -> (qRetention(_, _)),
    "q_transitions" -> (qTransitions(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_seasonal" -> qSeasonalSql,
    "events_ewma" -> eventsEwmaSql,
    "events_theilsen" -> eventsTheilsenSql,
    "q_seasonal_anom" -> qSeasonalAnomSql,
    "events_trend" -> eventsTrendSql,
    "q_asof_purchase" -> qAsofPurchaseSql,
    "q_asof_next" -> qAsofNextSql,
    "graph_pagerank" -> qPagerankSql,
    "graph_ppr" -> qPprSql,
    "q_paths" -> qPathsSql,
    "q_range_clicks" -> qRangeClicksSql,
    "q_overlap_attr" -> qOverlapAttrSql,
    "q_sessions" -> qSessionsSql,
    "q_label_join" -> qLabelJoinSql,
    "q_funnel" -> qFunnelSql,
    "q_retention" -> qRetentionSql,
    "q_transitions" -> qTransitionsSql)
}
