package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage queries over the TPC-H-ish testdata.
  *
  * Cross-engine determinism rules (vs the DuckDB oracle):
  *   - money sums go through DECIMAL (exact, order-independent) and are
  *     cast back to DOUBLE at the end — identical bits in both engines
  *     PROVIDED the decimal's scaled integer stays below 2^53: DuckDB's
  *     decimal→double cast converts that integer to double before
  *     dividing, so a scale-8 sum above ~9e7 silently loses a ulp
  *     (observed at sf0.1). Inputs here have ≤4 fractional digits, so
  *     scale 4 is both exact and 2^53-safe up to ~9e11 sums;
  *   - every output is fully ordered with a unique tie-break key;
  *   - window ranks are tie-broken by a unique column.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy partial aggregation.
    * At 100 TB this is the canonical map-side-combine query — one
    * shuffle of ~6 groups regardless of input size.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(24,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
    * The dim side (filtered customer) is left unhinted: at bench scale
    * AQE/autoBroadcastJoinThreshold picks a broadcast join on its own,
    * and at 100× the plan degrades gracefully to a shuffle join instead
    * of forcing a driver OOM via an unconditional broadcast() hint.
    * orders⋈lineitem shuffles on the order key (the natural co-location
    * key at scale).
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp_ntz"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(24,4)")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3JoinAggSql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Window-function coverage: top-3 orders per customer by price,
    * uniquely tie-broken. One shuffle on the partition key.
    */
  def qWindowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  val qWindowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Event-time tumbling-hour aggregation over the events table — the
    * batch formulation of the windowed agg that
    * [[graft.streaming.EventStream]] runs incrementally with a watermark.
    */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    ev.groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(24,4)")).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val qEventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** Rolling z-score over the same hourly buckets, per event type —
    * [[graft.operators.Anomaly.rollingZ]]. The oracle recomputes the
    * trailing-24-bucket statistics with its own window machinery; the
    * integer sums make the two engines' different windowed-aggregation
    * algorithms bit-identical, and the double arithmetic is one shared
    * fixed-form expression.
    */
  def qAnomaly(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.rollingZ(
        Tables.loadEvents(spark, dir), "event_type", "ts", window = 24)
      .orderBy("grp", "bucket_ts")

  /** The shared scoring tail over any (grp, bucket_ts, n) CTE — one
    * definition so the sparse and dense oracles can't drift apart.
    */
  private def zScoreTailSql(src: String): String =
    s"""w AS (
       |  SELECT grp, bucket_ts, n,
       |    count(*) OVER win AS cnt,
       |    sum(n) OVER win AS s,
       |    sum(n * n) OVER win AS ss
       |  FROM $src WINDOW win AS (PARTITION BY grp ORDER BY bucket_ts
       |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
       |SELECT grp, bucket_ts, CAST(n AS BIGINT) AS n,
       |  CAST(s AS DOUBLE) / cnt AS mean_n,
       |  CASE WHEN (CAST(ss AS DOUBLE)
       |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / cnt > 0
       |    THEN (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / cnt)
       |      / sqrt((CAST(ss AS DOUBLE)
       |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / cnt) / cnt)
       |    ELSE 0.0 END AS z
       |FROM w ORDER BY grp, bucket_ts""".stripMargin

  private val hourlyBucketsCte: String =
    """b AS (
      |  SELECT event_type AS grp, date_trunc('hour', ts) AS bucket_ts,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val qAnomalySql: String =
    s"WITH $hourlyBucketsCte,\n${zScoreTailSql("b")}"

  /** The zero-filled variant: every hour in each type's observed span
    * gets a row ([[graft.operators.GapFill]]), so the trailing frame is
    * true wall-clock time. The oracle generates the same per-group
    * calendar with generate_series.
    */
  def qAnomalyDense(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Anomaly.rollingZDense(
        Tables.loadEvents(spark, dir), "event_type", "ts", window = 24)
      .orderBy("grp", "bucket_ts")

  val qAnomalyDenseSql: String =
    s"""WITH $hourlyBucketsCte,
       |sp AS (SELECT grp, min(bucket_ts) AS lo, max(bucket_ts) AS hi
       |  FROM b GROUP BY grp),
       |cal AS (SELECT grp,
       |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
       |  FROM sp),
       |d AS (SELECT cal.grp, cal.bucket_ts,
       |    CAST(COALESCE(b.n, 0) AS BIGINT) AS n
       |  FROM cal LEFT JOIN b ON b.grp = cal.grp
       |    AND b.bucket_ts = cal.bucket_ts),
       |${zScoreTailSql("d")}""".stripMargin

  /** Incremental aggregate maintenance over a history/delta split of
    * the events table: the standing per-(user, type) aggregate from
    * days 1–19 merged with the day-20+ batch via
    * [[graft.operators.AggMerge]]. The oracle aggregates ALL events in
    * one pass — the hash match IS the incremental ≡ full-recompute
    * identity (exact decimal sums make it hold bit-for-bit).
    */
  def qAggUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val cut = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val keys = Seq("user_id", "event_type")
    val base = graft.operators.AggMerge
      .aggregate(ev.filter(col("ts") < cut), keys, "value")
    graft.operators.AggMerge
      .upsert(base, ev.filter(col("ts") >= cut), keys, "value")
      .select(col("user_id"), col("event_type"), col("n"),
        col("total").cast("double").as("total"), col("vmin"), col("vmax"))
      .orderBy("user_id", "event_type")
  }

  val qAggUpsertSql: String =
    """SELECT user_id, event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS total,
      |  min(value) AS vmin, max(value) AS vmax
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Winsorized per-type stats ([[graft.operators.Winsorize]]): values
    * clipped to the exact [p01, p99] band, clipped counts on each
    * side, and the fixed-point clipped sum — the feature-prep
    * transform gate. Gate-only: runtime face is `q_percentiles`'s
    * rank window plus one aggregate.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Winsorize.clippedStats(
        Tables.loadEvents(spark, dir).select(col("event_type"), col("value")),
        "event_type", "value")
      .orderBy("event_type")

  val qWinsorizeSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events),
      |b AS (SELECT event_type,
      |    max(CASE WHEN rn = ceil(0.01 * cnt) THEN value END) AS lo_v,
      |    max(CASE WHEN rn = ceil(0.99 * cnt) THEN value END) AS hi_v
      |  FROM r GROUP BY event_type)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN e.value < b.lo_v THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_lo,
      |  CAST(sum(CASE WHEN e.value > b.hi_v THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_hi,
      |  CAST(sum(CAST(round(least(greatest(e.value, b.lo_v), b.hi_v) * 100)
      |    AS BIGINT)) AS BIGINT) AS sum_clipped_fp
      |FROM events e JOIN b ON b.event_type = e.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Exact discrete percentiles (p50/p90/p99 of event value per type),
    * computed from first principles in BOTH engines: rank the values,
    * pick the row at ceil(p·n) — percentile_disc semantics without
    * either engine's builtin (whose interpolation/types differ). Ranks
    * among tied values are arbitrary but the VALUE at any rank inside a
    * tie run is fixed, so the result is deterministic. One shuffle +
    * per-group sort; the picked rows collapse via conditional max.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val byType = Window.partitionBy(col("event_type"))
    val ranked = ev
      .withColumn("rn", row_number().over(byType.orderBy(col("value"))))
      .withColumn("cnt", count(lit(1)).over(byType))
    def pick(p: Double) =
      max(when(col("rn") === ceil(lit(p) * col("cnt")), col("value")))
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), pick(0.5).as("p50"),
        pick(0.9).as("p90"), pick(0.99).as("p99"))
      .orderBy("event_type")
  }

  val qPercentilesSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events)
      |SELECT event_type, count(*) AS n,
      |  max(CASE WHEN rn = ceil(0.5 * cnt) THEN value END) AS p50,
      |  max(CASE WHEN rn = ceil(0.9 * cnt) THEN value END) AS p90,
      |  max(CASE WHEN rn = ceil(0.99 * cnt) THEN value END) AS p99
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Robust outlier screen over event values
    * ([[graft.operators.RobustOutliers]]): per event_type exact
    * median / MAD with k = 3, the resistant alternative to
    * [[qAnomaly]]'s mean/σ. Same rank-arithmetic portability story as
    * [[qPercentiles]]; the med/mad doubles are exact data values and
    * exact IEEE differences, so they hash identically cross-engine.
    */
  def qOutliers(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustOutliers
      .summary(Tables.loadEvents(spark, dir), "event_type", "value")
      .orderBy("event_type")

  /** The monster-group formulation of [[qOutliers]]
    * ([[graft.operators.RobustOutliers.summarySpread]]): same result
    * by construction, no task ever holds a whole group. Shares the
    * q_outliers oracle verbatim, so every round's gate is a
    * machine-checked spread ≡ windowed identity on real data.
    */
  def qOutliersSpread(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustOutliers
      .summarySpread(Tables.loadEvents(spark, dir), "event_type", "value")
      .orderBy("event_type")

  val qOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |r1 AS (
      |  SELECT event_type, value,
      |    count(*) OVER (PARTITION BY event_type) AS cnt,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
      |  FROM e),
      |r2 AS (
      |  SELECT *, max(CASE WHEN rn = ceil(0.5 * cnt) THEN value END)
      |    OVER (PARTITION BY event_type) AS med
      |  FROM r1),
      |r3 AS (
      |  SELECT *, abs(value - med) AS dev,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY abs(value - med)) AS rn2
      |  FROM r2),
      |r4 AS (
      |  SELECT *, max(CASE WHEN rn2 = ceil(0.5 * cnt) THEN dev END)
      |    OVER (PARTITION BY event_type) AS mad
      |  FROM r3)
      |SELECT event_type, count(*) AS n, max(med) AS med, max(mad) AS mad,
      |  CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_out
      |FROM r4 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact equi-depth histogram ([[graft.operators.EquiDepth]]) of
    * order totals: ten equal-count buckets with their value ranges.
    * The oracle is the flat global-window definition (`row_number()
    * OVER (ORDER BY v, id)` through one reducer), so the hash match
    * proves the two-level-scan formulation — the one that survives
    * 100 TB — equals the definition it replaces, same gate pattern as
    * `text_pack`.
    */
  def qEquidepth(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EquiDepth.histogram(
        Tables.loadSpread(spark, dir, "orders"), "o_totalprice",
        "o_orderkey", k = 10)
      .orderBy("bucket")

  val qEquidepthSql: String =
    """WITH r AS (
      |  SELECT o_totalprice AS v,
      |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
      |    count(*) OVER () AS cnt
      |  FROM orders WHERE o_totalprice IS NOT NULL)
      |SELECT ((rn - 1) * 10) // cnt AS bucket, count(*) AS n,
      |  min(v) AS lo, max(v) AS hi
      |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Anti-join coverage: customers with no big urgent orders
    * (distributed left_anti — the scalable formulation of NOT EXISTS;
    * the filter is pushed below the join so only the qualifying order
    * keys shuffle).
    */
  def qCustNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 250000.0d)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val qCustNoOrdersSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0)
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q5-style 5-way join: revenue by nation within a region.
    * Dim chain (region→nation) broadcasts; the fact joins shuffle on
    * their natural keys.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(24,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q5RegionRevenueSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Grouping-sets coverage (absent from the reference, §2.9): rollup
    * with explicit grouping flags so subtotal rows are unambiguous.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
      .orderBy("g_rf", "g_ls", "rf", "ls")
  }

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |       coalesce(l_linestatus, '(all)') AS ls,
      |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
      |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
      |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

  /** Pivot coverage: order counts per year × priority, as conditional
    * aggregation (the portable formulation of PIVOT).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    ord.groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        count(when(col("o_orderpriority") === prios(0), 1)).as("n_urgent"),
        count(when(col("o_orderpriority") === prios(1), 1)).as("n_high"),
        count(when(col("o_orderpriority") === prios(2), 1)).as("n_medium"),
        count(lit(1)).as("n_total"))
      .orderBy("yr")
  }

  val qPivotSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      |  COUNT(*) AS n_total
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  /** Set-operator coverage (absent from the reference, §2.9):
    * INTERSECT and EXCEPT of customer key sets from two predicates,
    * tagged and unioned.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val big = ord.filter(col("o_totalprice") > 200000.0d)
      .select(col("o_custkey"))
    val both = urgent.intersect(big)
      .select(col("o_custkey"), lit("both").as("tag"))
    val urgentOnly = urgent.except(big)
      .select(col("o_custkey"), lit("urgent_only").as("tag"))
    both.unionByName(urgentOnly).orderBy("tag", "o_custkey")
  }

  val qSetOpsSql: String =
    """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
      |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM urgent INTERSECT SELECT * FROM big)
      |UNION ALL
      |SELECT o_custkey, 'urgent_only' AS tag FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big)
      |ORDER BY tag, o_custkey""".stripMargin

  /** Schema-on-read over the semi-structured `props` JSON column:
    * `from_json` with an explicit schema (never schema inference on a
    * 100 TB scan), then ordinary relational ops on the extracted field.
    */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    ev.select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")
  }

  val qJsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(SUM(CASE WHEN CAST(props->>'k' AS BIGINT) > 50
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** The skew-safe two-phase aggregation from
    * [[graft.operators.Salting]], verified through the oracle: salting
    * must be invisible in the result (sums/counts identical to the
    * direct groupBy), it only changes WHERE the rows aggregate. The
    * events table's 5 event types are exactly the hot-key shape the
    * technique exists for.
    */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    graft.operators.Salting.saltedSumCount(ev,
        col("event_type"), col("value").cast("decimal(24,4)"),
        saltBuckets = 8, carrier = col("event_id"))
      .select(col("key"), col("sum").cast("double").as("sum_value"), col("cnt"))
      .orderBy("key")
  }

  val qSaltedAggSql: String =
    """SELECT event_type AS key,
      |  CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** One-pass column profile of the orders table (see
    * [[graft.operators.ColumnProfile]]). The oracle melts with UNION
    * ALL + plain `count(DISTINCT ...)` — a different execution
    * strategy, so a hash match verifies the two-level distinct
    * aggregation against a direct computation.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ColumnProfile.profile(
        Tables.loadSpread(spark, dir, "orders"))
      .orderBy("col_name")

  val qProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val melt = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM orders")
      .mkString("\n  UNION ALL ")
    s"""WITH m AS (
       |  $melt)
       |SELECT col_name, count(*) AS n_rows,
       |  count(*) - count(value) AS n_null,
       |  count(DISTINCT value) AS n_distinct,
       |  min(value) AS min_val, max(value) AS max_val
       |FROM m GROUP BY col_name ORDER BY col_name""".stripMargin
  }

  /** Fixed-width 20-bucket histogram of order totals — the
    * data-profiling staple [[qProfile]] stops short of. The extent is a
    * 1-row aggregate broadcast onto the scan; the per-row bucket is
    * `floor((v - min) / width)` with the SAME operation order in both
    * engines (each step correctly-rounded IEEE, so bucket boundaries
    * agree bit-for-bit); the top bucket absorbs v = max via `least`.
    * Shuffle = 20 bucket rows.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val ext = ord.agg(min(col("o_totalprice")).as("vmin"),
      max(col("o_totalprice")).as("vmax"))
    ord.crossJoin(broadcast(ext))
      .select(
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor((col("o_totalprice") - col("vmin")) /
              ((col("vmax") - col("vmin")) / 20.0d)),
            lit(19L)))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val qHistogramSql: String =
    """WITH ext AS (
      |  SELECT min(o_totalprice) AS vmin, max(o_totalprice) AS vmax
      |  FROM orders)
      |SELECT CASE WHEN vmax = vmin THEN 0
      |            ELSE CAST(least(floor((o_totalprice - vmin) /
      |                   ((vmax - vmin) / 20.0)), 19) AS BIGINT) END AS bucket,
      |       count(*) AS n
      |FROM orders CROSS JOIN ext
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Data-quality expectations run ([[graft.operators.Quality]]): the
    * per-table rule reports (each ONE scan + one 1-row exchange
    * regardless of rule count) plus a referential-integrity check,
    * unioned long-form. The synthetic lineitem "PK" is genuinely
    * non-unique and the discount/totalprice contracts genuinely fail —
    * the report exercises both verdicts. The oracle recomputes every
    * rule as independent SQL, so violation COUNTS (not just pass
    * flags) are hash-gated.
    */
  /** Source × language contingency audit
    * ([[graft.operators.Contingency]]): does the corpus mix leak
    * source identity into language (or any pair that should be
    * independent)? Per-cell observed/expected/χ²-contribution, each a
    * single exact-integer division so the frame hash-verifies (a
    * summed χ² would be aggregation-order-dependent). Gate-only:
    * runtime face is one (a, b) count aggregate plus re-aggregates of
    * the tiny cell frame.
    */
  def dqContingency(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Contingency.table(
        Tables.load(spark, dir, "documents"), "source", "lang")
      .orderBy("a", "b")

  val dqContingencySql: String =
    """WITH cells AS (
      |  SELECT source AS a, lang AS b, count(*) AS o
      |  FROM documents GROUP BY 1, 2),
      |ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY a),
      |cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY b),
      |tot AS (SELECT sum(o) AS n FROM cells)
      |SELECT cells.a, cells.b, o AS observed,
      |  CAST(r * c AS DOUBLE) / n AS expected,
      |  (CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE))
      |    / CAST(r * c * n AS DOUBLE) AS contrib
      |FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
      |ORDER BY a, b""".stripMargin

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quality
    import graft.operators.Quality._
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val events = Tables.load(spark, dir, "events")
    val customer = Tables.load(spark, dir, "customer")
    Quality.report(Seq(
      Quality.check(orders, "orders", Seq(
        Unique("orders_orderkey_unique", Seq("o_orderkey")),
        NotNull("orders_custkey_notnull", "o_custkey"),
        InRange("orders_totalprice_range", "o_totalprice", "0", "400000"),
        Matches("orders_priority_format", "o_orderpriority", "^[1-5]-"))),
      Quality.check(lineitem, "lineitem", Seq(
        Unique("lineitem_pk_unique", Seq("l_orderkey", "l_linenumber")),
        InRange("lineitem_discount_range", "l_discount", "0.00", "0.08"),
        NotNull("lineitem_shipdate_notnull", "l_shipdate"))),
      Quality.foreignKey(events, "events", "user_id",
        customer, "customer", "c_custkey", "events_user_fk")))
  }

  val dqChecksSql: String =
    """WITH r AS (
      |SELECT 'orders_orderkey_unique' AS rule_id, 'orders' AS table_name,
      |  '(o_orderkey) unique' AS rule,
      |  count(*) - count(DISTINCT o_orderkey) AS violations,
      |  count(*) AS total FROM orders
      |UNION ALL
      |SELECT 'orders_custkey_notnull', 'orders', 'o_custkey is not null',
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*) FROM orders
      |UNION ALL
      |SELECT 'orders_totalprice_range', 'orders',
      |  'o_totalprice between 0 and 400000',
      |  CAST(sum(CASE WHEN o_totalprice IS NOT NULL
      |    AND o_totalprice NOT BETWEEN 0 AND 400000
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*) FROM orders
      |UNION ALL
      |SELECT 'orders_priority_format', 'orders',
      |  'o_orderpriority matches ^[1-5]-',
      |  CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
      |    AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*) FROM orders
      |UNION ALL
      |SELECT 'lineitem_pk_unique', 'lineitem',
      |  '(l_orderkey, l_linenumber) unique',
      |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)),
      |  count(*) FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_discount_range', 'lineitem',
      |  'l_discount between 0.00 and 0.08',
      |  CAST(sum(CASE WHEN l_discount IS NOT NULL
      |    AND l_discount NOT BETWEEN 0.00 AND 0.08
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*) FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_shipdate_notnull', 'lineitem',
      |  'l_shipdate is not null',
      |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*) FROM lineitem
      |UNION ALL
      |SELECT 'events_user_fk', 'events',
      |  'user_id references customer.c_custkey',
      |  CAST(sum(CASE WHEN e.user_id IS NOT NULL AND c.c_custkey IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT),
      |  count(*)
      |FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |  ON c.c_custkey = e.user_id
      |)
      |SELECT rule_id, table_name, rule, violations, total,
      |  violations = 0 AS pass
      |FROM r ORDER BY table_name, rule_id""".stripMargin

  // ------------------------------------------------------ record linkage

  /** Deterministically dirtied customer roster: per md5-derived class,
    * a two-char transposition typo in the name's word part, a
    * lowercased initial, or the name untouched — all three classes stay
    * STRICTLY closer (edit distance 0–2) to their source than to any
    * other customer (≥ 3 for typo'd, and the argmin tie-break never
    * reaches impostors for the rest), so linkage ground truth is known.
    * Blocking keys (nation, segment) are left clean.
    */
  private[graft] def dirtyCustomers(cust: DataFrame): DataFrame =
    cust.select(
      (col("c_custkey") + lit(10000000L)).as("d_id"),
      expr("""CASE
        WHEN substring(md5(cast(c_custkey AS string)), 1, 1)
            IN ('0','1','2','3','4')
          THEN concat(substring(c_name, 1, 5), substring(c_name, 7, 1),
                      substring(c_name, 6, 1), substring(c_name, 8, 100))
        WHEN substring(md5(cast(c_custkey AS string)), 1, 1)
            IN ('5','6','7','8','9')
          THEN concat('c', substring(c_name, 2, 100))
        ELSE c_name END""").as("d_name"),
      col("c_nationkey"), col("c_mktsegment"))

  /** Entity resolution of the dirtied roster against the clean one:
    * blocked on (nation, segment), levenshtein-scored, per-record
    * argmin. See [[graft.operators.RecordLinkage]].
    */
  def erMatch(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    // spread the PROBE side: the scoring work executes on the dirty
    // side's partitions, and the single-file test parquet is one input
    // split (the loadSpread rationale) — measured 6.8 s -> sub-second at
    // sf0.1 when the ~1.8M levenshtein evals stop serializing on a core
    graft.operators.RecordLinkage.resolve(
        dirtyCustomers(Tables.loadSpread(spark, dir, "customer")), cust,
        Seq("c_nationkey", "c_mktsegment"),
        "d_id", "d_name", "c_custkey", "c_name",
        graft.operators.RecordLinkage.Config(threshold = 2))
      .orderBy("d_id")
  }

  val erMatchSql: String =
    s"""WITH d AS (SELECT c_custkey + 10000000 AS d_id,
       |    CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('0','1','2','3','4')
       |      THEN concat(substr(c_name, 1, 5), substr(c_name, 7, 1),
       |                  substr(c_name, 6, 1), substr(c_name, 8, 100))
       |    WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('5','6','7','8','9')
       |      THEN concat('c', substr(c_name, 2, 100))
       |    ELSE c_name END AS d_name,
       |    c_nationkey, c_mktsegment
       |  FROM customer),
       |p AS (SELECT d.d_id, c.c_custkey,
       |    CAST(levenshtein(d.d_name, c.c_name) AS INTEGER) AS dist
       |  FROM d JOIN customer c
       |    ON c.c_nationkey = d.c_nationkey
       |   AND c.c_mktsegment = d.c_mktsegment
       |  WHERE levenshtein(d.d_name, c.c_name) <= 2)
       |SELECT d_id, match_id, match_dist, n_cand FROM (
       |  SELECT d_id, c_custkey AS match_id, dist AS match_dist,
       |    count(*) OVER (PARTITION BY d_id) AS n_cand,
       |    ROW_NUMBER() OVER (PARTITION BY d_id
       |                       ORDER BY dist, c_custkey) AS rn
       |  FROM p) WHERE rn = 1 ORDER BY d_id""".stripMargin

  /** Sorted-neighborhood linkage
    * ([[graft.operators.SortedNeighborhood]]): the dirty roster
    * resolved WITHOUT any equality blocking key — records pair inside
    * a 4-row window of the global (digit-tail, side, id) order, so
    * even a record whose every blocking column is corrupted still
    * meets its clean twin. Gate-only: runtime face is `er_match`'s
    * levenshtein + argmin (the rank adds one range exchange and a
    * band-keyed join). The oracle states the SPEC — a single global
    * `row_number() OVER (ORDER BY sk, side, id)` — so the hash match
    * proves the two-level range rank equals the global-sort
    * definition.
    */
  def erSorted(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    graft.operators.SortedNeighborhood.resolve(
        dirtyCustomers(Tables.loadSpread(spark, dir, "customer")), cust,
        "d_id", "d_name", expr("right(d_name, 8)"),
        "c_custkey", "c_name", expr("right(c_name, 8)"),
        graft.operators.SortedNeighborhood.Config(window = 4, threshold = 2))
      .orderBy("d_id")
  }

  val erSortedSql: String =
    s"""WITH d AS (SELECT c_custkey + 10000000 AS d_id,
       |    CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('0','1','2','3','4')
       |      THEN concat(substr(c_name, 1, 5), substr(c_name, 7, 1),
       |                  substr(c_name, 6, 1), substr(c_name, 8, 100))
       |    WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('5','6','7','8','9')
       |      THEN concat('c', substr(c_name, 2, 100))
       |    ELSE c_name END AS d_name
       |  FROM customer),
       |u AS (SELECT 0 AS side, d_id AS id, d_name AS txt,
       |    right(d_name, 8) AS sk FROM d
       |  UNION ALL SELECT 1, c_custkey, c_name, right(c_name, 8)
       |  FROM customer),
       |rk AS (SELECT side, id, txt,
       |    row_number() OVER (ORDER BY sk, side, id) - 1 AS rank FROM u),
       |l AS (SELECT id AS lid, txt AS ltxt, rank AS lr, rank // 3 AS band
       |  FROM rk WHERE side = 0),
       |r AS (SELECT id AS rid, txt AS rtxt, rank AS rr,
       |    rank // 3 + t.dd AS band
       |  FROM rk, (VALUES (-1), (0), (1)) t(dd) WHERE side = 1),
       |p AS (SELECT lid, rid,
       |    CAST(levenshtein(ltxt, rtxt) AS INTEGER) AS dist
       |  FROM l JOIN r USING (band)
       |  WHERE abs(lr - rr) <= 3 AND levenshtein(ltxt, rtxt) <= 2)
       |SELECT d_id, match_id, match_dist, n_cand FROM (
       |  SELECT lid AS d_id, rid AS match_id, dist AS match_dist,
       |    count(*) OVER (PARTITION BY lid) AS n_cand,
       |    ROW_NUMBER() OVER (PARTITION BY lid
       |                       ORDER BY dist, rid) AS rn
       |  FROM p) WHERE rn = 1 ORDER BY d_id""".stripMargin

  /** Blocking-FREE linkage of the dirtied roster via deletion
    * neighborhoods ([[graft.operators.SymDeleteJoin]], d = 1): no
    * equality block, no sort key — candidates are pairs sharing a
    * ≤1-deletion variant, verified `levenshtein ≤ 1`. The lev-2
    * transposition class drops out by design (the high-precision
    * tier); the lowercased-initial class lands on its source at
    * dist 1, untouched names argmin to themselves at dist 0 with
    * their one-digit neighbors counted in `n_cand`. Gate-only:
    * the variant-postings equi-join + bounded verify is the benched
    * `dedup_ngram` postings-join shape; the oracle restates the d=1
    * neighborhood with DuckDB list comprehensions, so the hash match
    * re-proves the native [[graft.expressions.DeletionNeighborhood]]
    * against character-indexed `substr` semantics end-to-end.
    */
  def erSymdel(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    graft.operators.SymDeleteJoin.resolve(
        dirtyCustomers(Tables.loadSpread(spark, dir, "customer")), cust,
        "d_id", "d_name", "c_custkey", "c_name", d = 1)
      .orderBy("d_id")
  }

  val erSymdelSql: String =
    s"""WITH d AS (SELECT c_custkey + 10000000 AS d_id,
       |    CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('0','1','2','3','4')
       |      THEN concat(substr(c_name, 1, 5), substr(c_name, 7, 1),
       |                  substr(c_name, 6, 1), substr(c_name, 8, 100))
       |    WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
       |        IN ('5','6','7','8','9')
       |      THEN concat('c', substr(c_name, 2, 100))
       |    ELSE c_name END AS d_name
       |  FROM customer),
       |lv AS (SELECT d_id, d_name,
       |    unnest(list_distinct([d_name] ||
       |      [substr(d_name, 1, i - 1) || substr(d_name, i + 1)
       |       for i in generate_series(1, length(d_name))])) AS v
       |  FROM d),
       |rv AS (SELECT c_custkey, c_name,
       |    unnest(list_distinct([c_name] ||
       |      [substr(c_name, 1, i - 1) || substr(c_name, i + 1)
       |       for i in generate_series(1, length(c_name))])) AS v
       |  FROM customer),
       |cand AS (SELECT DISTINCT lv.d_id, rv.c_custkey, lv.d_name, rv.c_name
       |  FROM lv JOIN rv USING (v)),
       |p AS (SELECT d_id, c_custkey,
       |    CAST(levenshtein(d_name, c_name) AS INTEGER) AS dist
       |  FROM cand WHERE levenshtein(d_name, c_name) <= 1)
       |SELECT d_id, match_id, match_dist, n_cand FROM (
       |  SELECT d_id, c_custkey AS match_id, dist AS match_dist,
       |    count(*) OVER (PARTITION BY d_id) AS n_cand,
       |    ROW_NUMBER() OVER (PARTITION BY d_id
       |                       ORDER BY dist, c_custkey) AS rn
       |  FROM p) WHERE rn = 1 ORDER BY d_id""".stripMargin

  // ------------------------------------------------------------------ psi

  /** PSI numeric-drift gate ([[graft.operators.Psi]]) on order totals
    * between the corpus and the doc_id%7-dropped recrawl slice (the
    * text_drift fixture convention). Gate-only: runtime face is
    * text_drift's count-merge shape over ≤ nBins rows. The oracle
    * replays both bin tables, the smoothing, and every quantized
    * contribution.
    */
  def qPsi(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    graft.operators.Psi.stability(
        orders, orders.filter(col("o_orderkey") % 7 =!= 0),
        "o_totalprice", lo = 0.0, width = 50000.0, nBins = 10)
      .orderBy("bin")
  }

  val qPsiSql: String =
    """WITH a AS (SELECT CAST(least(greatest(
      |    floor(o_totalprice / 50000.0), 0.0), 9.0) AS BIGINT) AS bin
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |ac AS (SELECT bin, count(*) AS n_a FROM a GROUP BY bin),
      |b AS (SELECT CAST(least(greatest(
      |    floor(o_totalprice / 50000.0), 0.0), 9.0) AS BIGINT) AS bin
      |  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey % 7 != 0),
      |bc AS (SELECT bin, count(*) AS n_b FROM b GROUP BY bin),
      |tot AS (SELECT (SELECT sum(n_a) FROM ac) AS ta,
      |  (SELECT sum(n_b) FROM bc) AS tb),
      |m AS (SELECT COALESCE(ac.bin, bc.bin) AS bin,
      |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      |  FROM ac FULL OUTER JOIN bc ON ac.bin = bc.bin),
      |r AS (SELECT bin, n_a, n_b,
      |    CAST(n_a + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE) AS pa,
      |    CAST(n_b + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE) AS pb
      |  FROM m, tot)
      |SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(floor(((pb - pa) * ln(pb / pa)) * 1e9) AS BIGINT) AS psi_q
      |FROM r ORDER BY bin""".stripMargin

  /** Wasserstein-1 (EMD) drift gate ([[graft.operators.Emd]]) on the
    * q_psi fixture — the transport companion: PSI reads rate ratios,
    * W1 reads how FAR the mass moved (a 1-bin vs 10-bin shift of the
    * same mass separate). Cross-multiplied integer CDF terms — no
    * division crosses the gate. Gate-only: runtime face is q_psi's
    * two count-aggregates + bounded-bin merge; what this gate adds is
    * the dense bin spine and the exact transport arithmetic.
    */
  def qEmd(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    graft.operators.Emd.w1Binned(
        orders, orders.filter(col("o_orderkey") % 7 =!= 0),
        "o_totalprice", lo = 0.0, width = 50000.0, nBins = 10)
      .orderBy("bin")
  }

  val qEmdSql: String =
    """WITH a AS (SELECT CAST(least(greatest(
      |    floor(o_totalprice / 50000.0), 0.0), 9.0) AS BIGINT) AS bin
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |ac AS (SELECT bin, count(*) AS n_a FROM a GROUP BY bin),
      |b AS (SELECT CAST(least(greatest(
      |    floor(o_totalprice / 50000.0), 0.0), 9.0) AS BIGINT) AS bin
      |  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey % 7 != 0),
      |bc AS (SELECT bin, count(*) AS n_b FROM b GROUP BY bin),
      |tot AS (SELECT CAST((SELECT sum(n_a) FROM ac) AS BIGINT) AS ta,
      |  CAST((SELECT sum(n_b) FROM bc) AS BIGINT) AS tb),
      |spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
      |m AS (SELECT s.bin,
      |    CAST(COALESCE(ac.n_a, 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(bc.n_b, 0) AS BIGINT) AS n_b
      |  FROM spine s LEFT JOIN ac ON ac.bin = s.bin
      |  LEFT JOIN bc ON bc.bin = s.bin),
      |c AS (SELECT bin, n_a, n_b,
      |    CAST(sum(n_a) OVER (ORDER BY bin) AS BIGINT) AS cum_a,
      |    CAST(sum(n_b) OVER (ORDER BY bin) AS BIGINT) AS cum_b
      |  FROM m)
      |SELECT bin, n_a, n_b, cum_a, cum_b,
      |  CAST(abs(CAST(cum_a AS HUGEINT) * tb - CAST(cum_b AS HUGEINT) * ta)
      |    AS VARCHAR) AS w1_num
      |FROM c, tot ORDER BY bin""".stripMargin

  /** Benford first-digit audit ([[graft.operators.Benford]]) of order
    * totals — the forensic governance screen beside `dq_checks`:
    * per-digit observed vs log10(1+1/d) expected rates in ppm with a
    * χ²-style integer deviation. Gate-only: runtime face is the q_psi
    * one-count-aggregate + bounded-spine shape; the expected table is
    * baked into plan AND oracle from the same Scala constants (zero
    * runtime libm).
    */
  def dqBenford(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Benford.firstDigitAudit(
        Tables.load(spark, dir, "orders"), "o_totalprice")
      .orderBy("digit")

  val dqBenfordSql: String = {
    val expCase = (1 to 9)
      .map(d => s"WHEN $d THEN ${graft.operators.Benford.ExpectedPpm(d - 1)}")
      .mkString("CASE digit ", " ", " END")
    s"""WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
       |    AND floor(o_totalprice * 100) >= 1),
       |g AS (SELECT digit, count(*) AS n FROM c GROUP BY digit),
       |spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g),
       |m AS (SELECT s.digit, CAST(COALESCE(g.n, 0) AS BIGINT) AS n
       |  FROM spine s LEFT JOIN g ON g.digit = s.digit),
       |p AS (SELECT digit, n, (1000000 * n) // t AS obs_ppm,
       |    $expCase AS exp_ppm
       |  FROM m, t)
       |SELECT digit, n, obs_ppm, exp_ppm,
       |  ((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) // exp_ppm AS dev_q
       |FROM p ORDER BY digit""".stripMargin
  }

  // ---------------------------------------------------------- k-anonymity

  /** k-anonymity audit ([[graft.operators.KAnonymity]]) over customer
    * quasi-identifiers (segment, nation, account-balance band): the
    * under-k combination worklist. Gate-only: runtime face is the
    * benched groupBy-count shape (q1_agg). The oracle replays the
    * banding, the combination counts, and the under-k cut.
    */
  def dqKanon(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KAnonymity.violations(
        Tables.load(spark, dir, "customer")
          .withColumn("bal_band", floor(col("c_acctbal") / 1000.0d)
            .cast("bigint")),
        Seq("c_mktsegment", "c_nationkey", "bal_band"), k = 5L)
      .orderBy(col("n"), col("c_mktsegment"), col("c_nationkey"),
        col("bal_band"))

  val dqKanonSql: String =
    """SELECT c_mktsegment, c_nationkey,
      |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |  count(*) AS n
      |FROM customer
      |GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY n, c_mktsegment, c_nationkey, bal_band""".stripMargin

  // -------------------------------------------------------- bradley-terry

  /** Bradley-Terry supplier leaderboard from per-part price
    * tournaments ([[graft.operators.BradleyTerry]]): each part where
    * two suppliers quote different minimum unit prices is one game,
    * the MM fixed point turns the win matrix into strengths. The
    * oracle replays the tournament, the game summary, and ALL MM
    * iterations (ordered folds — no libm anywhere, so the gate hashes
    * RAW doubles). Gate-only: the distributed stage is the benched
    * part-keyed aggregate + self-join shape (dedup_ngram's postings
    * class); the MM loop is entity-bounded.
    */
  def qBtrank(spark: SparkSession, dir: String): DataFrame = {
    val up = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("mp"))
    val a = up.select(col("p"), col("s").as("sa"), col("mp").as("pa"))
    val b = up.select(col("p"), col("s").as("sb"), col("mp").as("pb"))
    val outcomes = a.join(b, Seq("p"))
      .filter(col("sa") < col("sb") && col("pa") =!= col("pb"))
      .select(
        when(col("pa") < col("pb"), col("sa")).otherwise(col("sb"))
          .as("winner"),
        when(col("pa") < col("pb"), col("sb")).otherwise(col("sa"))
          .as("loser"))
    graft.operators.BradleyTerry.strengths(spark,
        graft.operators.BradleyTerry.games(outcomes, "winner", "loser"),
        iters = 8)
      .orderBy(col("strength").desc, col("id"))
  }

  val qBtrankSql: String = {
    val fold = "(x, y) -> x + y"
    def iter(k: Int): String = {
      val prev = s"s${k - 1}"
      s"""u$k AS MATERIALIZED (SELECT o.i AS id,
         |    w.n_wins / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(o.n / (si.s + sj.s) ORDER BY o.j)), $fold) AS su
         |  FROM opps o
         |  JOIN $prev si ON si.id = o.i
         |  JOIN $prev sj ON sj.id = o.j
         |  JOIN ent w ON w.id = o.i
         |  GROUP BY o.i, w.n_wins, si.s),
         |t$k AS MATERIALIZED (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(su ORDER BY id)), $fold) AS t FROM u$k),
         |s$k AS MATERIALIZED (SELECT id, su / t AS s FROM u$k, t$k)""".stripMargin
    }
    s"""WITH up AS MATERIALIZED (SELECT l_partkey AS p, l_suppkey AS s,
       |    min(l_extendedprice / l_quantity) AS mp
       |  FROM lineitem GROUP BY 1, 2),
       |g0 AS (SELECT a.s AS a, b.s AS b,
       |    CASE WHEN a.mp < b.mp THEN 1 ELSE 0 END AS wa
       |  FROM up a JOIN up b ON a.p = b.p AND a.s < b.s
       |  WHERE a.mp != b.mp),
       |gs AS MATERIALIZED (SELECT a, b, count(*) AS n, CAST(sum(wa) AS BIGINT) AS wa
       |  FROM g0 GROUP BY a, b),
       |ent AS MATERIALIZED (SELECT id, CAST(sum(n) AS BIGINT) AS n_games,
       |    CAST(sum(w) AS BIGINT) AS n_wins
       |  FROM (SELECT a AS id, n, wa AS w FROM gs
       |        UNION ALL SELECT b, n, n - wa FROM gs)
       |  GROUP BY id),
       |cnt AS (SELECT count(*) AS m FROM ent),
       |s0 AS MATERIALIZED (SELECT id, CAST(1 AS DOUBLE) / m AS s FROM ent, cnt),
       |opps AS MATERIALIZED (SELECT a AS i, b AS j, n FROM gs
       |         UNION ALL SELECT b, a, n FROM gs),
       |${(1 to 8).map(iter).mkString(",\n")}
       |SELECT e.id AS id, e.n_games, e.n_wins, s8.s AS strength
       |FROM ent e JOIN s8 ON s8.id = e.id
       |ORDER BY strength DESC, e.id""".stripMargin
  }

  // ------------------------------------------------------- correlation

  /** Exact-moment Pearson correlation
    * ([[graft.operators.Correlate.pearson]]): quantity vs extended
    * price per returnflag — the linear-association screen at the
    * TrendFit determinism standard (exact DECIMAL(38,0) rationals; one
    * sqrt leaves floor-quantized). Gate-only: `events_trend`'s
    * one-scan moment-aggregate face plus the correlation arithmetic.
    */
  def qCorr(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Correlate.pearson(
        Tables.load(spark, dir, "lineitem")
          .select(col("l_returnflag").as("grp"),
            col("l_quantity"), col("l_extendedprice")),
        Seq("grp"), col("l_quantity"), col("l_extendedprice"))
      .orderBy("grp")

  val qCorrSql: String =
    """WITH p AS (SELECT l_returnflag AS grp,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice * 1048576.0) AS BIGINT) AS y
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |m AS (SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM p GROUP BY grp),
      |r AS (SELECT grp, n,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS xvar,
      |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS yvar
      |  FROM m)
      |SELECT grp, CAST(n AS BIGINT) AS n,
      |  CAST(cov AS VARCHAR) AS cov_num,
      |  CAST(xvar AS VARCHAR) AS xvar_num,
      |  CAST(yvar AS VARCHAR) AS yvar_num,
      |  CASE WHEN xvar > 0 AND yvar > 0 THEN
      |    CAST(floor(1000000.0 * (CAST(cov AS DOUBLE) /
      |      (sqrt(CAST(xvar AS DOUBLE)) * sqrt(CAST(yvar AS DOUBLE)))))
      |      AS BIGINT)
      |  END AS corr_q
      |FROM r ORDER BY grp""".stripMargin

  // --------------------------------------------------------- key skew

  /** Shuffle-key hotspot pre-flight
    * ([[graft.operators.KeySkew.profile]] over `events.user_id`): the
    * top-key share + HHI concentration read taken before keying a
    * 100 TB join or aggregate on a column — the number that decides
    * the salting / AQE-skew hatches. Gate-only: one key census (the
    * `q_psi` count-aggregate face) + a single-row fold; Σ cnt² in
    * DECIMAL(38,0).
    */
  def dqKeyskew(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KeySkew.profile(
      Tables.load(spark, dir, "events"), "user_id")

  val dqKeyskewSql: String =
    """WITH c AS (SELECT user_id, count(*) AS cnt FROM events
      |  GROUP BY user_id),
      |a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |    count(*) AS n_keys,
      |    CAST(max(cnt) AS BIGINT) AS max_cnt,
      |    sum(CAST(cnt AS HUGEINT) * cnt) AS s2
      |  FROM c)
      |SELECT n, n_keys, max_cnt,
      |  CAST((CAST(max_cnt AS HUGEINT) * 1000000) // n AS BIGINT)
      |    AS top1_ppm,
      |  CAST((s2 * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |    AS hhi_ppm
      |FROM a""".stripMargin

  // ------------------------------------------------- materialized routing

  /** Materialized-summary routing end to end
    * ([[graft.plans.SummaryCatalog]] + [[graft.plans.SummaryRewrite]]):
    * build and register a (returnflag, linestatus) rollup of lineitem,
    * then issue the NATURAL aggregate against the BASE table grouped
    * by a strict key subset — the optimizer must serve it from the
    * summary (plan-asserted in SummaryRewriteSpec) with answers
    * hash-identical to the oracle's direct aggregation, which is the
    * rewrite's whole correctness claim. Gate-only: the summary build
    * is q1_agg's benched aggregate shape; the routed query reads a
    * 4-row table.
    */
  def qMvRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.SummaryCatalog
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 2)
    val base = s"$dir/lineitem.parquet"
    val sumPath = s"${System.getProperty("java.io.tmpdir")}/graft_mv/" +
      s"${new java.io.File(dir).getName}/lineitem_rfls"
    SummaryCatalog.build(spark, base, sumPath,
      keys = Seq("l_returnflag", "l_linestatus"),
      measures = Seq(
        SummaryCatalog.Measure("count", ""),
        SummaryCatalog.Measure("sum", "l_quantity", Some(dec)),
        SummaryCatalog.Measure("max", "l_shipdate")))
    spark.read.parquet(base)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag")
  }

  val qMvRollupSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  MAX(l_shipdate) AS last_ship
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mv_rollup" -> (qMvRollup(_, _)),
    "q_btrank" -> (qBtrank(_, _)),
    "q_psi" -> (qPsi(_, _)),
    "q_emd" -> (qEmd(_, _)),
    "dq_benford" -> (dqBenford(_, _)),
    "dq_keyskew" -> (dqKeyskew(_, _)),
    "q_corr" -> (qCorr(_, _)),
    "dq_kanon" -> (dqKanon(_, _)),
    "er_sorted" -> (erSorted(_, _)),
    "er_symdel" -> (erSymdel(_, _)),
    "dq_checks" -> (dqChecks(_, _)),
    "dq_contingency" -> (dqContingency(_, _)),
    "er_match" -> (erMatch(_, _)),
    "q1_agg" -> (q1Agg(_, _)),
    "q_histogram" -> (qHistogram(_, _)),
    "q_profile" -> (qProfile(_, _)),
    "q3_join_agg" -> (q3JoinAgg(_, _)),
    "q5_region_revenue" -> (q5RegionRevenue(_, _)),
    "q_window_top_orders" -> (qWindowTopOrders(_, _)),
    "q_events_hourly" -> (qEventsHourly(_, _)),
    "q_anomaly" -> (qAnomaly(_, _)),
    "q_anomaly_dense" -> (qAnomalyDense(_, _)),
    "q_agg_upsert" -> (qAggUpsert(_, _)),
    "q_percentiles" -> (qPercentiles(_, _)),
    "q_winsorize" -> (qWinsorize(_, _)),
    "q_outliers" -> (qOutliers(_, _)),
    "q_outliers_spread" -> (qOutliersSpread(_, _)),
    "q_equidepth" -> (qEquidepth(_, _)),
    "q_cust_no_orders" -> (qCustNoOrders(_, _)),
    "q_rollup" -> (qRollup(_, _)),
    "q_pivot" -> (qPivot(_, _)),
    "q_setops" -> (qSetOps(_, _)),
    "q_json_extract" -> (qJsonExtract(_, _)),
    "q_salted_agg" -> (qSaltedAgg(_, _)))

  val oracleSql: Map[String, String] = Map(
    "er_match" -> erMatchSql,
    "q_mv_rollup" -> qMvRollupSql,
    "q_btrank" -> qBtrankSql,
    "q_psi" -> qPsiSql,
    "q_emd" -> qEmdSql,
    "dq_benford" -> dqBenfordSql,
    "dq_keyskew" -> dqKeyskewSql,
    "q_corr" -> qCorrSql,
    "dq_kanon" -> dqKanonSql,
    "er_sorted" -> erSortedSql,
    "er_symdel" -> erSymdelSql,
    "q1_agg" -> q1AggSql,
    "q_histogram" -> qHistogramSql,
    "q_profile" -> qProfileSql,
    "q3_join_agg" -> q3JoinAggSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "q_window_top_orders" -> qWindowTopOrdersSql,
    "q_events_hourly" -> qEventsHourlySql,
    "q_anomaly" -> qAnomalySql,
    "q_anomaly_dense" -> qAnomalyDenseSql,
    "q_agg_upsert" -> qAggUpsertSql,
    "q_percentiles" -> qPercentilesSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_outliers" -> qOutliersSql,
    "q_outliers_spread" -> qOutliersSql,
    "q_equidepth" -> qEquidepthSql,
    "q_cust_no_orders" -> qCustNoOrdersSql,
    "q_rollup" -> qRollupSql,
    "q_pivot" -> qPivotSql,
    "q_setops" -> qSetOpsSql,
    "dq_checks" -> dqChecksSql,
    "dq_contingency" -> dqContingencySql,
    "q_json_extract" -> qJsonExtractSql,
    "q_salted_agg" -> qSaltedAggSql)
}
