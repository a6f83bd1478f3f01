package graft.queries

import graft.diff.DataColDiff
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries exercising the core diff operator on the
  * testdata `orders` table against a deterministically perturbed copy.
  *
  * The perturbation (drop 1% of keys → S1_ONLY; re-keyed %97 rows →
  * S2_ONLY; price bump on %7 and priority rewrite on %13 → DIFF) is
  * mirrored exactly by the `S2_SQL` CTE so DuckDB can act as oracle.
  * Oracled outputs avoid raw double-to-string values (cross-engine
  * float formatting); the diff VALUES themselves are covered by the
  * ScalaTest golden suite instead.
  */
object DiffQueries {

  /** Deterministic perturbation of orders — Spark side. */
  def perturbedOrders(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    orders.filter(k % 100 =!= 0)
      .withColumn("o_totalprice",
        when(k % 7 === 0, col("o_totalprice") + 1.0d)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(k % 13 === 0, lit("X-URGENT")).otherwise(col("o_orderpriority")))
      .unionByName(
        orders.filter(k % 97 === 0)
          .withColumn("o_orderkey", k + 100000000L))
  }

  /** Same perturbation — DuckDB side (ANSI SQL CTE body). */
  val S2_SQL: String =
    """s2 AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'X-URGENT' ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 100 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 = 0
      |)""".stripMargin

  private def diffed(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    DataColDiff.diffPlan(orders, perturbedOrders(orders), Seq("o_orderkey"))
      .fold(mm => throw new IllegalArgumentException(mm.message), identity)
  }

  /** Flag-class counts of the diff. */
  def diffFlags(spark: SparkSession, dir: String): DataFrame =
    DataColDiff.flagCountsPlan(diffed(spark, dir))
      .select(col(DataColDiff.Flag).as("flag"), col("cnt"))
      .orderBy("flag")

  val diffFlagsSql: String =
    s"""WITH $S2_SQL
       |SELECT CASE WHEN s.o_orderkey IS NULL THEN 'S1_ONLY'
       |            WHEN o.o_orderkey IS NULL THEN 'S2_ONLY'
       |            WHEN (o.o_custkey IS DISTINCT FROM s.o_custkey)
       |              OR (o.o_orderstatus IS DISTINCT FROM s.o_orderstatus)
       |              OR (o.o_totalprice IS DISTINCT FROM s.o_totalprice)
       |              OR (o.o_orderdate IS DISTINCT FROM s.o_orderdate)
       |              OR (o.o_orderpriority IS DISTINCT FROM s.o_orderpriority)
       |            THEN '' ELSE 'NODIFF' END AS flag,
       |       count(*) AS cnt
       |FROM orders o FULL OUTER JOIN s2 s ON o.o_orderkey = s.o_orderkey
       |GROUP BY flag ORDER BY flag""".stripMargin

  /** Per-column mismatch counts (descending) of the diff. */
  def diffColstats(spark: SparkSession, dir: String): DataFrame =
    DataColDiff.statsPlan(diffed(spark, dir))

  val diffColstatsSql: String =
    s"""WITH $S2_SQL,
       |m AS (
       |  SELECT 'o_custkey' AS col_name FROM orders o JOIN s2 s USING (o_orderkey)
       |    WHERE o.o_custkey IS DISTINCT FROM s.o_custkey
       |  UNION ALL
       |  SELECT 'o_orderstatus' FROM orders o JOIN s2 s USING (o_orderkey)
       |    WHERE o.o_orderstatus IS DISTINCT FROM s.o_orderstatus
       |  UNION ALL
       |  SELECT 'o_totalprice' FROM orders o JOIN s2 s USING (o_orderkey)
       |    WHERE o.o_totalprice IS DISTINCT FROM s.o_totalprice
       |  UNION ALL
       |  SELECT 'o_orderdate' FROM orders o JOIN s2 s USING (o_orderkey)
       |    WHERE o.o_orderdate IS DISTINCT FROM s.o_orderdate
       |  UNION ALL
       |  SELECT 'o_orderpriority' FROM orders o JOIN s2 s USING (o_orderkey)
       |    WHERE o.o_orderpriority IS DISTINCT FROM s.o_orderpriority
       |)
       |SELECT col_name, count(*) AS mismatch_cnt
       |FROM m GROUP BY col_name ORDER BY mismatch_cnt DESC, col_name""".stripMargin

  /** Matched-but-different rows with the comma-joined list of differing
    * columns (schema order — same order CompColArr is built in).
    */
  def diffRows(spark: SparkSession, dir: String): DataFrame =
    diffed(spark, dir)
      .filter(col(DataColDiff.Flag) === "")
      .select(
        col("o_orderkey_s1").as("k"),
        array_join(col(s"${DataColDiff.CompColArr}.col_name"), ",").as("diff_cols"))
      .orderBy("k")

  val diffRowsSql: String =
    s"""WITH $S2_SQL
       |SELECT o.o_orderkey AS k,
       |  concat_ws(',',
       |    CASE WHEN o.o_custkey      IS DISTINCT FROM s.o_custkey      THEN 'o_custkey' END,
       |    CASE WHEN o.o_orderstatus  IS DISTINCT FROM s.o_orderstatus  THEN 'o_orderstatus' END,
       |    CASE WHEN o.o_totalprice   IS DISTINCT FROM s.o_totalprice   THEN 'o_totalprice' END,
       |    CASE WHEN o.o_orderdate    IS DISTINCT FROM s.o_orderdate    THEN 'o_orderdate' END,
       |    CASE WHEN o.o_orderpriority IS DISTINCT FROM s.o_orderpriority THEN 'o_orderpriority' END
       |  ) AS diff_cols
       |FROM orders o JOIN s2 s USING (o_orderkey)
       |WHERE (o.o_custkey IS DISTINCT FROM s.o_custkey)
       |   OR (o.o_orderstatus IS DISTINCT FROM s.o_orderstatus)
       |   OR (o.o_totalprice IS DISTINCT FROM s.o_totalprice)
       |   OR (o.o_orderdate IS DISTINCT FROM s.o_orderdate)
       |   OR (o.o_orderpriority IS DISTINCT FROM s.o_orderpriority)
       |ORDER BY k""".stripMargin

  /** The captured s1_value/s2_value payload itself, for the one perturbed
    * column whose string rendering is bit-stable across engines
    * (`o_orderpriority`; doubles are excluded — their to-string differs
    * between Spark and DuckDB). Closes the oracle-coverage gap where
    * diff_rows only verified the differing column NAMES.
    */
  def diffValues(spark: SparkSession, dir: String): DataFrame =
    diffed(spark, dir)
      .filter(col(DataColDiff.Flag) === "")
      .select(col("o_orderkey_s1").as("k"),
        explode(col(DataColDiff.CompColArr)).as("e"))
      .filter(col("e.col_name") === "o_orderpriority")
      .select(col("k"), col("e.col_name").as("col_name"),
        col("e.s1_value").as("s1_value"), col("e.s2_value").as("s2_value"))
      .orderBy("k")

  val diffValuesSql: String =
    s"""WITH $S2_SQL
       |SELECT o.o_orderkey AS k, 'o_orderpriority' AS col_name,
       |       o.o_orderpriority AS s1_value, s.o_orderpriority AS s2_value
       |FROM orders o JOIN s2 s USING (o_orderkey)
       |WHERE o.o_orderpriority IS DISTINCT FROM s.o_orderpriority
       |ORDER BY k""".stripMargin

  /** Flag counts through the skew-resilient (inner ∪ anti ∪ anti)
    * plan — same oracle SQL as diff_flags: the decomposition's claim IS
    * result-identity with the full-outer, so the hash-match gate proves
    * it against DuckDB's full-outer every round.
    */
  def diffFlagsSkew(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val diff = DataColDiff.diffPlan(orders, perturbedOrders(orders),
        Seq("o_orderkey"), skewResilient = true)
      .fold(mm => throw new IllegalArgumentException(mm.message), identity)
    DataColDiff.flagCountsPlan(diff)
      .select(col(DataColDiff.Flag).as("flag"), col("cnt"))
      .orderBy("flag")
  }

  /** SCD2 snapshot apply ([[graft.operators.Scd2]]): orders as the
    * initial open history (valid_from = 0), the perturbed copy as the
    * day-1 snapshot (batchTs = 86400). The perturbation exercises every
    * SCD2 outcome: %100 keys deleted (close), %7 / %13 changed
    * (close + insert), %97 re-keyed rows inserted, the rest unchanged
    * (pass through open). Change detection runs over ALL attrs
    * (including the double price and the timestamp date — exact
    * comparisons are engine-portable); the gated OUTPUT omits the
    * double (its to-string isn't, see diff_values note). (key,
    * valid_from) is unique, so the ORDER BY is total and the row order
    * hashes deterministically.
    */
  def scd2Apply(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val history = graft.operators.Scd2.initHistory(orders, asOf = 0L)
    graft.operators.Scd2
      .apply(history, perturbedOrders(orders), Seq("o_orderkey"),
        batchTs = 86400L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("valid_from"), col("valid_to"))
      .orderBy("o_orderkey", "valid_from")
  }

  val scd2ApplySql: String =
    s"""WITH $S2_SQL,
       |j AS (
       |  SELECT c.o_orderkey AS c_key, c.o_custkey AS c_custkey,
       |         c.o_orderstatus AS c_status, c.o_orderpriority AS c_prio,
       |         s.o_orderkey AS s_key, s.o_custkey AS s_custkey,
       |         s.o_orderstatus AS s_status, s.o_orderpriority AS s_prio,
       |         (c.o_orderkey IS NOT NULL) AS cp,
       |         (s.o_orderkey IS NOT NULL) AS sp,
       |         (c.o_custkey IS NOT DISTINCT FROM s.o_custkey
       |          AND c.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
       |          AND c.o_totalprice IS NOT DISTINCT FROM s.o_totalprice
       |          AND c.o_orderdate IS NOT DISTINCT FROM s.o_orderdate
       |          AND c.o_orderpriority IS NOT DISTINCT FROM s.o_orderpriority)
       |           AS same
       |  FROM orders c FULL OUTER JOIN s2 s ON c.o_orderkey = s.o_orderkey)
       |SELECT c_key AS o_orderkey, c_custkey AS o_custkey,
       |       c_status AS o_orderstatus, c_prio AS o_orderpriority,
       |       CAST(0 AS BIGINT) AS valid_from,
       |       CASE WHEN sp AND same THEN CAST(NULL AS BIGINT)
       |            ELSE CAST(86400 AS BIGINT) END AS valid_to
       |FROM j WHERE cp
       |UNION ALL
       |SELECT s_key, s_custkey, s_status, s_prio,
       |       CAST(86400 AS BIGINT), CAST(NULL AS BIGINT)
       |FROM j WHERE sp AND (NOT cp OR NOT same)
       |ORDER BY o_orderkey, valid_from""".stripMargin

  /** Time travel ([[graft.operators.Scd2.asOf]]): read the history
    * back as of instant 0 — BEFORE the day-1 apply — and recover the
    * original snapshot exactly. The oracle is simply `SELECT ... FROM
    * orders`: the gate is the identity "an apply never destroys the
    * past". Gate-only (no bench slot): the runtime is scd2_apply's,
    * which is benched.
    */
  def scd2Asof(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val history = graft.operators.Scd2.initHistory(orders, asOf = 0L)
    val applied = graft.operators.Scd2
      .apply(history, perturbedOrders(orders), Seq("o_orderkey"),
        batchTs = 86400L)
    graft.operators.Scd2.asOf(applied, ts = 0L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  val scd2AsofSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** The SAME day-1 state reached through a CDC change feed instead of
    * a full snapshot ([[graft.operators.Scd2.applyDelta]]): upserts for
    * the %7/%13 changes, inserts for the %97 re-keys, tombstones for
    * the %100 deletes. The oracle is scd2_apply's SQL VERBATIM — the
    * gate IS the claim that delta apply ≡ snapshot apply when the feed
    * encodes the same changes (the skew-diff / bloom-decontam identity
    * pattern). Tombstones carry the last row image (ignored by the
    * operator — realistic CDC shape, and it keeps attr types aligned).
    */
  def scd2Cdc(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val k = col("o_orderkey")
    val upserts = orders.filter(k % 100 =!= 0)
      .filter(k % 7 === 0 || k % 13 === 0)
      .withColumn("o_totalprice",
        when(k % 7 === 0, col("o_totalprice") + 1.0d)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(k % 13 === 0, lit("X-URGENT")).otherwise(col("o_orderpriority")))
    val inserts = orders.filter(k % 97 === 0)
      .withColumn("o_orderkey", k + 100000000L)
    val tombstones = orders.filter(k % 100 === 0)
    val delta = upserts.withColumn("is_delete", lit(false))
      .unionByName(inserts.withColumn("is_delete", lit(false)))
      .unionByName(tombstones.withColumn("is_delete", lit(true)))
    graft.operators.Scd2
      .applyDelta(graft.operators.Scd2.initHistory(orders, asOf = 0L),
        delta, Seq("o_orderkey"), batchTs = 86400L, Some("is_delete"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("valid_from"), col("valid_to"))
      .orderBy("o_orderkey", "valid_from")
  }

  /** Profile-level drift ([[graft.operators.ProfileDiff]]) between
    * orders and the perturbed snapshot — the cheap screen a warehouse
    * runs before the row diff. The perturbation drifts every column:
    * %100 drop moves all row counts, the %97 re-keys add high keys
    * (o_orderkey max moves), %7 price bumps and %13 priority rewrites
    * move distincts/ranges — so the interesting assertions are the
    * exact stat values, which the oracle recomputes from scratch via
    * its own melt.
    */
  def profileDiff(spark: SparkSession, dir: String): DataFrame = {
    // plain load, not loadSpread: the round-14 ProfileDiff ships
    // fixed-width hashes through its only shuffle, so the round-robin
    // spread's extra full-table exchange costs more than the melt CPU
    // it parallelizes (measured at sf0.1; at scale file splits provide
    // the parallelism anyway)
    val orders = Tables.load(spark, dir, "orders")
    graft.operators.ProfileDiff.compare(orders, perturbedOrders(orders))
      .orderBy("col_name")
  }

  val profileDiffSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    def melt(rel: String) = cols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM $rel")
      .mkString("\n  UNION ALL ")
    def prof(m: String) =
      s"""SELECT col_name, count(*) AS n_rows,
         |    count(*) - count(value) AS n_null,
         |    count(DISTINCT value) AS n_distinct,
         |    min(value) AS min_val, max(value) AS max_val
         |  FROM $m GROUP BY col_name""".stripMargin
    s"""WITH $S2_SQL,
       |m1 AS (
       |  ${melt("orders")}),
       |m2 AS (
       |  ${melt("s2")}),
       |p1 AS (
       |  ${prof("m1")}),
       |p2 AS (
       |  ${prof("m2")})
       |SELECT coalesce(p1.col_name, p2.col_name) AS col_name,
       |  CASE WHEN p1.col_name IS NULL THEN 'ADDED'
       |       WHEN p2.col_name IS NULL THEN 'REMOVED'
       |       WHEN p1.n_rows IS DISTINCT FROM p2.n_rows
       |         OR p1.n_null IS DISTINCT FROM p2.n_null
       |         OR p1.n_distinct IS DISTINCT FROM p2.n_distinct
       |         OR p1.min_val IS DISTINCT FROM p2.min_val
       |         OR p1.max_val IS DISTINCT FROM p2.max_val THEN 'DRIFT'
       |       ELSE 'NODIFF' END AS flag,
       |  p1.n_rows AS n_rows_1, p2.n_rows AS n_rows_2,
       |  p1.n_null AS n_null_1, p2.n_null AS n_null_2,
       |  p1.n_distinct AS n_distinct_1, p2.n_distinct AS n_distinct_2,
       |  CASE WHEN p1.col_name IS NOT NULL AND p2.col_name IS NOT NULL
       |       THEN (p1.min_val IS DISTINCT FROM p2.min_val
       |          OR p1.max_val IS DISTINCT FROM p2.max_val) END
       |    AS range_changed
       |FROM p1 FULL OUTER JOIN p2 ON p1.col_name = p2.col_name
       |ORDER BY col_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "diff_flags" -> (diffFlags(_, _)),
    "profile_diff" -> (profileDiff(_, _)),
    "diff_flags_skew" -> (diffFlagsSkew(_, _)),
    "diff_colstats" -> (diffColstats(_, _)),
    "diff_rows" -> (diffRows(_, _)),
    "diff_values" -> (diffValues(_, _)),
    "scd2_apply" -> (scd2Apply(_, _)),
    "scd2_cdc" -> (scd2Cdc(_, _)),
    "scd2_asof" -> (scd2Asof(_, _)))

  val oracleSql: Map[String, String] = Map(
    "diff_flags" -> diffFlagsSql,
    "profile_diff" -> profileDiffSql,
    "diff_flags_skew" -> diffFlagsSql,
    "diff_colstats" -> diffColstatsSql,
    "diff_rows" -> diffRowsSql,
    "diff_values" -> diffValuesSql,
    "scd2_apply" -> scd2ApplySql,
    "scd2_cdc" -> scd2ApplySql,
    "scd2_asof" -> scd2AsofSql)
}
