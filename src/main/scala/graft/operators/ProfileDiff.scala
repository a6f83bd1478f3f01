package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Profile-level drift detection between two snapshots of a table —
  * the cheap pre-check a warehouse runs BEFORE paying the row-level
  * diff ([[graft.diff.DataColDiff]], reference
  * find_datacol_diff.py:21-33): compare the per-column
  * [[ColumnProfile]] summaries (row/null/distinct counts,
  * lexicographic min/max) and flag which columns drifted.
  *
  * Why this matters at 100 TB: the row diff's full-outer join shuffles
  * BOTH snapshots end to end. The profile is one melt + two
  * map-side-combined aggregates — shuffle volume O(distinct values),
  * no join of the raw tables at all — and its verdict ("only
  * o_totalprice drifted, row counts moved 1%") decides whether the
  * expensive join is worth running and which columns it can be pruned
  * to.
  *
  * Both snapshots profile through ONE aggregation pipeline: the two
  * melted streams union with a side tag and aggregate together, so a
  * (col, value) pair present in both snapshots occupies ONE row of the
  * first-level shuffle instead of two (for near-identical snapshots —
  * the expected case — that halves the shuffle), and the final
  * per-column comparison is conditional aggregation over the merged
  * rows, not a join of two summary frames at all. Measured ~1.9×
  * end-to-end vs the two-profile-then-full-outer-join formulation at
  * sf0.1 (SURVEY §9).
  *
  * Column sets may differ between snapshots (schema evolution): a
  * column present on one side only surfaces with null stats on the
  * other and flag ADDED / REMOVED, mirroring the row diff's
  * S1_ONLY / S2_ONLY classes.
  */
object ProfileDiff {

  /** One row per column name seen in either snapshot:
    * (col_name, flag, n_rows_1, n_rows_2, n_null_1, n_null_2,
    * n_distinct_1, n_distinct_2, range_changed) where flag ∈
    * ADDED | REMOVED | DRIFT | NODIFF and `range_changed` says the
    * lexicographic min or max moved (null for one-sided columns).
    *
    * DRIFT means any counted stat or the min/max changed. Row-count
    * drift alone (same nulls/distincts/range) still flags: a column
    * whose profile is identical under 1% more rows did lose relative
    * null rate — callers wanting rate-based tolerance divide the
    * returned counts themselves.
    *
    * A column of an EMPTY snapshot (zero rows) contributes no melted
    * rows, so it reads as absent on that side (ADDED / REMOVED) —
    * identical to profiling the empty frame separately, where the
    * aggregate produces no row for any column.
    */
  def compare(s1: DataFrame, s2: DataFrame,
      cols1: Seq[String] = Nil, cols2: Seq[String] = Nil): DataFrame = {
    // pure-DSL melt (no string-spliced SQL — column names with quotes /
    // backticks stay data, not syntax); the generator stays inline
    def melted(df: DataFrame, cols: Seq[String], side: Int): DataFrame = {
      val cs = if (cols.nonEmpty) cols else df.columns.toSeq
      require(cs.nonEmpty, "profile of zero columns")
      df.select(explode(array(cs.map(c => struct(
            lit(c).as("col_name"),
            col(s"`${c.replace("`", "``")}`").cast("string").as("value"))): _*))
          .as("p"))
        .select(col("p.col_name").as("col_name"), col("p.value").as("value"),
          lit(side).as("side"))
    }
    // first level: one row per (col, value) with per-side occurrence
    // counts — the side tag is folded into the aggregates, NOT the key,
    // so shared values merge before the shuffle
    val counted = melted(s1, cols1, 1).unionByName(melted(s2, cols2, 2))
      .groupBy(col("col_name"), col("value"))
      .agg(sum(when(col("side") === 1, 1L)).as("c1"),
        sum(when(col("side") === 2, 1L)).as("c2"))
    // second level: per-column stats for each side via conditional
    // aggregation (sum/count/min over the side's rows only); a side
    // with no rows for the column yields null n_rows_X — the
    // ADDED/REMOVED signal
    def stats(c: Column): Seq[Column] = {
      val in = c.isNotNull
      Seq(
        sum(c).cast("bigint"),
        when(max(in), coalesce(sum(when(col("value").isNull, c)), lit(0L)))
          .cast("bigint"),
        when(max(in), count(when(in, col("value")))),
        min(when(in, col("value"))),
        max(when(in, col("value"))))
    }
    val named = (stats(col("c1")) zip
        Seq("n_rows_1", "n_null_1", "n_distinct_1", "min_1", "max_1")) ++
      (stats(col("c2")) zip
        Seq("n_rows_2", "n_null_2", "n_distinct_2", "min_2", "max_2"))
    val aggs = named.map { case (e, n) => e.as(n) }
    val prof = counted.groupBy(col("col_name")).agg(aggs.head, aggs.tail: _*)
    val in1 = col("n_rows_1").isNotNull
    val in2 = col("n_rows_2").isNotNull
    val statDrift = Seq("n_rows", "n_null", "n_distinct")
      .map(s => !(col(s"${s}_1") <=> col(s"${s}_2"))).reduce(_ || _)
    val rangeChanged =
      !(struct(col("min_1"), col("max_1")) <=>
        struct(col("min_2"), col("max_2")))
    prof.select(
      col("col_name"),
      when(!in1, lit("ADDED")).when(!in2, lit("REMOVED"))
        .when(statDrift || rangeChanged, lit("DRIFT"))
        .otherwise(lit("NODIFF")).as("flag"),
      col("n_rows_1"), col("n_rows_2"),
      col("n_null_1"), col("n_null_2"),
      col("n_distinct_1"), col("n_distinct_2"),
      when(in1 && in2, rangeChanged).as("range_changed"))
  }

  /** The screen→diff handoff: columns a row-level diff should compare,
    * from a [[compare]] result — DRIFT columns only (ADDED/REMOVED
    * can't be row-compared; NODIFF columns are provably identical in
    * profile and pruning them is the screen's whole payoff). The
    * collect is one row per column name — driver-side by design.
    */
  def driftedColumns(comparison: DataFrame): Seq[String] =
    comparison.filter(col("flag") === "DRIFT")
      .select("col_name").collect().map(_.getString(0)).toSeq.sorted
}
