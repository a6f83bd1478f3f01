package graft.operators

import org.apache.spark.sql.DataFrame
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
  * map-side-combined aggregates per side — shuffle volume
  * O(distinct values), no join of the raw tables at all — and its
  * verdict ("only o_totalprice drifted, row counts moved 1%") decides
  * whether the expensive join is worth running and which columns it
  * can be pruned to. The final comparison joins two N-column summary
  * frames: broadcast territory regardless of table size.
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
    */
  def compare(s1: DataFrame, s2: DataFrame,
      cols1: Seq[String] = Nil, cols2: Seq[String] = Nil): DataFrame = {
    val p1 = ColumnProfile.profile(s1, cols1)
    val p2 = ColumnProfile.profile(s2, cols2)
    val stats = Seq("n_rows", "n_null", "n_distinct")
    val a = p1.select(col("col_name") +:
      (stats.map(s => col(s).as(s"${s}_1")) :+ struct(col("min_val"),
        col("max_val")).as("range_1")): _*)
    val b = p2.select(col("col_name") +:
      (stats.map(s => col(s).as(s"${s}_2")) :+ struct(col("min_val"),
        col("max_val")).as("range_2")): _*)
    val joined = a.join(b, Seq("col_name"), "full_outer")
    val in1 = col("n_rows_1").isNotNull
    val in2 = col("n_rows_2").isNotNull
    val statDrift = stats.map(s => !(col(s"${s}_1") <=> col(s"${s}_2")))
      .reduce(_ || _)
    val rangeChanged = !(col("range_1") <=> col("range_2"))
    joined.select(
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
