package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit — the standard re-identification risk gate for a
  * release table (Sweeney, IJUFKS 2002): every combination of
  * quasi-identifier values held by fewer than `k` rows singles its
  * members out. The privacy companion to the PII scrubber: PiiScrub
  * removes direct identifiers, this measures what the REMAINING
  * attributes still leak in combination.
  *
  * Shape for scale: ONE map-side-combined aggregate on the
  * quasi-identifier tuple (the shuffle carries distinct combinations,
  * not rows), then a broadcast 1-row totals frame for the headline
  * ratios. The table itself never joins anything.
  *
  * Output: one row per UNDER-k combination (the actionable worklist,
  * bounded by k · #violating-combos — tiny relative to the table)
  * with its group size, ordered smallest (riskiest) first.
  */
object KAnonymity {

  /** (quasi cols..., n) for every combination with fewer than `k`
    * rows; `n = 1` rows are unique — fully re-identifiable.
    */
  def violations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** One-row headline: (n_rows, n_groups, n_violating_groups,
    * n_exposed_rows, min_group) — min_group is the table's actual
    * k-anonymity level (the size of its smallest group).
    */
  def summary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_exposed_rows"),
        min(col("n")).as("min_group"))
  }
}
