package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-key skew pre-flight — the read taken BEFORE keying a
  * 100 TB join or aggregate on a column: if one key holds a large
  * share of the rows, the task that receives it becomes the straggler
  * that dominates the stage (the motivation for the salting /
  * AQE-skew-join hatches elsewhere in this library). Reported as the
  * top-key share and the Herfindahl–Hirschman concentration index
  * (Σ share², the standard market-concentration statistic — ≈ 0 for a
  * uniform key, 10^6 ppm for a single-key column), both integer ppm.
  *
  * Shape: ONE map-side-combined key census (shuffle bounded by
  * distinct keys — the same cost any plan keyed on this column would
  * pay anyway), then a single-row global fold. Σ cnt² accumulates in
  * DECIMAL(38,0) (a long overflows once Σ cnt² > 2^63, i.e. a hot key
  * beyond ~3·10^9 rows); ratios leave as integer `div` fixed points
  * with the denominator likewise widened to decimal.
  */
object KeySkew {

  /** One-row profile: (n, n_keys, max_cnt, top1_ppm, hhi_ppm).
    * Null keys count as a key of their own (a null-heavy join column
    * is exactly the hotspot this audit exists to catch).
    */
  def profile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(
        sum("cnt").as("n"),
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_cnt"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("s2"))
      .select(col("n"), col("n_keys"), col("max_cnt"),
        expr("(CAST(max_cnt AS DECIMAL(38,0)) * 1000000) div n")
          .cast("bigint").as("top1_ppm"),
        expr("(s2 * 1000000) div (CAST(n AS DECIMAL(38,0)) * n)")
          .cast("bigint").as("hhi_ppm"))
}
