package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law first-significant-digit audit of a positive numeric
  * column — the forensic-accounting screen (Nigrini's digit analysis)
  * applied to pipeline governance: organically-generated amounts
  * follow P(d) = log10(1 + 1/d); fabricated, defaulted, or
  * unit-mangled feeds drift toward uniform or spike a single digit,
  * and the per-digit deviation table says WHICH digit broke.
  *
  * Exactness: the value is fixed-pointed to integer cents BEFORE any
  * string rendering (double formatting is engine-specific; integer
  * rendering is not), the first digit read off the decimal string of
  * that integer; expected rates are COMPILE-TIME constants (the
  * log10 table is baked into both the plan and the generated oracle
  * SQL from the same Scala values — no runtime libm anywhere); the
  * χ²-style deviation `(obs − exp)² div exp` is integer arithmetic in
  * ppm space.
  *
  * Shape: ONE map-side-combined 9-group count; everything after runs
  * on the 9-row digit spine (materialized from a range literal so
  * absent digits still audit as 0-observed).
  */
object Benford {

  /** floor(log10(1 + 1/d) · 1e6) for d = 1..9 — precomputed so both
    * engines consume identical integers.
    */
  val ExpectedPpm: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** @return 9 rows: (digit, n, obs_ppm, exp_ppm, dev_q) with
    *         dev_q = (obs_ppm − exp_ppm)² div exp_ppm; rows with
    *         `valueCol` ≤ 0 or null are excluded from the census
    */
  def firstDigitAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      // sub-cent values have no significant cent digit — excluded from
      // the census rather than polluting the total as a phantom "0"
      .filter(expr(s"floor($valueCol * 100) >= 1"))
      .select(expr(
        s"cast(substring(cast(cast(floor($valueCol * 100) as bigint) " +
          "as string), 1, 1) as bigint)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = spark.range(1, 10).select(col("id").as("digit"))
    val total = counts.agg(sum(col("n")).as("t"))
    val expCase = (1 to 9)
      .map(d => s"WHEN $d THEN ${ExpectedPpm(d - 1)}L")
      .mkString("CASE digit ", " ", " END")
    spine
      .join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(1000000 * n) div t").as("obs_ppm"),
        expr(expCase).as("exp_ppm"))
      .withColumn("dev_q",
        expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) div exp_ppm"))
  }
}
