package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decile lift / calibration table for a binary scorer: rank the
  * corpus by score descending, cut into `nBuckets` exact-size ranks,
  * and report per-bucket and cumulative positive rates against the
  * base rate — the standard "is the quality classifier actually
  * concentrating the good documents at the top" audit read before
  * trusting a score threshold to gate a 100 TB corpus.
  *
  * Ranking rides [[GroupedNtile.bucketPlan]] over a constant stratum:
  * the global (score DESC, id) rank comes from the two-level
  * range-exchange scan — NO single-reducer `ntile()` window over the
  * corpus — and bucket arithmetic is `(rank · n) div N`, pure
  * integers. Everything after the bucket aggregate runs on an
  * `nBuckets`-row summary frame, where the cumulative window is
  * bounded by construction.
  *
  * Fixed-point outputs (ppm, integer div — engine-exact):
  * `rate_ppm` the bucket's positive rate; `cum_rate_ppm` the rate of
  * the top buckets so far; `cum_lift_ppm` that rate over the base
  * rate (1e6 = no lift). A well-ordered scorer shows monotone-ish
  * decreasing `rate_ppm` and `cum_lift_ppm` → 1e6 at the last bucket.
  *
  * Reference scope note: the reference engine has no model-evaluation
  * surface — extension operator (classifier-audit face of the
  * [[graft.text.NbQuality]] / [[graft.text.Dsir]] family).
  */
object LiftCurve {

  /** @param scored one row per item: idCol, scoreCol (integral
    *               quantized score), labelCol (0/1 ground truth)
    * @return nBuckets rows: (bucket, n, n_pos, rate_ppm, cum_n,
    *         cum_pos, cum_rate_ppm, cum_lift_ppm), bucket 0 = top
    *         scores
    */
  def deciles(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, nBuckets: Int = 10): DataFrame = {
    val ranked = GroupedNtile.bucketPlan(
      scored.withColumn("_stratum", lit(0)),
      "_stratum", Seq((col(scoreCol) * lit(-1L)).as("_neg")), idCol,
      nBuckets)
    val per = ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
    // nBuckets-row summary frame: the windows are bounded, not
    // corpus-scale
    val cum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .withColumn("_tn", sum(col("n")).over(all))
      .withColumn("_tp", sum(col("n_pos")).over(all))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("(1000000 * n_pos) div n").as("rate_ppm"),
        col("cum_n"), col("cum_pos"),
        expr("(1000000 * cum_pos) div cum_n").as("cum_rate_ppm"),
        // cum_pos·_tn is a product of two row counts: DECIMAL(38,0)
        // like KeySkew/BlockingEval (a long wraps past ~3e9 rows once
        // the 1e6 ppm scale is applied); `div` lands back on BIGINT
        expr("""(1000000 * CAST(cum_pos AS DECIMAL(38,0)) * _tn)
               div (CAST(cum_n AS DECIMAL(38,0)) * _tp)""")
          .as("cum_lift_ppm"))
      .orderBy("bucket")
  }
}
