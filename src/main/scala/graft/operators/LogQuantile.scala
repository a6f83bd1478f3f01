package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed quantile sketch (HDR-histogram style) — the
  * one-pass, bounded-state alternative to exact percentiles: exact
  * ranks ([[EquiDepth]], `q_percentiles`) shuffle and rank the full
  * value column; this sketch reduces the data to (group, bucket)
  * counts in ONE map-side-combined shuffle, after which quantile
  * extraction windows a ≤ few-hundred-row bucket frame. Bucket counts
  * are plain sums, so sketches merge by addition across partitions,
  * batches, or days — the same additive-state contract as
  * [[AggMerge]] — and the answer is deterministic for a given input
  * (no sampling), hence oracle-gatable.
  *
  * Bucketing (scale s, sub-bucket bits b = 4): values quantize to
  * integers iv = round(v·s) ≥ 1, then
  *
  *   shift  = max(0, bitlen(iv) − 1 − b)
  *   bucket = shift·2^b + (iv >> shift)
  *
  * Monotone in iv; buckets below 2^(b+1) hold ONE integer each (small
  * values exact); above, bucket width / lower edge ≤ 2^−b, so a
  * reported quantile q satisfies q ≤ true ≤ q·(1 + 2^−b). Everything
  * is integer bit arithmetic (bitlen via the bin()-string trick, like
  * [[HllSketch]]) — a SQL oracle reproduces every bucket id and edge
  * exactly.
  *
  * Ranks are integers too: percentile num/den picks rank
  * ⌈num·n/den⌉ = (num·n + den − 1) div den — no double product whose
  * ulp could flip a ceil() across engines.
  */
object LogQuantile {

  val SubBits = 4

  /** Bucket id of positive integer column `ivCol` — SQL fragment
    * shared verbatim with the oracle (see [[bucketSql]]).
    */
  def bucketSql(ivCol: String): String =
    s"(greatest(0, length(bin($ivCol)) - 1 - $SubBits) * ${1 << SubBits}" +
      s" + ($ivCol >> greatest(0, length(bin($ivCol)) - 1 - $SubBits)))"

  /** Lower edge (scaled integer units) of bucket id column `bCol`. */
  def lowerEdgeSql(bCol: String): String =
    s"(CASE WHEN $bCol < ${2 << SubBits} THEN $bCol" +
      s" ELSE (($bCol & ${(1 << SubBits) - 1}) + ${1 << SubBits})" +
      s" << (($bCol >> $SubBits) - 1) END)"

  /** The sketch: (grp, bucket, cnt) — merge two sketches by summing
    * cnt per (grp, bucket). `scale` is the decimal quantization
    * (100 = cents); values must be positive.
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
      scale: Int = 100): DataFrame =
    df.select(col(groupCol).as("grp"),
        round(col(valueCol) * scale).cast("bigint").as("iv"))
      .select(col("grp"), expr(bucketSql("iv")).as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-group quantiles from the sketch: one row per (grp, p) with
    * the bucket lower edge as the estimate and the group count `n`.
    * `ps` are integer fractions (num, den, label).
    */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Int, Int, String)] = DefaultPs,
      scale: Int = 100): DataFrame =
    quantilesFromSketch(sketch(df, groupCol, valueCol, scale), ps, scale)

  val DefaultPs: Seq[(Int, Int, String)] =
    Seq((50, 100, "p50"), (95, 100, "p95"), (99, 100, "p99"))

  /** Quantiles from an already-built (grp, bucket, cnt) sketch frame
    * — the entry point for MERGED sketches (standing + delta, or a
    * streamed window's buckets): everything downstream of the raw
    * data's one shuffle operates on the tiny bucket frame.
    */
  def quantilesFromSketch(sk: DataFrame,
      ps: Seq[(Int, Int, String)] = DefaultPs,
      scale: Int = 100): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sk.withColumn("cum", sum(col("cnt")).over(w))
    val totals = sk.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val pDf = ps.toDF("num", "den", "p")
    cum
      .join(broadcast(totals), Seq("grp"))
      .crossJoin(broadcast(pDf))
      .where(col("cum") >= expr("(num * n + den - 1) div den"))
      .groupBy(col("grp"), col("p"))
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n"))
      .select(col("grp"), col("p"),
        (expr(lowerEdgeSql("bucket")).cast("double") / scale).as("q"),
        col("n"))
  }
}
