package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact equi-depth (quantile-bucket) histogram — k buckets holding
  * equal row counts (±1), each reporting its row count and value
  * range: the layout/statistics companion to the equi-width histogram
  * (`qHistogram`), and what a warehouse uses for range-partition
  * boundaries and skew diagnosis.
  *
  * The textbook formulation is `ntile(k) OVER (ORDER BY v)` — a GLOBAL
  * window, all rows through one reducer. Exact quantiles usually get
  * approximated at scale for exactly this reason. Instead the global
  * rank is assembled with the same two-level scan as
  * [[graft.text.SeqPack]] / [[CorpusOrder]]:
  *
  *   1. rows land in ≤ `nSub` RANGE sub-buckets, monotone in the sort
  *      key: `floor((v - min) / span * nSub)` off a broadcast 1-row
  *      extent aggregate — two IEEE ops in fixed order, so the bucket
  *      of every value is identical cross-engine;
  *   2. within-bucket `row_number` (distributed) + broadcast running
  *      per-bucket offsets (the only single-partition frame is the
  *      one-row-per-bucket count table) compose into the exact global
  *      rank, and `bucket = ((rank-1)·k) div n` is integer arithmetic.
  *
  * Range sub-buckets are only as balanced as the data (a pathological
  * distribution piles into few sub-buckets — the documented regime
  * switch is a first-pass equi-depth split on a SAMPLE to pick
  * boundaries); for the common mild-skew case this computes exact
  * global quantile buckets with no global sort anywhere. The oracle
  * states the flat `row_number() OVER (ORDER BY v, id)` definition,
  * so the gate is a machine-checked hierarchical ≡ flat identity.
  */
object EquiDepth {

  /** (bucket, n, lo, hi) for `k` equal-count buckets of `valueCol`
    * (nulls excluded); `idCol` breaks value ties so the global order —
    * and therefore every bucket boundary — is total and deterministic.
    *
    * Boundary-only ranking (r16): a sub-bucket occupies the global
    * rank range `[off, off+n)`, and `bucket = (rank·k) div cnt` is
    * monotone in rank — so when the bucket of its FIRST row equals the
    * bucket of its LAST row, every row in between shares it, and the
    * sub-bucket's `(count, min, max)` (already computed for the offset
    * frame) IS its whole contribution. Only sub-buckets that straddle
    * a bucket boundary (≤ k−1 of them, ~k/nSub of rows for mild skew)
    * are ranked row-by-row. The expensive full-table exchange+sort
    * feeding the rank window shrinks to the boundary slice.
    */
  def histogram(df: DataFrame, valueCol: String, idCol: String,
      k: Int = 10, nSub: Int = 256): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(nSub >= 1, s"nSub must be positive, got $nSub")
    val v = col(valueCol)
    val ext = df.filter(v.isNotNull)
      .agg(min(v).as("mn"), max(v).as("mx"), count(lit(1)).as("cnt"))

    val sub = when(col("mx") === col("mn"), lit(0L)).otherwise(
      least(floor((v - col("mn")) / (col("mx") - col("mn")) * nSub)
        .cast("bigint"), lit(nSub - 1L)))
    val keyed = df.filter(v.isNotNull).crossJoin(broadcast(ext))
      .withColumn("sub", sub)

    // tiny frame: one row per sub-bucket (see SeqPack.packPlan for the
    // non-foldable constant partition key), carrying count + extent so
    // non-boundary sub-buckets never need their rows ranked
    val bySub = Window.partitionBy(col("sub") * lit(0L)).orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = keyed.groupBy(col("sub"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"),
        first(col("cnt")).as("cnt"))
      .withColumn("off", coalesce(sum(col("n")).over(bySub), lit(0L)))
      .withColumn("bLo", expr(s"(off * $k) DIV cnt"))
      .withColumn("bHi", expr(s"((off + n - 1) * $k) DIV cnt"))

    // whole sub-buckets: first and last rank land in the same bucket,
    // so (monotonicity) every row does — aggregate rows already known
    val whole = stats.filter(col("bLo") === col("bHi"))
      .select(col("bLo").as("bucket"), col("n"), col("lo"), col("hi"))

    // boundary sub-buckets: rank row-by-row, exactly as before
    val boundary = stats.filter(col("bLo") =!= col("bHi"))
      .select(col("sub"), col("off"))
    val inSub = Window.partitionBy(col("sub")).orderBy(v, col(idCol))
    val split = keyed
      .join(broadcast(boundary), "sub")
      .withColumn("rn", row_number().over(inSub).cast("bigint"))
      .withColumn("bucket", expr(s"((off + rn - 1) * $k) DIV cnt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))

    whole.unionByName(split)
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n"), min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
  }
}
