package graft.operators

import graft.text.TextFeatures.hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training order — the step between curation and
  * packing: every surviving document gets a contiguous position
  * `pos ∈ [0, N)` in the order the trainer will consume it, namely
  * curriculum stage ascending, then a seeded shuffle within each stage
  * (md5-keyed, so re-runs, retries, and the oracle all reproduce the
  * identical permutation — `rand()` would give a different corpus
  * order per attempt, which destroys resumability of a training run).
  *
  * The scale hazard is the same one [[graft.text.SeqPack]] documents:
  * `row_number() OVER (ORDER BY stage, h)` is a single unpartitioned
  * window — all N rows through one reducer. Positions are instead
  * assigned by the standard two-level scan:
  *
  *   1. rows are bucketed by (stage, sub) where `sub` is the top bits
  *      of the shuffle hash — monotone in the global (stage, h) order,
  *      so bucket-local ranks + a per-bucket base offset compose into
  *      the exact global rank;
  *   2. the only unpartitioned window runs over the one-row-per-bucket
  *      count frame (nStages × nSub rows — thousands, not billions),
  *      which then broadcasts back onto the corpus.
  *
  * The corpus itself crosses exactly ONE hash exchange (the
  * (stage, sub) window partitioning); the broadcast join adds none.
  * Within a bucket the rank orders by (h, id) — id breaks the rare
  * 32-bit hash-prefix ties deterministically.
  */
object CorpusOrder {

  /** (idCol, stage, pos): `pos` equals
    * `row_number() OVER (ORDER BY stage, hash, id) - 1` — verified
    * against exactly that formulation by the oracle — computed without
    * any global sort. `stageCol` is the caller's curriculum signal
    * (small int: quality band, length band, source tier). `nSub`
    * must be a power of two dividing 2^32: sub-bucket = top bits of
    * the 32-bit shuffle hash, so sub boundaries are exact.
    */
  def orderPlan(df: DataFrame, idCol: String, stageCol: Column,
      salt: String = "order", nSub: Int = 1024): DataFrame = {
    require(nSub > 0 && (nSub & (nSub - 1)) == 0 && nSub <= (1 << 30),
      s"nSub must be a power of two in [1, 2^30], got $nSub")
    val subWidth = 4294967296L / nSub

    val keyed = df.select(
        col(idCol),
        stageCol.cast("int").as("stage"),
        hash32(concat(lit(s"$salt:"), col(idCol).cast("string"))).as("h"))
      .withColumn("sub", expr(s"h DIV $subWidth"))

    // tiny frame: one row per (stage, sub); the single-partition window
    // scans only this — BY DESIGN (see SeqPack.packPlan). The constant
    // partition key must ride a NULLABLE column to stay non-foldable
    // (`sub` inherits id's nullability; `stage * 0` over a CASE with a
    // literal ELSE is non-nullable and Catalyst folds it away, dropping
    // the window to an explicit SinglePartition — same execution, but
    // with the per-run WindowExec warning).
    val byBucket = Window.partitionBy(col("sub") * lit(0L))
      .orderBy(col("stage"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBase = keyed.groupBy(col("stage"), col("sub"))
      .agg(count(lit(1)).as("n"))
      .select(col("stage"), col("sub"),
        coalesce(sum(col("n")).over(byBucket), lit(0L)).as("bucket_off"))

    // distributed: bucket-local rank; one (stage, sub) exchange.
    val inBucket = Window.partitionBy(col("stage"), col("sub"))
      .orderBy(col("h"), col(idCol))
    keyed
      .withColumn("rn", row_number().over(inBucket).cast("bigint") - 1L)
      .join(broadcast(bucketBase), Seq("stage", "sub"))
      .select(col(idCol), col("stage"),
        (col("bucket_off") + col("rn")).as("pos"))
  }
}
