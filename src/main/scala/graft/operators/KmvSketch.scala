package graft.operators

import graft.text.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values distinct-count sketch — cardinality estimation
  * over groups too large to count-distinct exactly in one pass at
  * 100 TB (the classic KMV/bottom-k estimator: keep the k smallest
  * hash values; if the kth smallest of a uniform [0,1) hash is u_k,
  * the population had about (k-1)/u_k distinct values).
  *
  * Unlike HyperLogLog, KMV is EXACTLY reproducible across engines:
  * the sketch is just the k smallest md5-derived integers, so the
  * DuckDB oracle recomputes the identical sketch and the identical
  * estimate — a sketch whose output can sit behind a hash-match
  * correctness gate, not only an error-bound assertion.
  *
  * Distributed shape: dedupe (group, hash) postings — a partial+final
  * aggregate, the heavy shuffle — then a per-group bottom-k window
  * over the deduped hashes. The window partitions by group, so it
  * spreads across the cluster; only k rows per group survive to the
  * final aggregate.
  */
object KmvSketch {

  /** 48-bit hash space: `hexPrefixToLong` of 12 md5 hex digits. */
  val HashBits = 48
  val HashSpace: Double = math.pow(2.0, HashBits)

  def hash48(c: Column): Column = TextFeatures.md5PrefixLong(c, 12)

  /** Per-group distinct estimate of `valueCol`: (group, n_hashes, kth_hash,
    * est_distinct). Groups with fewer than k distinct values report the
    * exact count (the sketch holds the whole population).
    *
    * The estimate is `(k-1) * 2^48 / kth` — the product is an exact
    * double (k-1 < 2^53 times a power of two, so no mantissa bits are
    * lost) followed by ONE division, bit-identical cross-engine.
    */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df
      .select(col(groupCol).as("grp"), hash48(col(valueCol)).as("h"))
      .distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    hashed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("kth_hash"))
      .select(col("grp"), col("n_hashes"), col("kth_hash"), estimate(k))
  }

  /** [[distinctEstimate]] as ONE aggregation: the custom
    * [[graft.expressions.KmvBottomK]] buffer holds the k smallest
    * distinct hashes, so the plan is a single partial+final
    * ObjectHashAggregate exchange carrying ≤ k longs per group per
    * task — no distinct-shuffle of the full hash population and no
    * window pass. Bit-identical output to the composable form (which
    * stays as the oracle cross-check).
    */
  def distinctEstimateAgg(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.select(col(groupCol).as("grp"), hash48(col(valueCol)).as("h"))
      .groupBy("grp")
      .agg(graft.expressions.KmvBottomK(col("h"), k).as("sk"))
      .select(col("grp"), col("sk.n_hashes").as("n_hashes"),
        col("sk.kth_hash").as("kth_hash"))
      .select(col("grp"), col("n_hashes"), col("kth_hash"), estimate(k))
  }

  /** The shared estimate projection: `(k-1) * 2^48 / kth` — the product
    * is an exact double (k-1 < 2^53 times a power of two, so no
    * mantissa bits are lost) followed by ONE division, bit-identical
    * cross-engine. Exact count for groups the sketch holds entirely.
    */
  private def estimate(k: Int): Column =
    when(col("n_hashes") < k, col("n_hashes").cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace) / col("kth_hash"))
      .as("est_distinct")
}
