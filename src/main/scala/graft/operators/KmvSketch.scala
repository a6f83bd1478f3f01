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

  /** 2^48 as an exact long — the θ assigned to a group whose sketch
    * holds its whole population (every hash is below the ceiling).
    */
  val HashSpaceLong: Long = 1L << HashBits

  /** Pairwise cross-group set-overlap estimation from KMV sketches —
    * "how much distinct content do feeds A and B share" WITHOUT
    * joining the full populations: the theta-sketch intersection rule
    * (Beyer et al. 2007 / the DataSketches theta family) applied to
    * the same md5 bottom-k sketches as [[distinctEstimate]], so the
    * estimates are bit-reproducible cross-engine and can sit behind
    * the hash gate.
    *
    * Semantics (mirrored verbatim by the oracle): per group keep the
    * k smallest distinct 48-bit hashes; θ_g = 2^48 if the group has
    * fewer than k distinct values (sketch = whole population) else its
    * kth-smallest hash. For each pair a &lt; b with θ = min(θ_a, θ_b):
    *
    *   - `n_common`  = |S_a ∩ S_b| (every common sketch hash is ≤ θ
    *     by construction);
    *   - `n_union`   = |{h ∈ S_a : h ≤ θ}| + |{h ∈ S_b : h ≤ θ}|
    *     − n_common — the union restricted below θ;
    *   - `est_jaccard` = n_common / n_union (0 when the union is
    *     empty) — both operands exact integers, ONE division;
    *   - `est_inter` = n_common · 2^48 / θ — the inclusion-sampled
    *     distinct-intersection estimate (the product is exact: an
    *     integer times a power of two), collapsing to the EXACT
    *     intersection count when both sketches hold their whole
    *     populations.
    *
    * Distributed shape (the 100 TB audit): the only data-scale work is
    * the (group, hash) dedupe + per-group bottom-k — [[distinctEstimate]]'s
    * own cost. Everything after runs on the sketch frame (≤ groups·k
    * rows, checkpointed once): the pair frame is a non-equi self-join
    * of the PER-GROUP STATS frame (one row per group — bounded by the
    * number of groups squared, never by data), and the common/below
    * counts are joins against the tiny sketch frame. Estimating
    * all-pairs overlap of 20 feeds over 100 TB costs one
    * sketch-construction pass, full stop.
    */
  def pairwiseOverlap(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val w = Window.partitionBy("grp").orderBy("h")
    val sk = df
      .select(col(groupCol).as("grp"), hash48(col(valueCol)).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("grp", "h")
      .localCheckpoint(false)
    val g = sk.groupBy("grp")
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("kth"))
      .select(col("grp"),
        when(col("n_hashes") < k, lit(HashSpaceLong))
          .otherwise(col("kth")).as("theta"))
    val pairs = g.select(col("grp").as("src_a"), col("theta").as("ta"))
      .join(g.select(col("grp").as("src_b"), col("theta").as("tb")),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), least(col("ta"), col("tb"))
        .as("theta"))
      .localCheckpoint(false)
    val common = sk.select(col("grp").as("src_a"), col("h"))
      .join(sk.select(col("grp").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_common"))
    def below(side: String): DataFrame = pairs
      .join(sk.withColumnRenamed("grp", side), Seq(side))
      .filter(col("h") <= col("theta"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as(s"n_$side"))
    pairs
      .join(below("src_a"), Seq("src_a", "src_b"), "left")
      .join(below("src_b"), Seq("src_a", "src_b"), "left")
      .join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("theta"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_src_a"), lit(0L)) +
          coalesce(col("n_src_b"), lit(0L)) -
          coalesce(col("n_common"), lit(0L))).as("n_union"))
      .select(col("src_a"), col("src_b"), col("theta"), col("n_common"),
        col("n_union"),
        when(col("n_union") === 0, lit(0.0))
          .otherwise(col("n_common").cast("double") / col("n_union"))
          .as("est_jaccard"),
        (col("n_common").cast("double") * HashSpace / col("theta"))
          .as("est_inter"))
  }
}
