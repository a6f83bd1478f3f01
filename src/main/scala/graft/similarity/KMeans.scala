package graft.similarity

import graft.expressions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over embedding columns — the trainer [[IVFIndex]]'s
  * doc comment defers to ("a production index would k-means them").
  *
  * Built for exact cross-engine verification AND the 100 TB shape:
  *
  *   - '''Fixed-point input.''' Each component is quantized once to
  *     `floor(x * 2^20)` (held as an integer-valued double). Centroid
  *     recomputation then only ever sums integers below 2^53, where IEEE
  *     double addition is EXACT and therefore order-independent — the
  *     one place floating point would otherwise make a distributed
  *     k-means nondeterministic (partial-aggregation order varies run to
  *     run). Distances and means stay bit-identical across Spark's
  *     hash aggregate and the DuckDB oracle's single-threaded fold.
  *   - '''Assignment is a pure projection.''' The codebook rides the
  *     plan as one flat-array object each iteration
  *     ([[graft.expressions.NearestCentroid]] — shipped in the task
  *     binary like a broadcast variable), so assigning a vector is one
  *     codegen'd k×dim argmin loop — no join, no shuffle, no per-row
  *     state, constant plan size in k. The corpus is scanned once per
  *     iteration.
  *   - '''Only k·d numbers ever reach the driver.''' Per iteration one
  *     map-side-combined `(cluster, pos)` aggregate shuffles ≤ k·d rows
  *     per task and collects k·d sums — the MLlib-style Lloyd's loop,
  *     independent of corpus size. The corpus itself is never collected.
  *
  * Distance is squared L2 in the quantized space, expanded as
  * `|q|² + |c|² − 2·q·c` so both norms are computed once (per row / per
  * centroid) and the cross term reuses the codegen'd dot fold. The
  * expansion's operand order is mirrored exactly by the oracle SQL.
  *
  * Deterministic policies (all mirrored by the oracle): seeds are the
  * vectors with the k smallest ids (cluster label = seed id); ties in
  * assignment break toward the smaller centroid id; a cluster that loses
  * all members is dropped (not re-seeded).
  *
  * Reference scope note: the reference engine
  * (jasjyotsinghjaswal/pyspark-datacol-diff) has no clustering surface —
  * this is an extension operator for the LLM-pipeline north star
  * (corpus clustering for curation / IVF cell training).
  */
object KMeans {

  /** `scaleBits`: fixed-point quantization of input components. 2^20
    * keeps |q·c| folds for unit-ish embeddings far below 2^53 exactness
    * territory even at dim 64 × 2^40 per term... (2^42 · 64 < 2^49).
    *
    * Regime: assignment carries the codebook as one flat array object
    * ([[graft.expressions.NearestCentroid]] — constant plan and
    * generated-code size in k), so k is bounded by codebook MEMORY
    * (k·dim doubles per executor, like any broadcast side) and the
    * k·dim multiply-adds per row, not by plan size: k=4096 × dim 64 is
    * stress-proven (Stress entry), the √N-cell regime a 100 TB
    * IVF/SemDeDup layout needs. The per-iteration driver collect stays
    * k·dim sums. The cap below is a sanity rail against accidentally
    * shipping a million-centroid codebook through a projection —
    * beyond it, assignment IS a join ([[IVFIndex.assign]]'s
    * centroid-frame shape).
    */
  case class Config(k: Int = 8, iters: Int = 3, scaleBits: Int = 20) {
    require(k >= 1 && iters >= 1 && scaleBits >= 0 && scaleBits <= 26)
    require(k <= 65536,
      "codebook assignment is for ≤64k centroids (k·dim doubles ride " +
        "the task binary); beyond that use the IVFIndex.assign " +
        "centroid-frame join shape")
    def scale: Double = (1L << scaleBits).toDouble
  }

  /** One trained centroid: stable label (= seed vector id), integer-
    * valued component means as doubles, and its precomputed squared norm
    * (left-folded, matching [[DotProduct]]'s order).
    */
  final case class Centroid(cid: Long, cv: Array[Double], cn: Double)

  private[similarity] def leftFoldSq(cv: Array[Double]): Double = {
    // ((0 + c0*c0) + c1*c1) + ... — the exact DotProduct/list_reduce order
    var acc = 0.0
    var i = 0
    while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
    acc
  }

  /** Quantized frame: (vid, q: array<double> of integers, qn: double). */
  private def quantize(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: Config): DataFrame =
    vectors
      .select(col(idCol).cast("long").as("vid"),
        transform(col(vecCol).cast("array<double>"),
          x => floor(x * lit(cfg.scale)).cast("double")).as("q"))
      .withColumn("qn", DotProduct(col("q"), col("q")))

  /** The k smallest-id (vid, quantized vector) rows — one TakeOrdered
    * job. Shared by this trainer's seeding and by composed layouts
    * ([[IvfPq]]) that seed TWO trainers (coarse + PQ) from a single
    * collect instead of one job each.
    */
  private[similarity] def seedRows(prep: DataFrame,
      k: Int): Seq[(Long, Array[Double])] =
    prep.orderBy("vid").limit(k).select("vid", "q").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  /** Seed centroids: the k smallest-id vectors (collect is k rows). */
  private def seeds(prep: DataFrame, cfg: Config): Seq[Centroid] =
    fromSeedRows(seedRows(prep, cfg.k))

  private[similarity] def fromSeedRows(
      rows: Seq[(Long, Array[Double])]): Seq[Centroid] =
    rows.map { case (vid, cv) => Centroid(vid, cv, leftFoldSq(cv)) }

  /** Codebook argmin for arbitrary (quantized-vector, squared-norm)
    * columns — shared with [[ProductQuant]], which runs one per
    * subspace. Output struct(d, c): squared distance and centroid id,
    * ties toward the smaller id.
    *
    * Implementation: [[graft.expressions.NearestCentroid]] — the whole
    * codebook rides the plan as ONE flat-array object (shipped in the
    * task binary like a broadcast variable, constant generated-code
    * size), so plan/codegen cost no longer grows with k and the
    * large-k regime (√N IVF cells, thousands of centroids) is open.
    * Bit-equal to [[bestStructLiteral]] by the expression's arithmetic
    * contract, ScalaCheck'd in KMeansSpec.
    */
  private[similarity] def bestStruct(cents: Seq[Centroid], q: Column,
      qn: Column): Column =
    graft.expressions.NearestCentroid(q, qn,
      cents.map(_.cid), cents.map(_.cn), cents.map(_.cv))

  /** The k-literal-subtree formulation bestStruct replaced:
    * `least(struct(qn + cn − 2·dot(q, lit(c)), cid), ...)` —
    * lexicographic struct ordering IS the (dist asc, cid asc) argmin
    * with its tie-break. Kept as the independent reference
    * implementation the equality spec checks the codebook path
    * against (two formulations, one arithmetic).
    */
  private[similarity] def bestStructLiteral(cents: Seq[Centroid], q: Column,
      qn: Column): Column = {
    val structs = cents.map { c =>
      val dist = qn + lit(c.cn) -
        lit(2.0) * DotProduct(q, array(c.cv.map(lit).toSeq: _*))
      struct(dist.as("d"), lit(c.cid).as("c"))
    }
    if (structs.sizeIs == 1) structs.head else least(structs: _*)
  }

  private def bestColumn(cents: Seq[Centroid]): Column =
    bestStruct(cents, col("q"), col("qn"))

  private def assign(prep: DataFrame, cents: Seq[Centroid]): DataFrame =
    prep.withColumn("best", bestColumn(cents))
      .select(col("vid"), col("q"), col("qn"),
        col("best.c").as("cluster"), col("best.d").as("dist"))

  /** New centroids from an assignment: exact integer sums per
    * (cluster, position), means taken in ONE double division each.
    * Empty clusters simply don't appear (drop-empty policy).
    */
  private def recompute(asg: DataFrame): Seq[Centroid] = {
    val rows = asg
      .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect()
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cid, rs) =>
      val cv = rs.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3))
        .toArray
      Centroid(cid, cv, leftFoldSq(cv))
    }
  }

  /** Train and label: `iters` assignment passes with `iters − 1`
    * centroid refinements between them. Returns one row per input
    * vector: (vec_id, cluster, dist) — cluster is the seed id of the
    * final nearest centroid, dist the squared quantized-space L2.
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame = {
    val prep = quantize(vectors, idCol, vecCol, cfg).persist()
    var cents = seeds(prep, cfg)
    var it = 1
    while (it < cfg.iters) {
      cents = recompute(assign(prep, cents))
      it += 1
    }
    assign(prep, cents)
      .select(col("vid").as("vec_id"), col("cluster"), col("dist"))
  }

  /** Label a frame with an already-trained centroid set: quantize with
    * the training config and take the same literal-centroid argmin — a
    * pure stateless projection, so it runs IDENTICALLY on batch and
    * streaming frames (the [[graft.streaming.EventStream]] one-
    * definition-for-both pattern; no state, no watermark needed).
    * This is the serving half of the operator: train once with [[fit]]/
    * [[centroids]], label every future batch/stream with the frozen
    * codebook.
    */
  def label(vectors: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Centroid], cfg: Config = Config()): DataFrame = {
    require(cents.nonEmpty, "label needs at least one centroid")
    assign(quantize(vectors, idCol, vecCol, cfg), cents)
      .select(col("vid").as("vec_id"), col("cluster"), col("dist"))
  }

  /** Trained centroids themselves (for feeding an IVF index). */
  def centroids(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): Seq[Centroid] = {
    val prep = quantize(vectors, idCol, vecCol, cfg).persist()
    try centroidsPrepared(prep, cfg)
    finally prep.unpersist(blocking = false)
  }

  /** [[centroids]] over an existing (vid, q, qn) quantized frame —
    * lets [[IvfPq]] train the coarse codebook on the same persisted
    * prep its PQ training and search scans use (one corpus cache, not
    * one per trainer). The frame must be quantized with THIS config's
    * scale.
    */
  private[similarity] def centroidsPrepared(prep: DataFrame, cfg: Config,
      preSeeds: Option[Seq[(Long, Array[Double])]] = None): Seq[Centroid] = {
    var cents = preSeeds.fold(seeds(prep, cfg))(r =>
      fromSeedRows(r.take(cfg.k)))
    (1 until cfg.iters).foreach { _ =>
      cents = recompute(assign(prep, cents))
    }
    cents
  }
}
