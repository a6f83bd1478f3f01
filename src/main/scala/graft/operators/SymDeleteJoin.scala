package graft.operators

import graft.expressions.DeletionNeighborhood
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocking-free fuzzy join via deletion neighborhoods (FastSS /
  * SymSpell): match records whose key strings are within edit distance
  * `d` WITHOUT any equality blocking column and WITHOUT the |L|·|R|
  * candidate join [[RecordLinkage]] would need once blocking keys are
  * unavailable or untrusted.
  *
  * Screen: each side explodes its key into the ≤d-deletion variant set
  * ([[graft.expressions.DeletionNeighborhood]]); candidates are the
  * DISTINCT pairs sharing a variant (a plain shuffled equi-join on the
  * variant string — the postings-join shape the dedup family runs);
  * `levenshtein ≤ d` then verifies, because sharing a variant only
  * bounds the distance by 2d. Losslessness (lev ≤ d ⟹ neighborhoods
  * intersect) is ScalaCheck'd against brute-force DP edit distance in
  * SymDeleteJoinProps.
  *
  * 100 TB shape: variant postings are (n_codepoints)^d / d! per record
  * — at the shipping d=1 regime, |keys|·(len+1) rows keyed by variant,
  * so the only shuffle is the candidate equi-join and verify cost is
  * ∝ true candidate count, never |L|·|R|. The clean-side variant
  * relation is a write-once index (bucket by `variant`, the
  * [[graft.dedup.IncrementalDedup]] pattern) for recurring ingest
  * screens. d=2 is reserved for short keys — the scaladoc on the
  * expression carries the cost law.
  *
  * Reference scope note: the reference engine has no fuzzy-matching
  * surface — extension operator (typo-tolerant entity lookup when the
  * blocking columns themselves are dirty, the case that breaks
  * [[RecordLinkage]] and that [[SortedNeighborhood]] only covers when
  * a sort key survives).
  */
object SymDeleteJoin {

  private def variantSide(df: DataFrame, id: String, text: String,
      idAs: String, txtAs: String, d: Int): DataFrame =
    df.select(col(id).as(idAs), col(text).as(txtAs),
      explode(DeletionNeighborhood.of(col(text), d)).as("_v"))

  /** Screen + verify over two pre-exploded variant relations. */
  private def verified(lv: DataFrame, rv: DataFrame,
      leftId: String, rightId: String, d: Int): DataFrame =
    lv.join(rv, "_v")
      .select(col("_lid"), col("_rid"), col("_ltxt"), col("_rtxt"))
      .distinct()
      // banded 3-arg levenshtein: O(n·d) per verify, -1 above d — the
      // >= 0 filter keeps exactly the old `<= d` rows (same distances)
      .select(col("_lid"), col("_rid"),
        levenshtein(col("_ltxt"), col("_rtxt"), d).as("_dist"))
      .filter(col("_dist") >= 0)
      .select(col("_lid").as(leftId), col("_rid").as(rightId),
        col("_dist").as("dist"))

  /** All verified pairs: (leftId, rightId, dist ≤ d), exact-distance
    * annotated. Duplicate variant collisions collapse BEFORE the
    * levenshtein verify so each surviving pair is scored once.
    *
    * `maxVariantFreq` is the skew hatch for DENSE key spaces (the
    * [[RecordLinkage]] `maxBlockSize` / [[graft.dedup.NgramJaccard]]
    * doc-frequency-cap pattern): on a roster where thousands of keys
    * collapse onto one deletion variant (sequential ids, fixed
    * prefixes), that variant's postings join is the quadratic hot
    * bucket. With the cap set, variants whose REFERENCE-side postings
    * exceed it drop from candidate generation — the over-cap list is
    * tiny by definition and broadcasts. Capped screening is no longer
    * lossless: a pair is found iff it still shares an under-cap
    * variant (precision is untouched — verify is exact); the honest
    * trade the d-neighborhood literature makes at scale.
    */
  def candidates(left: DataFrame, right: DataFrame,
      leftId: String, leftText: String, rightId: String, rightText: String,
      d: Int, maxVariantFreq: Option[Long] = None): DataFrame = {
    val rv0 = variantSide(right, rightId, rightText, "_rid", "_rtxt", d)
    val rv = maxVariantFreq.fold(rv0) { cap =>
      val hot = rv0.groupBy(col("_v")).agg(count(lit(1)).as("_vn"))
        .filter(col("_vn") > cap).drop("_vn")
      rv0.join(broadcast(hot), Seq("_v"), "left_anti")
    }
    verified(
      variantSide(left, leftId, leftText, "_lid", "_ltxt", d),
      rv, leftId, rightId, d)
  }

  /** Per-left-record argmin match — (leftId, match_id, match_dist,
    * n_cand), the [[RecordLinkage.resolve]] output contract, via the
    * same one-aggregate `min(struct(dist, id))` lexicographic argmin
    * (deterministic (dist asc, id asc) tie-break, map-side combined).
    */
  def resolve(left: DataFrame, right: DataFrame,
      leftId: String, leftText: String, rightId: String, rightText: String,
      d: Int): DataFrame =
    argmin(candidates(left, right, leftId, leftText, rightId, rightText, d),
      leftId, rightId)

  private def argmin(cands: DataFrame, leftId: String,
      rightId: String): DataFrame =
    cands
      .groupBy(col(leftId))
      .agg(min(struct(col("dist"), col(rightId))).as("_best"),
        count(lit(1)).as("n_cand"))
      .select(col(leftId), col(s"_best.$rightId").as("match_id"),
        col("_best.dist").as("match_dist"), col("n_cand"))

  /** Persist the reference side's variant postings as ONE bucketed
    * catalog table keyed by the variant string — the
    * [[graft.dedup.IncrementalDedup.writeIndex]] discipline for the
    * fuzzy-lookup screen: the write-time shuffle is paid once, and
    * every later probe batch joins the index ALREADY partitioned on
    * `_v` (plan-spec'd in SymDeleteIndexSpec — no Exchange above the
    * bucketed scan before its join). Schema: (_rid, _rtxt, _v).
    */
  def writeIndex(right: DataFrame, rightId: String, rightText: String,
      d: Int, table: String, numBuckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      variantSide(right, rightId, rightText, "_rid", "_rtxt", d),
      table, "_v", numBuckets)

  /** [[candidates]] against a [[writeIndex]]-persisted reference —
    * identical pairs, zero reference-side shuffle per probe batch.
    * `d` must match the index's (variants are baked in at write time).
    */
  def candidatesIndexed(spark: SparkSession, table: String,
      left: DataFrame, leftId: String, leftText: String,
      d: Int): DataFrame =
    verified(
      variantSide(left, leftId, leftText, "_lid", "_ltxt", d),
      spark.table(table), leftId, "_rid", d)

  /** [[resolve]] against the persisted index; match ids surface from
    * the index's `_rid` column.
    */
  def resolveIndexed(spark: SparkSession, table: String,
      left: DataFrame, leftId: String, leftText: String,
      d: Int): DataFrame =
    argmin(candidatesIndexed(spark, table, left, leftId, leftText, d),
      leftId, "_rid")
}
