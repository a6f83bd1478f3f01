package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood record linkage (Hernández & Stolfo, SIGMOD
  * 1995): union both relations, order them by a fuzzy SORT key, and
  * compare only records within a sliding window of the global order.
  *
  * The method exists because equality blocking
  * ([[RecordLinkage.resolve]]) is brittle exactly where linkage is
  * hardest: a typo in the blocking column silently removes the record
  * from its block and the match is never scored. A sort key built
  * from content that survives the corruption (here: the digit tail of
  * an entity name) keeps the true pair ADJACENT in the order even
  * when every equality key is wrong — the window sees what no block
  * can.
  *
  * Scale shape — the textbook hazard is the global sort/rank:
  *   - the global rank is computed WITHOUT a single-reducer sort:
  *     `repartitionByRange` on the full (sort key, side, id) total
  *     order, per-partition `row_number`, plus per-partition base
  *     offsets from the one-row-per-partition count frame (the
  *     [[CorpusOrder]] two-level discipline). The rank is
  *     partition-boundary-INVARIANT: offsets are derived from the
  *     observed counts, so any monotone partitioning (including AQE
  *     re-coalescing) yields the identical global rank;
  *   - windowed pairing is an equi-join on neighborhood bands
  *     (`rank div (w-1)`, right side exploded to its 3 adjacent
  *     bands), never a rank-range theta-join — each candidate pair is
  *     produced exactly once, and the shuffle is band-keyed;
  *   - scoring + per-left argmin reuse the [[RecordLinkage]] shape:
  *     codegen'd levenshtein, threshold, `min(struct)` hash argmin.
  */
object SortedNeighborhood {

  /** @param window    slide size w: pairs within w consecutive union
    *                  rows are compared (|rank_l - rank_r| < w)
    * @param threshold max edit distance for a candidate to count
    */
  case class Config(window: Int = 4, threshold: Int = 2)

  /** Global 0-based rank of `df` under ORDER BY (sortCols...) — an
    * exact total-order rank computed with ONE range exchange;
    * `sortCols` must be a total order (append the id). Output: input
    * columns + `rank`.
    *
    * In-partition positions come from `monotonically_increasing_id`
    * over the range-partitioned, partition-sorted rows — its
    * documented layout (partition id in the upper bits, an in-order
    * counter in the lower 33) IS (pid, local rank), so no window (a
    * `partitionBy(_pid)` window would force a SECOND corpus-scale
    * hash exchange right after the range exchange — caught by the
    * plan audit). Both consumers of the ranked frame derive from the
    * same exchange subtree, so the sampled range boundaries are
    * computed once (ReuseExchange) and the counted offsets always
    * describe the very partitions the ids were minted in; the rank
    * itself is partition-boundary-invariant either way.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    // persisted: the id-stamped frame feeds BOTH the offsets aggregate
    // and the final join, and monotonically_increasing_id never
    // canonicalizes equal — without the cache the two branches lose
    // exchange reuse and sample DIFFERENT range boundaries, so the
    // counted offsets would describe partitions the ids were not
    // minted in (observed: dropped/duplicated ranks). Callers release
    // via catalog.clearCache(), the family convention.
    val parted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .select(col("*"),
        shiftright(col("_mid"), 33).as("_pid"),
        col("_mid").bitwiseAND(lit((1L << 33) - 1)).as("_rn"))
      .persist()
    // tiny frame: one row per shuffle partition; the unpartitioned
    // window scans only this (nullable zero key keeps Catalyst from
    // folding the partition spec away — the CorpusOrder note)
    val byPid = Window.partitionBy(when(col("_pid") >= 0, lit(0)))
      .orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .select(col("_pid"), coalesce(sum(col("_n")).over(byPid), lit(0L))
        .as("_off"))
    parted
      .join(broadcast(offsets), "_pid")
      .withColumn("rank", col("_off") + col("_rn"))
      .drop("_mid", "_pid", "_rn", "_off")
  }

  /** Best right-side match per left record among candidates within the
    * window: (leftId, match_id, match_dist, n_cand) — the
    * [[RecordLinkage.resolve]] contract, with the window replacing the
    * block.
    *
    * `leftKey` / `rightKey` build the sort key from each side's
    * columns; rows order by (key, side, id) — left before right on
    * exact key ties, ids breaking the rest.
    */
  def resolve(left: DataFrame, right: DataFrame,
      leftId: String, leftText: String, leftKey: Column,
      rightId: String, rightText: String, rightKey: Column,
      cfg: Config = Config()): DataFrame = {
    require(cfg.window >= 2, s"window must be >= 2, got ${cfg.window}")
    val u = left.select(lit(0).as("_side"), col(leftId).cast("long").as("_id"),
        col(leftText).as("_txt"), leftKey.as("_sk"))
      .unionByName(right.select(lit(1).as("_side"),
        col(rightId).cast("long").as("_id"), col(rightText).as("_txt"),
        rightKey.as("_sk")))
    val ranked = globalRank(u, Seq(col("_sk"), col("_side"), col("_id")))
      .persist() // feeds both join sides; released via clearCache
    val bandW = (cfg.window - 1).toLong
    val l = ranked.filter(col("_side") === 0)
      .select(col("_id").as("_lid"), col("_txt").as("_ltxt"),
        col("rank").as("_lr"),
        floor(col("rank") / bandW).cast("long").as("_band"))
    // right side explodes to its band and both neighbors: a pair with
    // |lr - rr| <= w-1 has band(r) in {band(l)-1, band(l), band(l)+1},
    // and the three emitted values are distinct — matched exactly once
    val r = ranked.filter(col("_side") === 1)
      .select(col("_id").as("_rid"), col("_txt").as("_rtxt"),
        col("rank").as("_rr"),
        explode(array((-1 to 1).map(d =>
          floor(col("rank") / bandW).cast("long") + d): _*)).as("_band"))
    val scored = l.join(r, "_band")
      .filter(abs(col("_lr") - col("_rr")) <= bandW)
      // banded 3-arg levenshtein: O(n·k) per candidate, -1 above the
      // threshold — >= 0 keeps exactly the old `<= threshold` rows
      .select(col("_lid"), col("_rid"),
        levenshtein(col("_ltxt"), col("_rtxt"), cfg.threshold).as("_d"))
      .filter(col("_d") >= 0)
    scored.groupBy(col("_lid").as(leftId))
      .agg(min(struct(col("_d"), col("_rid"))).as("_best"),
        count(lit(1)).as("n_cand"))
      .select(col(leftId), col("_best._rid").as("match_id"),
        col("_best._d").as("match_dist"), col("n_cand"))
  }
}
