package graft.operators

import graft.expressions.MisraGries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters — every item whose occurrence share
  * exceeds `1/denom`, with EXACT counts, in two bounded-memory passes.
  *
  * The naive form (`groupBy(item).count().where(...)`) shuffles one row
  * per distinct item; over 100 TB of n-gram postings that is the whole
  * vocabulary crossing the wire to then discard all but the heaviest
  * sliver. This operator instead:
  *
  *   1. **Sketch pass** — one scan aggregating a [[MisraGries]] summary
  *      (≤ `k` counters per task, merged losslessly for the guarantee)
  *      plus the exact total count in the SAME aggregate: each task
  *      ships ≤ k pairs + one long through a single-row exchange. With
  *      `k + 1 > denom`, the MG deficit bound (≤ n/(k+1) undercount)
  *      makes the sketch's key set a guaranteed SUPERSET of the true
  *      heavy set — the screen is lossless by construction, not
  *      probabilistically.
  *   2. **Verify pass** — re-scan, broadcast-semi-join the ≤ k
  *      candidate items onto the stream, and count exactly. The
  *      aggregate is map-side combined over ≤ k groups, so the second
  *      shuffle carries ≤ k rows per task; non-candidate items never
  *      leave their scan task.
  *
  * The result equals the naive form exactly (machine-checked per round:
  * the `text_heavyhitters` DuckDB oracle IS the naive form), while both
  * shuffles stay O(k × tasks) instead of O(distinct items). The
  * re-scan is intrinsic to exactness (one-pass exact heavy hitters
  * needs Ω(distinct) memory); at 100 TB a scan is cheap, a
  * vocabulary-sized shuffle is not.
  *
  * Output: (itemCol, cnt, share) — share as the single division
  * cnt/total of two exact longs, so it is bit-identical cross-engine.
  * Caller orders.
  */
object HeavyHitters {

  /** @param items one row per occurrence (pre-exploded)
    * @param itemCol string item column
    * @param denom   heavy = cnt * denom > total (share > 1/denom)
    * @param k       MG counters; must satisfy k + 1 > denom for the
    *                lossless-screen guarantee
    */
  def exact(items: DataFrame, itemCol: String, denom: Int, k: Int): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    require(k + 1 > denom,
      s"lossless screen needs k + 1 > denom (deficit n/(k+1) < threshold " +
        s"n/denom); got k=$k, denom=$denom")
    val pass1 = items.agg(
      MisraGries(col(itemCol), k).as("__sk"),
      count(lit(1)).as("n_total"))
    val cand = pass1.select(
      explode(map_keys(col("__sk"))).as(itemCol), col("n_total"))
    items
      .join(broadcast(cand), Seq(itemCol))
      .groupBy(col(itemCol), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(denom.toLong) > col("n_total"))
      .select(col(itemCol), col("cnt"),
        (col("cnt").cast("double") / col("n_total")).as("share"))
  }

  /** Per-group exact heavy hitters: one MG sketch per group (the
    * aggregate buffer is per-group state, so the sketch pass is one
    * map-side-combined shuffle of ≤ k counters per (group, task)),
    * then the same broadcast verify keyed on (group, item). The
    * candidate frame is groups × k rows — broadcastable while the
    * group count is dimension-like (thousands); beyond that, drop the
    * `broadcast` hint and let AQE pick the join side.
    *
    * Output: (groupCol, itemCol, cnt, share), share relative to the
    * GROUP's total. Same k + 1 > denom lossless-screen contract,
    * applied per group.
    */
  def exactPerGroup(items: DataFrame, groupCol: String, itemCol: String,
      denom: Int, k: Int): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    require(k + 1 > denom,
      s"lossless screen needs k + 1 > denom; got k=$k, denom=$denom")
    val pass1 = items.groupBy(col(groupCol)).agg(
      MisraGries(col(itemCol), k).as("__sk"),
      count(lit(1)).as("n_total"))
    val cand = pass1.select(col(groupCol),
      explode(map_keys(col("__sk"))).as(itemCol), col("n_total"))
    items
      .join(broadcast(cand), Seq(groupCol, itemCol))
      .groupBy(col(groupCol), col(itemCol), col("n_total"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(denom.toLong) > col("n_total"))
      .select(col(groupCol), col(itemCol), col("cnt"),
        (col("cnt").cast("double") / col("n_total")).as("share"))
  }
}
