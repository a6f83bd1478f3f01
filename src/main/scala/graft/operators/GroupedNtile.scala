package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group quantile-bucket assignment — the CCNet discipline
  * (head/middle/tail perplexity buckets per language) and the general
  * "grouped ntile" a curation pipeline needs wherever a signal must be
  * ranked WITHIN a stratum (per language, per source, per domain)
  * rather than globally: absolute perplexity thresholds would brand
  * every low-resource language "tail" because its LM is worse, while
  * per-group ranks compare each document only against its peers.
  *
  * The textbook formulation `ntile(n) OVER (PARTITION BY g ORDER BY s)`
  * is the scale hazard: window parallelism is the number of GROUPS, and
  * a 100 TB corpus is ~90% one language — one reducer sorts it. Here
  * the rank comes from [[SortedNeighborhood.globalRank]]'s two-level
  * scan over the (group, order...) total order — ONE range exchange
  * whose partition count is data-sized, not group-sized; a group's rows
  * span as many partitions as their volume needs. The group-local rank
  * is then `rank - min(rank) within group`: group bases ride the tiny
  * one-row-per-group count frame (broadcast back), never a second
  * corpus exchange.
  *
  * Bucket arithmetic is pure integers — `(n · localRank) div |group|`,
  * ∈ [0, n) with bucket sizes differing by at most one — so the oracle
  * replays it exactly (no ntile() cross-engine tie/remainder semantics
  * to match, no doubles).
  */
object GroupedNtile {

  /** Input columns + `bucket` (long ∈ [0, n)). `orderCols :+ idCol`
    * must totally order each group — pass the row id last, the
    * [[SortedNeighborhood.globalRank]] contract. The ranked frame
    * persists inside globalRank; callers release via
    * `catalog.clearCache()`, the family convention.
    */
  def bucketPlan(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      idCol: String, n: Int): DataFrame = {
    require(n > 0, s"bucket count must be positive, got $n")
    val ranked = SortedNeighborhood.globalRank(
      df, col(groupCol) +: orderCols :+ col(idCol))
    // tiny: one row per group. min(rank) IS the group's base offset —
    // ranks are contiguous and group-major by construction, so no
    // cumulative window is needed (cf. CorpusOrder's bucket offsets).
    val groups = ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("_gn"), min("rank").as("_gbase"))
    ranked.join(broadcast(groups), Seq(groupCol))
      // long DIV long — Spark's integral division (the SQL `div`
      // operator; the Column API has only the double `/`)
      .withColumn("bucket", expr(s"((rank - _gbase) * ${n}L) div _gn"))
      .drop("rank", "_gn", "_gbase")
  }

  /** Frozen bucket BOUNDARIES per group — the production split of
    * [[bucketPlan]] (the CCNet offline/online shape): derive cut
    * points from a reference corpus once, then label any frame —
    * including a stream, since applying is a pure projection — against
    * the frozen cuts. One row per group: the sorted array of each
    * bucket b ≥ 1's FIRST (order, id) pair. Bounded: groups × (n−1)
    * cut structs.
    */
  def boundaries(df: DataFrame, groupCol: String, orderCol: Column,
      idCol: String, n: Int): DataFrame =
    bucketPlan(df, groupCol, Seq(orderCol), idCol, n)
      .filter(col("bucket") >= 1L)
      .groupBy(col(groupCol), col("bucket"))
      .agg(min(struct(orderCol.as("o"), col(idCol).as("i"))).as("cut"))
      .groupBy(groupCol)
      .agg(sort_array(collect_list(struct(col("bucket"), col("cut"))))
        .as("_cuts"))

  /** Label `df` against frozen [[boundaries]]: bucket = #cuts ≤lex
    * (order, id). For the reference corpus itself this equals
    * [[bucketPlan]] EXACTLY — a cut is its own bucket's first row, so
    * the lexicographic count reproduces the rank arithmetic (the
    * text_ppl_apply gate hashes against the rank oracle to prove it).
    * One broadcast join on the group + a bounded array scan per row:
    * no rank, no shuffle beyond the broadcast — the stream-safe face.
    * Groups absent from the reference get bucket 0 (all-new group:
    * nothing to compare against).
    */
  def applyBoundaries(df: DataFrame, bounds: DataFrame, groupCol: String,
      orderCol: Column, idCol: String): DataFrame = {
    val x = struct(orderCol.as("o"), col(idCol).as("i"))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn("bucket",
        coalesce(
          size(filter(col("_cuts"), c => c.getField("cut") <= x)).cast("long"),
          lit(0L)))
      .drop("_cuts")
  }
}
