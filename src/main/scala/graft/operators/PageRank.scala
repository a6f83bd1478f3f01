package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over a weighted edge table — link-style
  * authority scoring (crawl prioritization, canonical-representative
  * choice inside duplicate clusters, Markov importance of event
  * states). The algorithmic shape is the standard iterative
  * rank-splitting (public literature: Page et al., "The PageRank
  * Citation Ranking"; the MapReduce formulation in Dean & Ghemawat's
  * follow-ups): each round joins ranks to edges on src, splits each
  * node's rank over its out-weight, and re-aggregates by dst.
  *
  * What makes THIS formulation unusual is that it is bit-exact across
  * engines: ranks live in 64-bit integer fixed point (SCALE = 10^12)
  * and every step is integer arithmetic —
  *
  *   r_0(v)     = S div N
  *   r_{k+1}(v) = (3·S) div (20·N)
  *              + (17 · Σ_{(u,v,w)∈E} w · (r_k(u) div out(u))) div 20
  *
  * with damping 0.85 = 17/20 and teleport 0.15 = 3/20 as exact
  * ratios and every division a floor division. Floating-point
  * PageRank can NEVER sit behind a hash-match gate — double sums
  * depend on aggregation order — but floor-divided integer mass is
  * order-independent, so a DuckDB oracle replays the identical
  * iteration and the identical 64-bit ranks. The cost: dropped
  * remainders mean total mass slowly leaks (as it also does through
  * dangling nodes, whose mass is discarded — the ranking stays
  * meaningful, the simplex property does not, and neither engine
  * disagrees about it).
  *
  * Distributed shape, per round: ONE shuffle of the (small) rank
  * frame to meet the pre-partitioned, persisted edge table on src,
  * plus ONE aggregate by dst. The dangling/no-inbound default does
  * NOT cost a per-round join: the node spine unions into the
  * contribution aggregate as zero-mass rows (`sum` over the extra 0
  * equals the old `coalesce(m, 0)` of the left join), so each round
  * is join + union + ONE exchange instead of join + two. No
  * driver-side graph state beyond the node count; lineage truncates
  * via `localCheckpoint` every [[CheckpointEvery]] rounds (r16: a
  * per-round checkpoint made every round a separately planned query —
  * measured more driver/AQE gap than task time at 5 rounds; a short
  * run is now ONE query), and the final round checkpoints eagerly so
  * the edge cache is dropped before the result leaves the call.
  * Overflow-safe by construction: total in-flight mass is
  * ≤ S = 10^12, so 17·Σ ≤ 1.7e13 ≪ 2^63.
  */
object PageRank {

  val Scale = 1000000000000L // 10^12 fixed-point units of rank 1.0

  /** Lineage-truncation cadence: deep enough that a short run (the
    * benched 5 rounds) plans as a single query, shallow enough that a
    * 100-round run never nests a plan past 8 rounds of join+agg.
    */
  private val CheckpointEvery = 8

  /** (node, rank_fp) for every node appearing as src or dst of
    * `edges`, after `iters` rounds. `weightCol` is the multi-edge
    * weight (pass a lit(1) column upstream for unweighted graphs).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters in [1,100], got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("bigint").as("w"))

    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    // static per-round join input: edges annotated with their node's
    // total out-weight, hash-partitioned by src ONCE and persisted —
    // the InMemoryRelation keeps its outputPartitioning (and sort
    // order), so every round's rank join consumes the cached layout
    // directly with no fresh exchange on the (big) edge side.
    // (A localCheckpoint would NOT work here: LogicalRDD drops the
    // partitioning and every round would re-shuffle the edges —
    // verified on the executed plans.) The last round is checkpointed
    // EAGERLY so all rounds materialize inside this call and the cache
    // can be dropped before returning — no persist leak.
    val outW = e.groupBy("src").agg(sum(col("w")).as("outw"))
    val eOut = e.join(outW, "src").repartition(col("src")).persist()
    val n = nodes.count()

    var r = nodes.select(col("node"), lit(Scale / n).as("r"))
      .localCheckpoint(false)
    val base = 3L * Scale / (20L * n)
    for (k <- 1 to iters) {
      // node spine rides the aggregate as zero rows: sum(m ∪ {0}) ==
      // coalesce(sum(m), 0), so no-inbound nodes still get base and
      // the old per-round left join (its own exchange) is gone
      val contrib = eOut
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("w") * expr("r DIV outw")).as("m"))
        .unionByName(nodes.select(col("node"), lit(0L).as("m")))
        .groupBy("node").agg(sum(col("m")).as("m"))
      r = contrib
        .select(col("node"), (lit(base) + expr("(17 * m) DIV 20")).as("r"))
      if (k % CheckpointEvery == 0 || k == iters)
        r = r.localCheckpoint(eager = k == iters)
    }
    eOut.unpersist()
    r.select(col("node"), col("r").as("rank_fp"))
  }

  /** Personalized PageRank: identical integer fixed-point frame, but
    * ALL teleport mass restarts at the `seeds` instead of spreading
    * uniformly — rank becomes proximity TO the seed set (the
    * graph-similarity / related-entities form: "what is reachable
    * from here", not "what is globally central"). Seeds are literal
    * node values (the personalization vector is part of the query,
    * like a filter predicate);
    *
    *   r_0(v)     = 1[v ∈ seeds] · (S div |seeds|)
    *   r_{k+1}(v) = 1[v ∈ seeds] · ((3·S) div (20·|seeds|))
    *              + (17 · Σ inbound mass) div 20
    *
    * — every step floor-divided integers, so the oracle replays the
    * recurrence exactly ([[ranks]]' determinism argument verbatim).
    */
  def personalizedRanks(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: Seq[String], iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters in [1,100], got $iters")
    require(seeds.nonEmpty, "need at least one seed node")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("bigint").as("w"))
    val ns = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outW = e.groupBy("src").agg(sum(col("w")).as("outw"))
    val eOut = e.join(outW, "src").repartition(col("src")).persist()
    val isSeed = col("node").isin(seeds: _*)
    val nSeeds = seeds.length.toLong
    var r = ns.select(col("node"),
        when(isSeed, lit(Scale / nSeeds)).otherwise(lit(0L)).as("r"))
      .localCheckpoint(false)
    val base = 3L * Scale / (20L * nSeeds)
    for (k <- 1 to iters) {
      // same zero-row spine trick as [[ranks]]: one exchange per round
      val contrib = eOut
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("w") * expr("r DIV outw")).as("m"))
        .unionByName(ns.select(col("node"), lit(0L).as("m")))
        .groupBy("node").agg(sum(col("m")).as("m"))
      r = contrib
        .select(col("node"),
          (when(isSeed, lit(base)).otherwise(lit(0L)) +
            expr("(17 * m) DIV 20")).as("r"))
      if (k % CheckpointEvery == 0 || k == iters)
        r = r.localCheckpoint(eager = k == iters)
    }
    eOut.unpersist()
    r.select(col("node"), col("r").as("rank_fp"))
  }
}
