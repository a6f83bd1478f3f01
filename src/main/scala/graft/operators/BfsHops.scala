package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance — seeded proximity over a graph: from
  * a trusted/curated seed set, how many edges away is every other
  * node? The discrete companion to personalized PageRank
  * ([[PageRank.personalizedRanks]] gives continuous proximity mass;
  * this gives the exact minimum hop count — the TrustRank-style
  * "distance from known-good" signal used to tier a corpus by
  * curation proximity).
  *
  * Semantics (mirrored verbatim by the oracle): hop 0 is the seed set;
  * hop h is every node reachable by one edge from hop h-1 that has no
  * smaller recorded distance; expansion runs a FIXED `maxHops` rounds
  * (the [[KCore]]/[[PageRank]] round-gated discipline), so the output
  * — (id, hops) for every node reached — is a pure function of the
  * input regardless of whether the frontier emptied early.
  *
  * Shape per round (the 100 TB audit): the FRONTIER (newly reached
  * nodes only, not the cumulative distance table) joins the edge list
  * on src — one keyed hash join — then one left_anti against the
  * standing distances and a distinct on the new frontier. Per-round
  * cost is frontier-proportional, the textbook distributed BFS;
  * `localCheckpoint` truncates lineage each round. No window, no
  * driver collect; the cumulative table carries one row per reached
  * node.
  *
  * Reference scope note: the reference
  * (jasjyotsinghjaswal/pyspark-datacol-diff) has no graph surface —
  * extension operator for the LLM-pipeline north star.
  */
object BfsHops {

  /** (id, hops) — minimum hop distance from `seeds` (a one-column
    * frame of node ids) over the undirected graph given as unique
    * (a, b) pairs, expanded exactly `maxHops` rounds. Seeds not
    * present in the edge set still appear at hops 0 (they are valid
    * sources); nodes never reached are absent.
    */
  def minHops(pairs: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 50,
      s"maxHops in [1,50], got $maxHops")
    val seedCol = seeds.columns.head
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("hops", lit(0))
      .localCheckpoint(false)
    var frontier = dist.select("id")
    for (h <- 1 to maxHops) {
      frontier = edges
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(dist, Seq("id"), "left_anti")
        .localCheckpoint(false)
      dist = dist
        .unionByName(frontier.withColumn("hops", lit(h)))
        .localCheckpoint(false)
    }
    dist
  }
}
