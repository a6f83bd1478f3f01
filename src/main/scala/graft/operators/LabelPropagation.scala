package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation — community detection (Raghavan et
  * al., 2007) as the graph family's step BEYOND connected components:
  * CC merges everything reachable, so one bridge edge fuses two dense
  * communities; LPA assigns each node the most frequent label among
  * its neighbors, so bridges lose the vote and dense regions keep
  * their own labels (spec: two cliques + one bridge = ONE component
  * but TWO communities).
  *
  * Determinism (the gate bar): synchronous rounds (all nodes update
  * from the previous round's labels — no asynchronous order
  * dependence), argmax by (count DESC, label ASC) — a total order, so
  * every round is a pure function of the last and a fixed round count
  * gives ONE answer on any partitioning. The textbook's random
  * update order and random tie-breaks are exactly what a
  * hash-verified engine cannot ship.
  *
  * Shape per round: one join of the (node, label) frame to the edge
  * table on dst, one (src, label) count aggregate, one min(struct)
  * argmax per node — all map-side combinable; rounds truncate lineage
  * via `localCheckpoint` (the [[PageRank]]/Clusters discipline).
  */
object LabelPropagation {

  /** (id, community) after `rounds` synchronous updates over the
    * undirected graph given as unique (a, b) pairs (any orientation;
    * symmetrized internally). Labels start as own ids; nodes keep
    * their latest vote winner. Communities are label values — stable
    * identifiers, not canonicalized minima.
    */
  def communities(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds in [1,50], got $rounds")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(
        pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      labels = edges
        .join(labels.select(col("id").as("dst"), col("lab")), "dst")
        .groupBy(col("src"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("src").as("id"))
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("l")))
          .as("best"))
        .select(col("id"), col("best.l").as("lab"))
        .localCheckpoint(false)
    }
    labels.select(col("id"), col("lab").as("community"))
  }
}
