package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the density filter of the graph family: LPA
  * answers "which community", triangles answer "how cohesive is my
  * neighborhood", k-core answers "does this node survive when the
  * sparse fringe is repeatedly stripped away" (Seidman 1983; the
  * standard spam/quality prefilter for web and similarity graphs —
  * tendrils and chains peel off, dense cores stay).
  *
  * Semantics (ROUND-GATED, mirrored verbatim by the oracle): starting
  * from the undirected edge set e_0, each round computes every node's
  * degree in e_{i-1}, keeps the nodes with degree >= k, and restricts
  * the edge set to pairs whose BOTH endpoints survive. After a fixed
  * number of rounds the output is (id, deg) — each remaining node with
  * its degree in the final edge set. With enough rounds this is
  * exactly the k-core; with fewer it is the deterministic i-th peel
  * state, still a pure function of the input (the
  * [[PageRank]]/[[LabelPropagation]] fixed-round discipline — no
  * convergence test, so no run-to-run variance for the hash gate).
  *
  * Shape per round (the 100 TB audit): ONE map-side-combinable degree
  * aggregate over the current edges plus TWO semi-joins (src-keep,
  * dst-keep) — all keyed on node id, no window, no driver collect;
  * `localCheckpoint` truncates lineage each round exactly like the
  * connected-components loop ([[graft.dedup.Clusters]]). Edge count
  * only ever shrinks, so every round costs at most the first; for a
  * mutual-kNN input the edge set is N·k-bounded from the start.
  *
  * Reference scope note: the reference
  * (jasjyotsinghjaswal/pyspark-datacol-diff) has no graph surface —
  * extension operator for the LLM-pipeline north star (graph-based
  * corpus curation).
  */
object KCore {

  /** (id, deg) after `rounds` peels at threshold `k` over the
    * undirected graph given as unique (a, b) pairs (any orientation;
    * symmetrized internally). Nodes absent from the output were
    * peeled (or never had an edge); `deg` is the node's degree in the
    * final surviving edge set.
    */
  def peel(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(rounds >= 1 && rounds <= 50, s"rounds in [1,50], got $rounds")
    var edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
      edges = edges
        .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(false)
    }
    edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
  }
}
