package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the
  * transitive-closure step that turns pairwise matches into dedup
  * CLUSTERS (A~B, B~C ⇒ {A,B,C} even when A,C never collided).
  *
  * Algorithm: iterative min-label propagation, the DataFrame rendering
  * of the classic distributed CC: every node starts labeled with its
  * own id; each round every node takes the min of its label and its
  * neighbors' labels; converged when a round changes nothing. All per-
  * round work is shuffles on node ids (join + groupBy-min, map-side
  * combined) — no driver-side graph state, so it scales to edge sets
  * that dwarf memory. Rounds needed = graph diameter; duplicate
  * clusters are near-cliques (every clone collides with most others),
  * so diameter is 1–2 in practice and the loop exits after the first
  * no-change round. The per-round action is a 1-row count (the
  * convergence check), not a data collect.
  *
  * At 100 TB scale the same loop holds (it's the standard pre-GraphX
  * CC formulation); for adversarial long-chain graphs switch the label
  * exchange to the large-star/small-star variant, which converges in
  * O(log n) rounds — the plan shape per round is identical.
  */
object Clusters {

  /** (id, component) for every node in `pairs`, where component = the
    * minimum node id reachable through the pair graph.
    *
    * @param pairs   undirected edges, one per row
    * @param aCol    first endpoint column
    * @param bCol    second endpoint column
    * @param maxIter safety bound on propagation rounds
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()

    // seed = one propagation round for free: min(id, direct neighbors).
    // Near-clique duplicate clusters converge on the FIRST check.
    var labels = edges.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("comp"))
      .select(col("src").as("id"), col("comp"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      // __changed rides along in the cached frame (the next round's join
      // ignores it) so the convergence check and the new labels share ONE
      // materialization
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp") < col("comp")).as("__changed"))
        .persist()
      converged = next.filter(col("__changed")).limit(1).count() == 0L
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select("id", "comp")
  }

  /** Keep one row per duplicate cluster: drop every doc whose cluster
    * representative (min id) is a different doc. Docs in no pair are
    * their own cluster and always survive.
    */
  def dedupByClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
