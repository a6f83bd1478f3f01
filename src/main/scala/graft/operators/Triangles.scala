package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the local clustering signal (how
  * clique-like is each node's neighborhood): over a near-dup pair
  * graph it separates genuine duplicate CLUSTERS (triangle-dense)
  * from chains of borderline pairs (triangle-free), and over a
  * mutual-kNN graph it is the embedding-space cohesion score.
  *
  * The classic distributed shape (Suri & Vassilvitskii's MapReduce
  * formulation, WWW 2011): orient every edge low→high id, build
  * wedges by joining ordered edges on the middle node, close each
  * wedge with one membership join against the ordered edge set. Each
  * triangle (a < b < c) is counted EXACTLY once as wedge a–b–c closed
  * by edge (a, c); candidate volume is Σ_v deg(v)² on ordered
  * degrees — the same bound the dedup postings joins carry, and the
  * reason orientation matters (un-ordered wedges would triple the
  * fanout and the dedup).
  */
object Triangles {

  /** (id, n_tri): triangles through each node of the undirected graph
    * given as unique pairs (any orientation; nodes on no triangle
    * report 0).
    */
  def perNode(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // orient low→high; dedupe in case both orientations arrive
    val e = pairs.select(
        least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist() // three consumers; callers release via clearCache
    val wedges = e.as("ab").join(e.as("bc"),
        col("ab.hi") === col("bc.lo"))
      .select(col("ab.lo").as("a"), col("ab.hi").as("b"),
        col("bc.hi").as("c"))
    val tris = wedges.join(e.as("ac"),
        col("a") === col("ac.lo") && col("c") === col("ac.hi"))
      .select("a", "b", "c")
    val counts = tris.select(explode(array(col("a"), col("b"), col("c")))
        .as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    // left join from the node set so triangle-free nodes report 0
    val nodes = e.select(col("lo").as("id"))
      .unionByName(e.select(col("hi").as("id"))).distinct()
    nodes.join(counts, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
