package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment over an undirected
  * graph — the "did the clustering actually find structure" audit for
  * [[LabelPropagation]] / [[graft.dedup.Clusters]] outputs before a
  * pipeline trusts them (Q near 0 = no better than random for the
  * degree sequence; ≳ 0.3 = real structure):
  *
  *   Q = Σ_c [ intra_c/m − (deg_c / 2m)² ]
  *     = Σ_c (4·m·intra_c − deg_c²) / (4m²)
  *
  * Exactness: the per-community NUMERATOR `q_num = 4·m·intra_c −
  * deg_c²` is pure integer arithmetic (edge counts and degree sums);
  * the single division by 4m² happens driver-side AFTER the gate, so
  * the frame crossing engines carries only longs.
  *
  * Shape for scale: one degree aggregate over the symmetrized edge
  * list, two broadcast-joinable label attachments on the edge frame
  * (labels are |V|-sized but the join is keyed — no broadcast
  * assumed), one aggregate per side; output is |communities| rows.
  */
object Modularity {

  /** @param edges  undirected edge list, ONE row per edge (a, b)
    * @param labels (id, community) for every node incident to an edge
    * @return per community: (community, n_nodes, intra_edges, deg_sum,
    *         q_num) with q_num = 4·m·intra − deg_sum²;
    *         Q = Σ q_num / (4m²)
    */
  def byCommunity(edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, idCol: String, labCol: String): DataFrame = {
    val und = edges.select(col(aCol).as("_a"), col(bCol).as("_b"))
    val lab = labels.select(col(idCol).as("_id"), col(labCol).as("community"))
    val deg = und.select(col("_a").as("_id"))
      .unionByName(und.select(col("_b").as("_id")))
      .groupBy("_id").agg(count(lit(1)).as("_d"))
    val m = und.agg(count(lit(1)).as("_m"))
    val byComm = lab.join(deg, "_id")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("_d")).as("deg_sum"))
    val intra = und
      .join(lab.select(col("_id").as("_a"), col("community").as("_la")), "_a")
      .join(lab.select(col("_id").as("_b"), col("community").as("_lb")), "_b")
      .filter(col("_la") === col("_lb"))
      .groupBy(col("_la").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    byComm
      .join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("deg_sum"))
      .crossJoin(broadcast(m))
      .withColumn("q_num",
        expr("4 * _m * intra_edges - deg_sum * deg_sum"))
      .drop("_m")
  }
}
