package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over a neighbor graph: score non-adjacent node
  * pairs by their shared neighborhood — the Resource Allocation index
  * (Zhou, Lü, Zhang 2009, "Predicting missing links via local
  * information"): RA(x, y) = Σ_{w ∈ Γ(x) ∩ Γ(y)} 1 / deg(w).
  * Adamic-Adar's 1/log(deg) sibling, chosen here because 1/deg stays
  * in INTEGER arithmetic (`scale div deg`, summed as exact longs) —
  * no libm, no float summation order, so the score is bit-stable
  * across engines and partitionings by construction.
  *
  * On the kNN graph this is the "suggest an edge the cell screen
  * missed" primitive: two documents never co-ranked by the ANN stage
  * but sharing many neighbors are near-duplicate suspects one hop out
  * — the candidate-expansion face NN-descent iterates, frozen into a
  * one-shot scored relation.
  *
  * Shape: symmetrize → distinct (edge multiset to edge SET), ONE
  * degree aggregate, wedge self-join keyed on the CENTER node (shuffle
  * ∝ Σ deg(w)², never |V|²), existing edges removed with a left-anti
  * join on the symmetric edge set, one final (x, y) aggregate.
  *
  * 100 TB shape: out-degree is bounded by the kNN fan-out K, so wedge
  * cost is Σ deg² ≤ |E|·maxDeg; hub IN-degree is the one skew risk and
  * `maxDegree` drops over-cap centers from wedge generation entirely
  * (the [[graft.dedup.NgramJaccard]] doc-frequency-cap pattern — the
  * over-cap list is tiny and the filter is a pre-aggregate, not a
  * shuffle). Determinism: integer score, total (score DESC, a, b)
  * order before any top-N cut.
  */
object LinkPredict {

  /** @param minCommon keep pairs with at least this many shared
    *                  neighbors (2+ kills the wedge-noise tail)
    * @param topN      deterministic global cut after the total order
    * @param scale     RA fixed-point: each center contributes
    *                  `scale div deg(center)`
    * @param maxDegree drop wedge CENTERS with more distinct neighbors
    *                  than this (hub/skew hatch); None = keep all
    * @return (node_a, node_b, common_n, ra_q) — node_a < node_b,
    *         non-adjacent pairs only, (ra_q DESC, node_a, node_b)
    *         ordered, topN rows
    */
  def resourceAllocation(edges: DataFrame, src: String, dst: String,
      minCommon: Int = 2, topN: Int = 100, scale: Long = 1000000000L,
      maxDegree: Option[Long] = None): DataFrame = {
    val und = edges.select(col(src).as("_n"), col(dst).as("_nbr"))
      .unionByName(edges.select(col(dst).as("_n"), col(src).as("_nbr")))
      .filter(col("_n") =!= col("_nbr"))
      .distinct()
    val deg0 = und.groupBy(col("_nbr").as("_w")).agg(count(lit(1)).as("_deg"))
    val deg = maxDegree.fold(deg0)(cap => deg0.filter(col("_deg") <= cap))
    // center-keyed wedge join: both sides arrive partitioned by the
    // center node, contributions attach to the center BEFORE the pair
    // aggregate so the per-pair sum is over exact longs
    val byCenter = und.select(col("_n").as("_x"), col("_nbr").as("_w"))
      .join(deg, "_w")
      .withColumn("_term", expr(s"$scale div _deg"))
    val wedges = byCenter.select(col("_w"), col("_x"), col("_term"))
      .join(und.select(col("_nbr").as("_w"), col("_n").as("_y")), "_w")
      .filter(col("_x") < col("_y"))
    wedges
      .join(und.select(col("_n").as("_x"), col("_nbr").as("_y")),
        Seq("_x", "_y"), "left_anti")
      .groupBy(col("_x"), col("_y"))
      .agg(count(lit(1)).as("common_n"), sum(col("_term")).as("ra_q"))
      .filter(col("common_n") >= minCommon)
      .orderBy(col("ra_q").desc, col("_x"), col("_y"))
      .limit(topN)
      .select(col("_x").as("node_a"), col("_y").as("node_b"),
        col("common_n"), col("ra_q"))
  }
}
