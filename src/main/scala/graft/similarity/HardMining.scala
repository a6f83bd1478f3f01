package graft.similarity

import graft.similarity.Cosine._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-hard triplet mining over a labeled embedding corpus — the
  * FaceNet/metric-learning criterion: for each anchor, the hardest
  * positive is the SAME-label vector the model currently places
  * farthest (minimum cosine) and the hardest negative is the
  * DIFFERENT-label vector it places nearest (maximum cosine). Anchors
  * whose hardest negative sits within `margin` of the hardest positive
  * are the triplets worth training on; the violation rate is the
  * curriculum signal.
  *
  * Complements [[graft.text.TrainingPairs]] (near-dup positives,
  * RANDOM negatives): here supervision comes from the label column and
  * negatives are adversarially selected by the current geometry.
  *
  * Scale shape: the anchor set is the small broadcast side; the corpus
  * is scanned ONCE and folds through a single map-side-combined hash
  * aggregate keyed by anchor — conditional `min/max(struct)` picks
  * both extremes with no window, no second scan, and only
  * |anchors|-many rows ever shuffle. Hardest-positive/negative ties
  * break to the smallest neighbor id on both engines: lexicographic
  * struct order with the id negated on the max side.
  */
object HardMining {

  /** (q_id, label, pos_id, pos_cos, neg_id, neg_cos, violated) per
    * anchor; `violated` = (pos_cos − neg_cos) < margin, null when the
    * anchor has no same-label or no different-label counterpart.
    */
  def hardestTriplets(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, isAnchor: Column => Column,
      margin: Double): DataFrame = {
    val prepared = vectors.select(col(idCol).as("vid"),
        col(vecCol).as("v"), col(labelCol).as("lbl"))
      .withColumn("nrm", norm2(col("v")))
    val anchors = prepared.filter(isAnchor(col("vid")))
      .select(col("vid").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("lbl").as("qlbl"))
    prepared.join(anchors, col("vid") =!= col("q_id"))
      .select(col("q_id"), col("qlbl"), col("vid").as("n_id"), col("lbl"),
        cosineWithNorms(dot(col("qv"), col("v")), col("qn"), col("nrm"))
          .as("cos_sim"))
      .groupBy(col("q_id"), col("qlbl").as("label"))
      .agg(
        min(when(col("lbl") === col("qlbl"),
          struct(col("cos_sim").as("c"), col("n_id").as("i")))).as("p"),
        max(when(col("lbl") =!= col("qlbl"),
          struct(col("cos_sim").as("c"), (-col("n_id")).as("ni"))))
          .as("ng"))
      .select(col("q_id"), col("label"),
        col("p.i").as("pos_id"), col("p.c").as("pos_cos"),
        (-col("ng.ni")).as("neg_id"), col("ng.c").as("neg_cos"),
        (col("p.c") - col("ng.c") < lit(margin)).as("violated"))
  }
}
