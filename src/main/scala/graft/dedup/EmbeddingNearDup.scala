package graft.dedup

import graft.similarity.Cosine._
import graft.similarity.HyperplaneLSH
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space near-duplicate pairs: vectors whose cosine
  * similarity reaches `threshold`, searched WITHIN hyperplane-LSH
  * buckets — the semantic-dedup complement to the token-based
  * [[MinHashLSH]] (catches paraphrases exact shingles miss).
  *
  * Scale shape mirrors the other LSH dedups: bucket assignment is a
  * zero-shuffle projection, the self-join shuffles on the small bucket
  * id, and no all-pairs comparison ever happens. Recall follows the
  * signed-random-projection bound (P[pair shares a bucket] =
  * (1-θ/π)^planes); fewer planes = higher recall = bigger buckets.
  */
object EmbeddingNearDup {

  def nearDuplicatePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double,
      cfg: HyperplaneLSH.Config = HyperplaneLSH.Config()): DataFrame = {
    val prepared = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("bucket", HyperplaneLSH.bucketExpr(col("v"), cfg))
    val a = prepared.as("a")
    val b = prepared.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        cosineWithNorms(dot(col("a.v"), col("b.v")),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
