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

  private def prep(vectors: DataFrame, idCol: String, vecCol: String,
      cfg: HyperplaneLSH.Config): DataFrame =
    vectors.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .withColumn("bucket", HyperplaneLSH.bucketExpr(col("v"), cfg))

  def nearDuplicatePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double,
      cfg: HyperplaneLSH.Config = HyperplaneLSH.Config()): DataFrame = {
    val prepared = prep(vectors, idCol, vecCol, cfg)
    val a = prepared.as("a")
    val b = prepared.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        cosineWithNorms(dot(col("a.v"), col("b.v")),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Incremental (cross-snapshot) variant — the embedding-space face of
    * [[IncrementalDedup]]: NEW batch vectors screened against the
    * standing corpus's bucket index. The corpus side's (vid, v, nrm,
    * bucket) projection is exactly what a production pipeline persists
    * once (bucket assignment is a zero-shuffle projection, so the
    * artifact is cheap to build but saves re-reading the corpus
    * embeddings per ingest batch when bucketed by `bucket` on disk).
    *
    * Output: (vec_new, vec_old, cos_sim) for every batch/corpus pair
    * sharing a bucket with cosine ≥ threshold. No `<` id constraint —
    * the relations are distinct sides, every qualifying pair reports.
    */
  def incrementalPairs(corpus: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, threshold: Double,
      cfg: HyperplaneLSH.Config = HyperplaneLSH.Config()): DataFrame =
    screen(prep(batch, idCol, vecCol, cfg).as("b"),
      prep(corpus, idCol, vecCol, cfg).as("c"), threshold)

  private def screen(b: DataFrame, c: DataFrame,
      threshold: Double): DataFrame =
    b.join(c, col("b.bucket") === col("c.bucket"))
      .select(col("b.vid").as("vec_new"), col("c.vid").as("vec_old"),
        cosineWithNorms(dot(col("b.v"), col("c.v")),
          col("b.nrm"), col("c.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)

  /** Persist the corpus bucket index as a BUCKETED catalog table — the
    * durable form of the staging-table advice above, and the
    * embedding-space sibling of [[IncrementalDedup.writeIndex]].
    * bucketBy("bucket") pins corpus rows to their screen-join key at
    * write time, so a recurring ingest screen reads the corpus ALREADY
    * partitioned: even when the batch side outgrows broadcast (the SMJ
    * regime), only the batch shuffles — the corpus never moves again
    * (plan-spec'd in EmbeddingNearDupSpec).
    */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
      table: String, cfg: HyperplaneLSH.Config = HyperplaneLSH.Config(),
      numBuckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      prep(corpus, idCol, vecCol, cfg), table, "bucket", numBuckets)

  /** [[incrementalPairs]] against a [[writeIndex]]-persisted corpus. */
  def incrementalPairsIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double,
      cfg: HyperplaneLSH.Config = HyperplaneLSH.Config()): DataFrame =
    screen(prep(batch, idCol, vecCol, cfg).as("b"),
      spark.table(table).as("c"), threshold)
}
