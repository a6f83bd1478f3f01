package graft.text

import graft.dedup.NgramJaccard
import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair construction: (anchor, positive,
  * negative) triplets for embedding-model training — positives are
  * verified near-duplicate partners, negatives are deterministic
  * pseudo-random draws from the corpus with accidental positives
  * excluded.
  *
  * Determinism is the design constraint (retries, backfills, and the
  * oracle all need the same triplets): negative slots derive from
  * md5(anchor:slot) → bucket, candidates from md5(doc) → bucket, and
  * the winner per slot is the arg-min of md5(anchor:slot:candidate) —
  * rendezvous hashing, so the pick is stable under any partitioning
  * and independent of corpus order, and different anchors sharing a
  * bucket pick different (unbiased) winners.
  *
  * Shape at scale: the pair table comes from the inverted-index
  * similarity join (bounded by true near-dup count); the negative draw
  * joins anchor-slots to docs on `buckets` keys — size `buckets` to
  * O(parallelism × anchors/corpus ratio) so no bucket is a straggler;
  * the per-slot arg-min is a map-side-combinable aggregate.
  */
object TrainingPairs {

  /** One row per (anchor, positive, slot): (anchor, positive,
    * negative, slot, jaccard). Slots whose bucket holds no eligible
    * candidate are dropped (vanishingly rare when buckets ≪ corpus).
    */
  def contrastive(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8, negatives: Int = 2,
      buckets: Int = 16): DataFrame = {
    // sequence(0, k-1) counts DOWN for k < 1 (phantom slots 0 and -1)
    require(negatives >= 1, "need at least one negative slot")
    require(buckets >= 1, "need at least one draw bucket")
    // the pair table feeds BOTH the partner-exclusion set and the slot
    // fan-out — persist, or the similarity join runs twice; callers
    // release via catalog.clearCache() like the other multi-consumer
    // operators
    val pairs = NgramJaccard
      .nearDuplicatePairs(docs, idCol, textCol, shingleSize, threshold)
      .persist()
    // both orientations, to exclude accidental positives from draws
    val partners = pairs
      .select(col("doc_a").as("anchor"), col("doc_b").as("neg"))
      .unionByName(pairs.select(col("doc_b").as("anchor"),
        col("doc_a").as("neg")))
    val docBuckets = docs.select(col(idCol).as("neg"),
      pmod(md5PrefixLong(col(idCol).cast("string"), 15),
        lit(buckets.toLong)).as("bucket"))
    val slots = pairs
      .select(col("doc_a").as("anchor"), col("doc_b").as("positive"),
        col("jaccard"))
      .withColumn("slot",
        explode(sequence(lit(0L), lit(negatives - 1L))))
      .withColumn("bucket",
        pmod(md5PrefixLong(concat_ws(":",
          col("anchor").cast("string"), col("slot").cast("string")), 15),
          lit(buckets.toLong)))
    slots.join(docBuckets, "bucket")
      .filter(col("neg") =!= col("anchor") && col("neg") =!= col("positive"))
      .join(partners, Seq("anchor", "neg"), "left_anti")
      .groupBy(col("anchor"), col("positive"), col("slot"))
      .agg(
        min_by(col("neg"), md5(concat_ws(":", col("anchor").cast("string"),
          col("slot").cast("string"), col("neg").cast("string"))))
          .as("negative"),
        max(col("jaccard")).as("jaccard"))
      .select(col("anchor"), col("positive"), col("negative"), col("slot"),
        col("jaccard"))
  }
}
