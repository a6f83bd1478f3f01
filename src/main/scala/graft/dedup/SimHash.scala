package graft.dedup

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection.
  *
  * Each document gets a `bits`-wide signature: bit k is the sign of
  * Σ_shingles (±1), +1 when bit k of the shingle's 32-bit hash is set.
  * Similar documents share most shingles, so their signatures differ in
  * few bits; near-dup search becomes hamming distance ≤ d.
  *
  * Scale shapes:
  *   - the signature is ONE hash aggregate over the exploded
  *     (doc, shingle-hash) postings: md5 runs once per posting, the 32
  *     per-bit ±1 sums partial-aggregate map-side, and the shuffle
  *     carries one row per document. (The tempting zero-shuffle form —
  *     32 `aggregate` folds over a per-row hash array — gets the md5
  *     transform re-inlined into all 32 folds by CollapseProject and
  *     measured 30× slower at sf0.1.)
  *   - pairing uses byte banding, which is EXACT for the default d=3:
  *     3 differing bits can touch at most 3 of the 4 signature bytes, so
  *     by pigeonhole every pair within distance 3 shares at least one
  *     full byte — the self-join on (byte_id, byte_val) misses nothing
  *     and never goes all-pairs.
  */
object SimHash {

  val Bits = 32
  val BandBytes = 4

  /** (doc_id, simhash) frame for a text column. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val posts = docs.select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), shingleSize)).as("sh"))
      .select(col("doc_id"), hash32(col("sh")).as("hv"))
    val bitSums = (0 until Bits).map(k =>
      sum(when(shiftright(col("hv"), k) % 2L === 1L, 1L).otherwise(-1L))
        .as(s"s$k"))
    val sig = (0 until Bits)
      .map(k => when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    posts.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** Pairs (doc_a < doc_b) with hamming(simhash) <= maxDistance, found
    * via byte banding (exact for maxDistance <= BandBytes-1).
    */
  def nearDuplicatePairs(signatures: DataFrame, maxDistance: Int = 3): DataFrame = {
    require(maxDistance < BandBytes,
      s"byte banding is only exact for distance < $BandBytes")
    val bytes = signatures.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until BandBytes).map(j =>
          shiftright(col("simhash"), 8 * j) % 256): _*))
          .as(Seq("byte_id", "byte_val")))
    val a = bytes.as("a")
    val b = bytes.as("b")
    a.join(b,
        col("a.byte_id") === col("b.byte_id") &&
          col("a.byte_val") === col("b.byte_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
