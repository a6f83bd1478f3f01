package graft.dedup

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard duplicate pairs via an inverted shingle index.
  *
  * The classic "similarity join without LSH": explode (doc, shingle),
  * self-join on the shingle (pairs sharing at least one shingle),
  * count shared shingles per pair, then Jaccard from the per-doc set
  * sizes. Exact — no probabilistic recall — at the cost of fanout
  * proportional to Σ_shingle df(shingle)²; prefer [[MinHashLSH]] when
  * shingle document-frequencies are unbounded. `maxShingleDocFreq`
  * optionally drops ubiquitous shingles (boilerplate) to bound the
  * fanout at scale; pairs supported only by dropped shingles are then
  * missed — a documented recall trade, off by default.
  *
  * Shuffle hygiene: the self-join key is a 60-bit md5 prefix of the
  * shingle, not the shingle text — fixed 8-byte shuffle keys and O(1)
  * comparisons regardless of shingle length. Two shingles colliding
  * would merge in the intersection counts; at 60 bits that needs ~10⁹
  * distinct shingles per corpus before a single expected collision
  * (and the oracle hashes identically, so verification is unaffected
  * either way).
  */
object NgramJaccard {

  /** (doc_id, sh) hashed distinct-shingle postings — the inverted
    * index both the resemblance and containment faces self-join.
    */
  private[dedup] def hashedShingles(docs: DataFrame, idCol: String,
      textCol: String, shingleSize: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), shingleSize)).as("sh0"))
      .select(col("doc_id"), md5PrefixLong(col("sh0"), 15).as("sh"))

  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8,
      maxShingleDocFreq: Option[Long] = None): DataFrame = {
    // persisted: the postings feed both self-join sides (plus the size
    // aggregate) — without the cache each branch re-runs the shingle
    // projection, tripling the query cost (see MinHashLSH note)
    val posts0 = hashedShingles(docs, idCol, textCol, shingleSize).persist()
    val sizes = posts0.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val posts = maxShingleDocFreq.fold(posts0) { cap =>
      val keep = posts0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("sh")
      posts0.join(keep, "sh")
    }
    val a = posts.as("a")
    val b = posts.as("b")
    val inter = a.join(b,
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val na = sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))
    val nb = sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))
    inter.join(na, "doc_a").join(nb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** DIRECTED containment pairs (Broder's containment, not
    * resemblance): c(A→B) = |A∩B| / |A| over distinct shingle sets —
    * "A's content is mostly inside B". Catches what Jaccard
    * structurally cannot: a short document quoted whole inside a much
    * longer one has containment ≈ 1 while its resemblance
    * |A∩B|/|A∪B| is tiny (diluted by B's extra content) — the
    * aggregator-page / quotation case a dedup pipeline wants flagged
    * separately from near-clones.
    *
    * Same inverted-index self-join shape (and scale posture) as
    * [[nearDuplicatePairs]]; output is directed, so a mutual-subset
    * pair appears in both orientations. The single integer division
    * is one IEEE op — bit-identical across engines.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8,
      maxShingleDocFreq: Option[Long] = None): DataFrame = {
    val posts0 = hashedShingles(docs, idCol, textCol, shingleSize).persist()
    // the denominator |A| stays the FULL set size — the cap prunes
    // candidate generation (boilerplate fanout), not the score's
    // meaning; pairs supported only by capped shingles are missed,
    // the same documented recall trade as the resemblance face
    val sizes = posts0.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val posts = maxShingleDocFreq.fold(posts0) { cap =>
      val keep = posts0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("sh")
      posts0.join(keep, "sh")
    }
    val inter = posts.as("a").join(posts.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("na")).as("containment"))
      .filter(col("containment") >= threshold)
  }
}
