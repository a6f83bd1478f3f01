package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination — the training-data hygiene pass that
  * finds corpus documents overlapping an evaluation/benchmark set, so
  * they can be dropped before training (exact n-gram overlap, the
  * method used for public LLM corpora).
  *
  * Shape, chosen for the 100 TB case: the benchmark side is TINY
  * relative to the corpus (thousands of eval documents vs billions of
  * training documents), so its distinct n-gram set is collected into a
  * BROADCAST hash relation — the corpus-side postings stream joins
  * against it map-side with no shuffle of the big side at all. The
  * only shuffle is the per-document overlap count aggregation
  * (partial+final, one row per contaminated doc).
  *
  * Both sides distinct their (doc, gram) postings before the join, so
  * `shared_grams` counts DISTINCT contaminated n-grams — a document
  * repeating one benchmark phrase 50 times scores 1, not 50.
  */
object Decontam {

  /** Per-training-document overlap with the benchmark set: documents
    * sharing at least one n-gram, with their distinct shared-gram count
    * and a 0/1 contamination verdict at `minSharedGrams`.
    *
    * Output: (doc_id, shared_grams, contaminated) — docs with zero
    * overlap are absent (at scale that is almost everything; emitting
    * them would mean an outer join against the full corpus for rows
    * carrying only zeros).
    */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minSharedGrams: Int = 5): DataFrame = {
    def postings(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), n)).as("gram"))
    // wordShingles distincts per document already; distinct-ing the
    // union of eval docs' grams shrinks the broadcast relation.
    val evalGrams = postings(eval).select("gram").distinct()
    postings(train)
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_grams"))
      .select(col("doc_id"), col("shared_grams"),
        when(col("shared_grams") >= minSharedGrams, 1).otherwise(0)
          .cast("int").as("contaminated"))
  }

  /** [[overlap]] with the overlap expressed as a FRACTION of the
    * document's distinct n-grams — the leakage measurement form (an
    * absolute shared-gram floor means different things for a tweet and
    * a book; eval-set policies are usually "drop if ≥ X% of the doc is
    * benchmark text"). Zero extra shuffles vs [[overlap]]: the
    * denominator rides each posting row as a constant-per-doc column
    * (`size` of the already-distinct shingle array), so the per-doc
    * aggregate picks it up with `max` instead of joining back against
    * the corpus.
    *
    * Output: (doc_id, shared_grams, total_grams, contaminated_frac) —
    * zero-overlap docs absent, as in [[overlap]].
    */
  def overlapFraction(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val tposts = train
      .select(col(idCol).as("doc_id"),
        textShingles(col(textCol), n).as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("bigint").as("total"),
        explode(col("grams")).as("gram"))
    val evalGrams = eval
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), n)).as("gram"))
      .select("gram").distinct()
    tposts
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_grams"), max("total").as("total_grams"))
      .select(col("doc_id"), col("shared_grams"), col("total_grams"),
        (col("shared_grams").cast("double") / col("total_grams"))
          .as("contaminated_frac"))
  }

  /** [[overlap]] for eval sets too large to broadcast as strings: a
    * Bloom filter over the eval grams prefilters the corpus postings,
    * then an exact gram join verifies the tiny surviving fraction —
    * same exact result (false positives die in the verify join; Bloom
    * filters have no false negatives).
    *
    * Why this is the 100 TB shape: a 100M-gram eval set is gigabytes
    * as a broadcast string relation but ~10 bits/element as a Bloom
    * filter, and the filter is embedded as a plan literal evaluated by
    * Spark's own codegen'd `BloomFilterMightContain` (the expression
    * behind AQE runtime filters) INSIDE the corpus scan's projection —
    * so the corpus-side row stream entering the verify join is already
    * down to true-overlap + fpp·grams. The verify join carries no
    * broadcast hint: at that size Spark shuffles only the survivors
    * (AQE still auto-broadcasts when the eval side turns out small).
    *
    * The filter is built distributedly (`stat.bloomFilter` is a
    * treeAggregate) over `xxhash64(gram)` — the same hash
    * `BloomFilterMightContain` applies at probe time, so put/probe
    * agree. Driver holds one filter of bounded size (like the
    * broadcast in [[overlap]]), never the gram strings.
    */
  def overlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minSharedGrams: Int = 5,
      fpp: Double = 0.01): DataFrame = {
    def postings(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), n)).as("gram"))
    // the eval gram set drives three consumers (sizing count, filter
    // build, verify join) — persist it once; callers release it via
    // catalog.clearCache() like the other multi-action operators
    val evalGrams = postings(eval).select("gram").distinct().persist()
    val hashed = evalGrams.select(xxhash64(col("gram")).as("h"))
    val expectedItems = math.max(1L, evalGrams.count())
    val bf = hashed.stat.bloomFilter("h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(xxhash64(col("gram")))))
    postings(train)
      .filter(mightContain)
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_grams"))
      .select(col("doc_id"), col("shared_grams"),
        when(col("shared_grams") >= minSharedGrams, 1).otherwise(0)
          .cast("int").as("contaminated"))
  }
}
