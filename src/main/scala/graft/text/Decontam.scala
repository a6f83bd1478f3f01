package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
        explode(wordShingles(words(col(textCol)), n)).as("gram"))
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
}
