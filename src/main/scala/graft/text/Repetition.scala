package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition metrics — the Gopher/RefinedWeb-style
  * quality signals that catch boilerplate and degenerate (looping)
  * text: how concentrated a document's word bigrams are.
  *
  * The per-document histogram is computed DISTRIBUTED — bigrams explode
  * inline (no named-array generator, see SURVEY §9) into (doc, gram)
  * rows, aggregate map-side to (doc, gram, n), then roll up per doc —
  * never a per-row O(grams²) higher-order-function scan, which would
  * evaluate interpreted and quadratic on long documents.
  *
  * Output per doc: n_2grams (total), n_distinct_2grams, top_2gram_n
  * (count of the most frequent bigram), top_2gram_frac (single IEEE
  * division — bit-identical cross-engine; 0.0 for docs with < 2
  * words).
  */
object Repetition {

  /** All word bigrams, order-preserved, duplicates kept ([[
    * TextFeatures.textShingles]] distincts — here the duplicates ARE
    * the signal). Empty array for docs shorter than 2 words. Native
    * one-scan form ([[TextFeatures.textGrams]]); the DuckDB oracle
    * keeps the HOF formulation, re-proving the equivalence per round.
    */
  private def bigrams(text: Column): Column =
    TextFeatures.textGrams(text, 2)

  def metrics(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode_outer(bigrams(col(textCol))).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(col("gram")).as("n"))
      .groupBy(col("doc_id"))
      .agg(
        coalesce(sum(col("n")), lit(0L)).cast("bigint").as("n_2grams"),
        count(col("gram")).as("n_distinct_2grams"),
        coalesce(max(col("n")), lit(0L)).cast("bigint").as("top_2gram_n"))
      .withColumn("top_2gram_frac",
        when(col("n_2grams") > 0,
          col("top_2gram_n").cast("double") / col("n_2grams"))
          .otherwise(lit(0.0d)))
}
