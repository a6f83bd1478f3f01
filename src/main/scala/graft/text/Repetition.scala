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
    * TextFeatures.wordShingles]] distincts — here the duplicates ARE
    * the signal). Empty array for docs shorter than 2 words.
    */
  private def bigrams(text: Column): Column = {
    val w = TextFeatures.words(text)
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

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
