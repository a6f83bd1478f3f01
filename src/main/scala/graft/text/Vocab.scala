package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level token vocabulary — the frequency table a tokenizer /
  * vocab-build step starts from, and the quickest corpus-drift summary
  * (compare two snapshots' top-k tables).
  *
  * Shape for a 100 TB corpus:
  *   1. explode [[TokenCount.tokens]] into (token, doc) rows and
  *      aggregate TWICE map-side-combined — first distinct (token, doc)
  *      for document frequency, then per-token totals; the shuffle
  *      carries distinct (token, doc) pairs, never raw occurrences;
  *   2. the global top-k runs as `orderBy(...).limit(k)` — Spark plans
  *      TakeOrderedAndProject: each task keeps its own k-row heap and
  *      the driver merges task winners, so no single reducer ever sees
  *      the full vocabulary;
  *   3. ranks are assigned AFTER the cut, windowing k rows, not the
  *      whole vocabulary.
  *
  * Ties break by token text, so the table is deterministic.
  */
object Vocab {

  /** Top-`k` tokens: (rnk, token, n_docs, n_occurrences), rank 1 =
    * most occurrences; ties by token ascending. (`rnk`, not `rank` —
    * the latter collides with the SQL window keyword in some engines.)
    */
  def topTokens(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        explode(TokenCount.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val top = perDoc
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
    top.withColumn("rnk",
        row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("token")))
          .cast("bigint"))
      .select(col("rnk"), col("token"), col("n_docs"), col("n_occurrences"))
  }
}
