package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Characteristic-terms extraction: per-stratum (e.g. per-source) top-k
  * terms by a TF-IDF-style score — the corpus-exploration operator a
  * curation pipeline uses to see WHAT each slice contains.
  *
  * Scoring uses the log-free rational form `tf · N / df` (one exact
  * integer product, one double division), NOT `tf · log(N/df)`:
  * rankings are identical for fixed N (log is monotone), but the
  * rational form is bit-reproducible across engines — `ln` is not
  * correctly-rounded in either engine's libm, so a log-based score
  * could not be hash-verified. At 100 TB the shape is three shuffles
  * (tf groupBy, df groupBy, term join), all on term/stratum keys with
  * map-side partial aggregation, and the final per-stratum top-k runs
  * as partial+final WindowGroupLimit.
  */
object TfIdf {

  /** (stratum, rank, term, score) — top `k` terms per stratum value. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, k: Int): DataFrame = {
    val posts = docs.select(col(idCol).as("doc_id"), col(strataCol).as("stratum"),
        explode(words(col(textCol))).as("term"))
      .persist() // feeds tf + df
    val tf = posts.groupBy("stratum", "term").agg(count(lit(1)).as("tf"))
    val df = posts.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_total"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("stratum"), col("term"),
        // multiply in DOUBLE: a long tf*N wraps silently past 2^63 at
        // extreme corpus sizes; the double product just loses ulps
        ((col("tf").cast("double") * col("n_total").cast("double"))
          / col("df")).as("score"))
    val w = Window.partitionBy("stratum").orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("stratum", "rank", "term", "score")
  }
}
