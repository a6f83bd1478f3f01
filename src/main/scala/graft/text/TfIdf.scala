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

  /** (stratum, rank, term, score) — top `k` terms per stratum value.
    * Precondition: one row per `idCol` value in `docs` (the stratum is
    * an attribute of the document) — the df count below relies on it.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, k: Int): DataFrame = {
    // ONE token-scale shuffle: the raw postings aggregate straight to
    // distinct (stratum, term, doc_id) occurrence counts (map-side
    // combined), and BOTH measures derive from that far smaller frame —
    // tf as the exact long sum of per-doc counts, df as the distinct
    // doc count. The previous shape shuffled the postings twice (tf
    // groupBy + the df `distinct`), and the distinct pass combined
    // almost nothing map-side because (doc, term) pairs are near-unique.
    val perDoc = docs.select(col(idCol).as("doc_id"),
        col(strataCol).as("stratum"),
        explode(words(col(textCol))).as("term"))
      .groupBy("stratum", "term", "doc_id").agg(count(lit(1)).as("c"))
      .persist() // feeds tf + df
    val tf = perDoc.groupBy("stratum", "term").agg(sum("c").as("tf"))
    // perDoc is DISTINCT in (stratum, term, doc_id) by construction,
    // and each doc row carries one stratum, so rows per term ARE the
    // distinct docs per term: count(*) == count_distinct(doc_id)
    // without the second (term, doc_id)-keyed exchange Spark plans for
    // a distinct aggregate (r16).
    val df = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
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
