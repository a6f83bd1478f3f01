package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval — the lexical complement to the vector-ANN
  * family (the `graft.similarity` package): top-k documents per
  * keyword query, scored
  * by term-frequency saturation × rarity. A training-data pipeline
  * uses exactly this for corpus inspection ("show me the docs these
  * terms live in"), targeted curation sweeps, and the lexical half of
  * hybrid retrieval.
  *
  * Two deliberate deviations from textbook BM25, both forced by the
  * engine's bit-reproducibility bar and both documented trades:
  *
  *   - '''rational idf''' `(N − df + 0.5) / (df + 0.5)` instead of its
  *     log: `ln` is not correctly rounded in either engine's libm, so
  *     a log score could never hash-verify (the [[TfIdf]] precedent).
  *     Rankings agree with log-BM25 for single-term queries exactly
  *     (log is monotone) and closely for multi-term queries (the log
  *     damps rare-term dominance; the rational form lets the rarest
  *     term weigh more).
  *   - '''fixed-point score sums''': the per-term score quantizes to
  *     `floor(s · 2^20)` BEFORE the per-(query, doc) sum, so the
  *     distributed aggregation adds exact integers (order-independent
  *     — a raw double sum would vary with partial-aggregation order).
  *     The reported score divides back by 2^20 (a power of two —
  *     exact), so quantization error is bounded by terms · 2^-20.
  *
  * Scale shape: one postings-scale aggregate to (doc, term, tf); df
  * and doc length derive from it (df is a term-keyed aggregate, dl an
  * exact long sum per doc — no second corpus scan); the query-term
  * relation and the 1-row (N, avgdl) stats frame broadcast; the only
  * corpus-scale join is postings ⋈ query-terms on the term key
  * (at 100 TB: bucket the postings table by term and it never
  * shuffles again — [[graft.sources.Bucketing]]); the final top-k is
  * a partial+final WindowGroupLimit.
  */
object Bm25 {

  private val ScoreScale = (1L << 20).toDouble

  /** Top `k` docs per query. `queryTerms`: (q_id, term) rows — a query
    * scores the sum of its terms' BM25 contributions. Output:
    * (q_id, rank, doc_id, score) — score is the quantized BM25 sum
    * scaled back to double; docs sharing no term with a query are
    * absent (at scale that is almost all of them).
    */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // (doc_id, term, tf) — the inverted index with frequencies; feeds
    // df, dl AND the scoring join (callers release the cache via
    // catalog.clearCache() like the other multi-consumer operators)
    val perDocTerm = postings(docs, idCol, textCol).persist()
    val df = perDocTerm.groupBy("term").agg(count(lit(1)).as("df"))
    score(perDocTerm, queryTerms.join(df, "term"),
      docLengths(perDocTerm), corpusStats(docs, perDocTerm), k, k1, b)
  }

  /** [[topDocs]] with the gate/harness query set derived IN-PLAN from
    * the corpus: one postings aggregate feeds term totals (the query
    * ranking), df (riding the SAME term-keyed aggregate — a second
    * corpus-wide df shuffle would serve only the broadcast side), dl,
    * stats, and the scoring join. Result-identical to
    * `topDocs(docs, …, rankedQueryTerms(docs, …), k)`, which tokenizes
    * and aggregates the corpus twice (spec-asserted equal).
    */
  def topDocsDerivedQueries(docs: DataFrame, idCol: String, textCol: String,
      firstRank: Int, nQueries: Int, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val perDocTerm = postings(docs, idCol, textCol).persist()
    val termStats = perDocTerm.groupBy("term")
      .agg(sum("tf").as("n"), count(lit(1)).as("df"))
    val qdf = rankTerms(termStats, firstRank, nQueries)
      .select(col("q_id"), col("term"), col("df"))
    score(perDocTerm, qdf, docLengths(perDocTerm),
      corpusStats(docs, perDocTerm), k, k1, b)
  }

  /** (doc_id, term, tf) over the whitespace tokens — the inverted
    * index with frequencies, the one postings-scale aggregate every
    * BM25 face starts from.
    */
  private def postings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  private def docLengths(perDocTerm: DataFrame): DataFrame =
    perDocTerm.groupBy("doc_id").agg(sum("tf").as("dl"))

  /** N counts ALL documents (token-less docs contribute to the
    * average's denominator); total tokens is an exact long sum.
    */
  private def corpusStats(docs: DataFrame, perDocTerm: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(perDocTerm.agg(sum("tf").as("total_tokens")))
      .select(col("n_docs"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avgdl"))

  /** The scoring tail shared by [[topDocs]] and the served-index path:
    * postings ⋈ broadcast `qdf` (query terms WITH their df) on the
    * term key, doc lengths and the 1-row stats frame joined in,
    * quantized sums, per-query top-k.
    */
  private def score(perDocTerm: DataFrame, qdf: DataFrame, dl: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double): DataFrame =
    scoreTail(perDocTerm
      .join(broadcast(qdf), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)), k, k1, b)

  /** The scoring tail over a frame already carrying `dl` per posting
    * row ([[Bm25Table]]'s denormalized layout): no doc-keyed join at
    * all — the one scale difference from [[scoreIndexed]]'s separate
    * doclen relation.
    */
  private[text] def scoreDenorm(perDocTermDl: DataFrame, qdf: DataFrame,
      stats: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    scoreTail(perDocTermDl
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats)), k, k1, b)

  private def scoreTail(joined: DataFrame, k: Int, k1: Double,
      b: Double): DataFrame = {
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    // literal constants are interpolated into the oracle SQL from the
    // SAME Scala doubles (shortest-roundtrip toString), so e.g.
    // k1 + 1 = 2.1999999999999997 is the identical double both sides —
    // re-deriving it from a "2.2" SQL literal would NOT be
    val sat = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    val scored = joined
      .select(col("q_id"), col("doc_id"),
        floor((idf * sat) * lit(ScoreScale)).cast("bigint").as("sq"))
      .groupBy("q_id", "doc_id").agg(sum("sq").as("score_q"))
    val w = Window.partitionBy("q_id").orderBy(desc("score_q"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"),
        (col("score_q") / lit(ScoreScale)).as("score"))
  }

  /** The scoring tail over externally-supplied index frames — the
    * public face [[Bm25Table]] serves through (same bit-reproducible
    * arithmetic as every other entry point): `perDocTerm` =
    * (doc_id, term, tf) postings (may be file-pruned to the query
    * terms — extra terms are harmless, the qdf join cuts them), `qdf`
    * = query terms WITH their df, `dl` = (doc_id, dl), `stats` = the
    * 1-row (n_docs, avgdl) frame.
    */
  def scoreIndexed(perDocTerm: DataFrame, qdf: DataFrame, dl: DataFrame,
      stats: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    score(perDocTerm, qdf, dl, stats, k, k1, b)

  /** Persist the retrieval model as catalog tables — the inverted
    * index a recurring query workload reads instead of re-tokenizing
    * the corpus per batch (the postings aggregate IS the expensive
    * stage — the rest is query-side-small): `<table>_postings`
    * (doc_id, term, tf) bucketed by the term join key,
    * `<table>_df` by term, `<table>_dl` by doc_id, and the 1-row
    * `<table>_stats` (n_docs, avgdl — doubles round-trip parquet
    * exactly). One write-time shuffle each, amortized over every
    * later query batch ([[graft.sources.Bucketing]]).
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, numBuckets: Int = 32): Unit = {
    val perDocTerm = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    graft.sources.Bucketing.writeBucketed(
      perDocTerm, s"${table}_postings", "term", numBuckets)
    graft.sources.Bucketing.writeBucketed(
      perDocTerm.groupBy("term").agg(count(lit(1)).as("df")),
      s"${table}_df", "term", numBuckets)
    graft.sources.Bucketing.writeBucketed(
      perDocTerm.groupBy("doc_id").agg(sum("tf").as("dl")),
      s"${table}_dl", "doc_id", numBuckets)
    // total_tokens rides along so incremental maintenance can fold in
    // a batch with exact integer arithmetic (avgdl alone would force a
    // lossy total = avgdl × n reconstruction)
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(perDocTerm.agg(sum("tf").as("total_tokens")))
      .select(col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs")).as("avgdl"))
      .write.mode("overwrite").saveAsTable(s"${table}_stats")
    perDocTerm.unpersist(blocking = false)
  }

  /** Fold a document batch into a [[writeIndex]]-persisted model —
    * the lexical sibling of `IvfPq.appendToIndex` (same contract:
    * batch ids disjoint from the indexed corpus). Postings and dl
    * rows APPEND with the standing bucket spec; df and the 1-row
    * stats fold the batch deltas into a `localCheckpoint`'d snapshot
    * of the standing tables (lineage cut so the overwrite may read
    * its own table — the Scd2Stream discipline). Cost per batch is
    * batch + vocabulary scale; the corpus-scale postings are never
    * re-scanned. Append-then-serve ≡ index-the-union (spec'd).
    */
  def appendToIndex(batch: DataFrame, idCol: String, textCol: String,
      table: String, numBuckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    val perDocTerm = postings(batch, idCol, textCol).persist()
    perDocTerm.write.bucketBy(numBuckets, "term").sortBy("term")
      .mode("append").saveAsTable(s"${table}_postings")
    docLengths(perDocTerm).write.bucketBy(numBuckets, "doc_id")
      .sortBy("doc_id").mode("append").saveAsTable(s"${table}_dl")
    val oldDf = spark.table(s"${table}_df").localCheckpoint()
    graft.sources.Bucketing.writeBucketed(
      oldDf.unionByName(
          perDocTerm.groupBy("term").agg(count(lit(1)).as("df")))
        .groupBy("term").agg(sum("df").as("df")),
      s"${table}_df", "term", numBuckets)
    val oldStats = spark.table(s"${table}_stats").localCheckpoint()
    oldStats
      .crossJoin(broadcast(batch.agg(count(lit(1)).as("_bn"))
        .crossJoin(perDocTerm.agg(
          coalesce(sum("tf"), lit(0L)).as("_bt")))))
      .select((col("n_docs") + col("_bn")).as("n_docs"),
        (col("total_tokens") + col("_bt")).as("total_tokens"))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs"))
      .write.mode("overwrite").saveAsTable(s"${table}_stats")
    perDocTerm.unpersist(blocking = false)
  }

  /** [[topDocs]] against a [[writeIndex]]-persisted model: no corpus
    * scan, no tokenization — the plan contains no Generate at all
    * (spec-asserted), only the scoring joins over the index tables.
    */
  def topDocsIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, queryTerms: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    score(spark.table(s"${table}_postings"),
      queryTerms.join(spark.table(s"${table}_df"), "term"),
      spark.table(s"${table}_dl"), spark.table(s"${table}_stats"),
      k, k1, b)

  /** Deterministic corpus-derived query set for harness/gate use:
    * terms ranked `firstRank .. firstRank + 2·nQueries − 1` by global
    * frequency (count desc, term asc — skipping the top ranks skips
    * the stopword plateau), paired off two terms per query:
    * (q_id = 0 .. nQueries−1, term).
    */
  def rankedQueryTerms(docs: DataFrame, idCol: String, textCol: String,
      firstRank: Int, nQueries: Int): DataFrame =
    rankTerms(
      docs.select(explode(words(col(textCol))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("n")),
      firstRank, nQueries)
      .select(col("q_id"), col("term"))

  /** The rank-and-pair-off tail of [[rankedQueryTerms]], over any
    * (term, n, …) frame: global TakeOrdered cut first (distributed
    * top-m heap — the text_vocab discipline), THEN the
    * single-partition rank window over the ≤ firstRank + 2·nQueries
    * surviving rows. Extra input columns pass through.
    */
  private def rankTerms(termCounts: DataFrame, firstRank: Int,
      nQueries: Int): DataFrame = {
    val top = termCounts
      .orderBy(desc("n"), asc("term"))
      .limit(firstRank + 2 * nQueries - 1)
    val w = Window.orderBy(desc("n"), asc("term"))
    top.withColumn("r", row_number().over(w))
      .filter(col("r") >= firstRank)
      .withColumn("q_id", floor((col("r") - lit(firstRank)) / lit(2)))
  }
}
