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
      k: Int = 100,
      mode: TokenCount.Mode = TokenCount.Ascii): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        explode(TokenCount.tokens(col(textCol), mode)).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
    val top = perDoc
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
    // rank windows only the k survivors; the non-foldable constant
    // partition key keeps it single-partition BY DESIGN without the
    // per-run WindowExec warning (see SeqPack.packPlan)
    top.withColumn("rnk",
        row_number().over(
          Window.partitionBy(col("n_occurrences") * lit(0L))
            .orderBy(col("n_occurrences").desc, col("token")))
          .cast("bigint"))
      .select(col("rnk"), col("token"), col("n_docs"), col("n_occurrences"))
  }

  /** Tokenizer-apply: encode every document's token stream into vocab
    * ids (rank in the top-`k` table; 0 = out-of-vocabulary), the step
    * that turns a curated corpus into model-ready id sequences.
    *
    * Shape for a 100 TB corpus — the corpus side NEVER shuffles:
    * the ranked vocabulary (k rows, bounded by construction) collapses
    * to a ONE-ROW token→id map which cross-joins back in broadcast
    * form, so encoding is a pure per-row projection
    * (`transform` + map lookup) over the corpus scan. Contrast with
    * the explode/join/re-aggregate formulation, which would shuffle
    * every (doc, pos, token) posting twice just to reassemble order.
    * The id sequence is emitted as a space-joined string — the
    * cross-engine-stable wire form (and what a shard writer would
    * emit); `n_tokens`/`n_oov` ride along for coverage tracking.
    *
    * Output: (doc_id, token_ids, n_tokens, n_oov), empty docs kept
    * with token_ids = ''.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val vmap = topTokens(docs, idCol, textCol, k)
      .agg(map_from_entries(collect_list(struct(col("token"), col("rnk"))))
        .as("__vmap"))
    docs
      .crossJoin(broadcast(vmap))
      // null text must land as ('', 0, 0), not (null, null, null) —
      // transform/size/array_join all propagate a null array
      .withColumn("__ids",
        transform(TokenCount.tokens(coalesce(col(textCol), lit(""))),
          t => coalesce(element_at(col("__vmap"), t), lit(0L))))
      .select(
        col(idCol).as("doc_id"),
        array_join(transform(col("__ids"), _.cast("string")), " ")
          .as("token_ids"),
        size(col("__ids")).cast("bigint").as("n_tokens"),
        size(filter(col("__ids"), _ === 0L)).cast("bigint").as("n_oov"))
  }

  /** [[encode]] through the native codegen'd
    * [[graft.expressions.EncodeTokens]] expression (the
    * [[LmScore.scoreFast]] design): the bounded vocabulary is
    * collected once at plan build — the same driver-side class as a
    * broadcast — and the id string plus both counters build in ONE
    * generated loop with O(1) hash lookups, vs four interpreted HOF
    * passes with a LINEAR vocabulary scan per `element_at` in the
    * declarative form. Bit-identical output (spec'd; the encode oracle
    * re-proves it per round).
    */
  def encodeFast(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val vocab = topTokens(docs, idCol, textCol, k)
      .select(col("token"), col("rnk")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = col("__e")
    docs
      .withColumn("__e", graft.expressions.EncodeTokens(
        TokenCount.tokens(coalesce(col(textCol), lit(""))), vocab))
      .select(
        col(idCol).as("doc_id"),
        e.getField("token_ids").as("token_ids"),
        e.getField("n_tokens").as("n_tokens"),
        e.getField("n_oov").as("n_oov"))
  }

  /** Vocabulary coverage per group: (group, n_tokens, n_oov, oov_rate)
    * — what share of each source/feed's token mass a `k`-entry
    * vocabulary fails to cover. The vocab-sizing audit: a feed whose
    * OOV rate is an outlier is code, a different language, or
    * gibberish, and will fragment badly under a tokenizer built at
    * this k. One corpus tokenize + one map-side-combined (group)
    * aggregate; the vocab rides a broadcast membership join
    * ([[encode]]'s bounded-model discipline); `oov_rate` is a single
    * IEEE division.
    */
  def coverageBy(docs: DataFrame, groupCol: String, textCol: String,
      idCol: String, k: Int = 100): DataFrame = {
    val toks = docs.select(col(groupCol).as("grp"),
      explode(TokenCount.tokens(coalesce(col(textCol), lit(""))))
        .as("token"))
    val vocab = topTokens(docs, idCol, textCol, k)
      .select(col("token"), lit(1).as("__hit"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }
}
