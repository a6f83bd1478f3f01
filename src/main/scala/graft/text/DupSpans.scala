package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level duplicate-span detection — the span-granular
  * complement to whole-document dedup (D1–D5): find the maximal token
  * runs a document SHARES with other documents, so a pipeline can
  * excise repeated boilerplate/quotation spans instead of dropping
  * whole documents (the approach popularized for LLM corpora by
  * suffix-array substring dedup; this is its distributed,
  * postings-based formulation — a suffix array is a single sorted
  * in-memory structure, while k-gram postings shard over any cluster).
  *
  * Pipeline:
  *   1. every positioned k-token gram of every doc becomes a posting
  *      (doc_id, pos, gram_hash) — O(tokens) rows, 8-byte hashes;
  *   2. gram document frequency via a two-level aggregate (distinct
  *      (gram, doc) map-side, then count) — grams in ≥ `minDf` docs
  *      are "shared";
  *   3. postings of shared grams merge into maximal spans per doc with
  *      the gaps-and-islands window (pos - row_number), one shuffle by
  *      doc.
  *
  * All joins/aggs key on the 48-bit gram hash or the doc id — no
  * all-pairs stage, no driver-side state; a hash collision can at
  * worst mark one k-gram as spuriously shared (rate ≈ n_grams²/2⁴⁹ —
  * negligible below ~10¹² distinct grams; widen the prefix if ever
  * run above that).
  *
  * Reference scope note: the reference (find_datacol_diff.py) has no
  * text operators; engine extension (SURVEY §2.10).
  */
object DupSpans {

  /** Maximal cross-document duplicated spans per document.
    *
    * Output: (doc_id, span_start, span_end, span_tokens) — 1-based
    * token positions, inclusive; span_tokens = end - start + 1. A span
    * is a maximal run of positions whose k-grams each appear in ≥
    * `minDf` distinct documents (so every k-token window inside the
    * span is shared, but possibly with different partners — same
    * semantics as merging overlapping suffix-array matches).
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDf: Long = 2): DataFrame = {
    require(k >= 1, s"gram size must be positive, got $k")
    // inline generator (SURVEY §9): posexplode the native gram scan
    // ([[TextFeatures.textGrams]] — each positioned k-gram is a byte
    // slice of the lowered text; pos0 is the 0-based token start, so
    // pos0+1 is exactly the old 1-based position-sequence value), then
    // one md5 per posting — the gram string itself is never shuffled
    val posts = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextFeatures.textGrams(col(textCol), k))
          .as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        md5PrefixLong(col("g"), 12).as("gh"))
      .persist() // feeds the df aggregate AND the shared-gram join
    val shared = posts.select("gh", "doc_id").distinct()
      .groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("gh")
    val win = Window.partitionBy("doc_id").orderBy("pos")
    posts.join(shared, "gh")
      .select("doc_id", "pos")
      .withColumn("grp", col("pos") - row_number().over(win))
      .groupBy("doc_id", "grp")
      .agg(
        min(col("pos")).cast("bigint").as("span_start"),
        (max(col("pos")) + (k - 1)).cast("bigint").as("span_end"),
        (max(col("pos")) - min(col("pos")) + k).cast("bigint").as("span_tokens"))
      .drop("grp")
  }

  /** Aggressive boilerplate excision: every token inside ANY shared
    * span is removed from its document, and the remaining tokens are
    * reassembled in order. Output: one row per input doc — (doc_id,
    * clean_text, n_removed) — fully-duplicated docs come back with
    * empty text, not silently dropped.
    *
    * Scale shape: spans are maximal and disjoint per doc, so exploding
    * them into covered positions is O(covered tokens); the removal is a
    * LEFT ANTI on (doc, pos); reassembly is one per-doc aggregate whose
    * collected list is the doc's own kept tokens (bounded by doc
    * length — the same per-doc bound every tokenize step already has).
    */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDf: Long = 2): DataFrame = {
    // spans are maximal and non-overlapping per doc, so the removal is
    // a pure array expression once each doc holds its own (small) span
    // list: no exploded (doc, pos) relation, no token-scale anti-join,
    // no re-aggregation of the kept tokens — the only shuffles are the
    // span pipeline's own and one join of docs against the one-row-per-
    // spanned-doc span lists (docs with no shared span pass through the
    // left join untouched). Replaces an explode + LEFT ANTI +
    // collect_list chain that shuffled O(tokens) rows three times —
    // measured ~1.8× end-to-end at sf0.1 (SURVEY §9).
    val spanLists = spans(docs, idCol, textCol, k, minDf)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("sp"))
    docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .join(spanLists, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        when(col("sp").isNull, col("w")).otherwise(
          filter(col("w"), (t: Column, i: Column) =>
            !exists(col("sp"), s =>
              i + 1L >= s.getField("s") && i + 1L <= s.getField("e"))))
          .as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        (coalesce(size(col("w")), lit(0)).cast("bigint") -
          coalesce(size(col("kept")), lit(0)).cast("bigint")).as("n_removed"))
  }
}
