package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the step that turns a curated
  * corpus into fixed-length training sequences: documents are
  * concatenated in a deterministic global order (ascending id) and the
  * token stream is cut every `seqLen` tokens. Each document's pack span
  * is a pure function of its global token offset, so the assignment is
  * reproducible across runs, retries, and engines.
  *
  * The global prefix sum is the scale hazard: a single unpartitioned
  * window moves ALL rows through one reducer. Instead the offset is
  * computed hierarchically, the standard two-level scan:
  *
  *   1. a within-bucket running sum — window partitioned by a bucket
  *      key monotone in the global order (`id div bucketWidth`), so it
  *      distributes across the cluster;
  *   2. per-bucket base offsets — an aggregate producing one row per
  *      bucket (orders of magnitude smaller than the data; the only
  *      unpartitioned window runs over THAT tiny frame) joined back,
  *      broadcast at any realistic bucket count.
  *
  * At 100 TB with ~1e10 docs and bucketWidth 1e6 the tiny frame is
  * ~1e4 rows — trivially single-partition — while every full-data
  * operation stays bucket-partitioned. Offsets are exact integer
  * arithmetic (`DIV`), no floating point anywhere.
  */
object SeqPack {

  /** Per-document pack spans.
    *
    * Output: (doc_id, n_tokens, start_off, pack_first, pack_last) where
    * `start_off` is the document's first-token offset in the global
    * concatenated stream, `pack_first = start_off DIV seqLen`, and
    * `pack_last` is the pack of its final token (empty documents get
    * `pack_first = pack_last` — they sit at their offset).
    *
    * `docs` must carry a numeric `idCol` (the deterministic order) and
    * `tokensCol` (per-doc token count, e.g. from [[TokenCount]]).
    */
  def packPlan(docs: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long, bucketWidth: Long = 1000000L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

    // bucket via integral DIV (monotone in id; exact at any magnitude —
    // a double division would lose ulps past 2^53)
    val base = docs.select(
        col(idCol).cast("bigint").as("doc_id"),
        col(tokensCol).cast("bigint").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id DIV $bucketWidth"))

    // (1) distributed: running sum of the tokens BEFORE each row,
    // within its bucket.
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = base.withColumn("within_off",
      coalesce(sum(col("n_tokens")).over(inBucket), lit(0L)))

    // (2) tiny: one row per bucket; the single-partition window scans
    // only this frame. The partition key is the NON-FOLDABLE constant
    // `bucket * 0`: every row lands in one hash partition — the design,
    // since the frame is one row per bucket — without the empty
    // partition spec WindowExec would warn about on every run (a
    // foldable literal key gets optimized away and warns identically).
    val byBucket = Window.partitionBy(col("bucket") * lit(0L))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBase = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .select(col("bucket"),
        coalesce(sum(col("bucket_tokens")).over(byBucket), lit(0L))
          .as("bucket_off"))

    within.join(broadcast(bucketBase), "bucket")
      .withColumn("start_off", col("bucket_off") + col("within_off"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        expr(s"start_off DIV $seqLen").as("pack_first"),
        expr(s"(start_off + greatest(n_tokens, 1L) - 1L) DIV $seqLen")
          .as("pack_last"))
  }

  /** Pack-level fill report: for each pack in which at least one
    * document STARTS, how many documents start there and how many of
    * its `seqLen` slots the stream fills. Packs with no starting
    * document are omitted — they are interiors of a single spanning
    * document and therefore exactly full by construction (the
    * concatenated stream is contiguous), so the omissions carry no
    * information the report needs to repeat.
    */
  def packStats(packed: DataFrame, seqLen: Long): DataFrame = {
    val totals = packed.agg(
      max(col("start_off") + col("n_tokens")).as("stream_end"))
    packed.groupBy(col("pack_first").as("pack_id"))
      .agg(count(lit(1)).as("n_docs_starting"))
      .crossJoin(broadcast(totals))
      .select(col("pack_id"), col("n_docs_starting"),
        least(lit(seqLen),
          col("stream_end") - col("pack_id") * seqLen).as("tokens_filled"))
  }
}
