package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the context-window prep step
  * that turns long documents into model-sized pieces with a stride
  * overlap (so no boundary-spanning content is lost to a hard cut).
  *
  * Chunk i covers tokens [i*stride, i*stride + chunkSize); the last
  * chunk starts at the final stride boundary that still holds an
  * unseen token, so every token appears in at least one chunk and the
  * chunk count for an n-token document is exactly
  * `1 + ceil((n - chunkSize) / stride)` (1 for n <= chunkSize).
  *
  * Pure per-row generate (inline `posexplode` over a computed
  * sequence — no named-array column, so no filter can be inferred
  * below the generator, see SURVEY §9): zero shuffle, parallel at
  * whatever the scan's split count is. Each chunk carries an md5
  * content hash — the downstream dedup/shard key — rather than the
  * chunk text itself, keeping the output narrow; callers that need
  * the text re-slice from the source row.
  */
object Chunker {

  /** (doc_id, chunk_idx, n_tokens, chunk_hash) per chunk. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val w = TextFeatures.words(col("__text"))
    // exact ceil — token counts are far below 2^53, so the double
    // division is integer-exact
    val nChunks = when(size(w) <= chunkSize, lit(1L)).otherwise(
      (ceil((size(w) - lit(chunkSize)).cast("double") / stride) + 1)
        .cast("bigint"))
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => slice(w, (i * stride + 1).cast("int"), lit(chunkSize))))
          .as(Seq("chunk_idx", "toks")))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("chunk_hash"))
  }
}
