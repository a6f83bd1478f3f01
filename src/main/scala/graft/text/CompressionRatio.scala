package graft.text

import graft.expressions.DeflateLength
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: DEFLATE-compressed size over raw
  * UTF-8 size per document — the model-free redundancy filter the
  * public web-corpus curations run beside Gopher rules and repetition
  * metrics. Highly repetitive documents (boilerplate, keyword stuffing,
  * generated spam) compress far below natural prose (~350–600k ppm);
  * high-entropy blobs (minified JS, base64, binary-in-text) sit near —
  * or above — 1e6. Both tails are filter candidates; [[Repetition]]
  * sees only token-level copies, this sees BYTE-level structure.
  *
  * Shape: a pure per-row projection through the codegen'd
  * [[graft.expressions.DeflateLength]] — no shuffle, no state, stream-
  * safe. `ratio_ppm` is integer fixed-point (1e6·deflate div bytes).
  *
  * Verification note: DEFLATE is not expressible in the oracle engine,
  * so this operator is SPEC-verified (driver-side zlib replay equality,
  * redundancy ordering, partitioning invariance) rather than
  * oracle-gated — the same standing as the streaming faces.
  */
object CompressionRatio {

  /** @return idCol, n_bytes (raw UTF-8), deflate_len, ratio_ppm
    *         (null for empty documents — no bytes, no ratio)
    */
  def metrics(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        DeflateLength.of(col(textCol)).as("deflate_len"))
      .withColumn("ratio_ppm",
        when(col("n_bytes") > 0,
          expr("(1000000 * deflate_len) div n_bytes")))

  /** The filter face: keep documents whose ratio sits inside
    * [loPpm, hiPpm] — both tails are suspect (see scaladoc above).
    * Empty documents fail the band (null ratio).
    */
  def keep(docs: DataFrame, idCol: String, textCol: String,
      loPpm: Long, hiPpm: Long): DataFrame =
    metrics(docs, idCol, textCol)
      .filter(col("ratio_ppm").isNotNull &&
        col("ratio_ppm") >= loPpm && col("ratio_ppm") <= hiPpm)
      .select(col(idCol), col("ratio_ppm"))
}
