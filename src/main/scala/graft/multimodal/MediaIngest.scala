package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with a
  * typed metadata struct alongside.
  *
  * Design for 100 TB of media: the payload column stays opaque bytes
  * end-to-end (parquet binary → Tungsten UnsafeRow → codec); every
  * filter/group/join the pipeline needs runs on the METADATA struct
  * (format, size, checksum), which is orders of magnitude smaller and
  * column-prunable — a query that filters on `meta.fmt` never reads a
  * payload byte from parquet.
  */
object MediaIngest {

  val Formats: Seq[String] = Seq("png", "wav", "mp4")

  /** Ingest a directory of real media files as (path, length, content)
    * — Spark's binaryFile source; the production entry point. Supports
    * pushed filters on path/length and never decodes anything.
    */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Attach the typed metadata struct to a payload column:
    * `meta: struct<fmt, byte_len, checksum>`. Checksum is md5 over the
    * hex rendering (portable: identical string in any engine).
    */
  def withMeta(df: DataFrame, payloadCol: String, fmtCol: String): DataFrame =
    df.withColumn("meta", struct(
      col(fmtCol).as("fmt"),
      length(col(payloadCol)).as("byte_len"),
      md5(hex(col(payloadCol))).as("checksum")))

  /** Deterministic fake corpus: a 64-byte payload per document derived
    * from its text (4 × md5 blocks), with a format assigned round-robin.
    * Stands in for real decode inputs in tests/benchmarks — the
    * container ships no media codecs (see [[MediaDecode]]).
    */
  def synthesizeCorpus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = unhex(concat((0 until 4).map(i =>
      md5(concat(lit(s"blk$i:"), col(textCol)))): _*))
    val fmt = element_at(
      array(Formats.map(lit): _*),
      // pmod, not %: a negative id under % yields index 0 (runtime
      // error) or counts from the array END (silent wrong format)
      pmod(col(idCol), lit(Formats.size)).cast("int") + 1)
    withMeta(
      docs.select(col(idCol).as("doc_id"), payload.as("payload"), fmt.as("fmt")),
      "payload", "fmt")
  }
}
