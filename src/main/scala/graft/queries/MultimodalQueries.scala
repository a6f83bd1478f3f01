package graft.queries

import graft.multimodal._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable multimodal queries: binary payloads synthesized
  * deterministically from the documents table (the container has no
  * media codecs — see [[graft.multimodal.MediaDecode]]), metadata
  * filtering and frame sampling verified against DuckDB, which mirrors
  * the byte slicing in hex-string space (`hex(binary)` is uppercase in
  * both engines; DuckDB can't substring a BLOB, identical strings
  * compare identically).
  */
object MultimodalQueries {

  private val FrameSize = 16
  private val Stride = 2
  private val PayloadBytes = 64

  /** Shared oracle CTE: the synthesized payload in hex space + format. */
  private def corpusCteFrom(src: String): String = {
    val hx = (0 until 4).map(i => s"md5('blk$i:'||text)").mkString("||")
    val fmts = MediaIngest.Formats
    val cases = fmts.zipWithIndex.dropRight(1)
      .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    s"""m AS (SELECT doc_id, upper($hx) AS hx,
       |  CASE ((doc_id % ${fmts.size} + ${fmts.size}) % ${fmts.size}) $cases ELSE '${fmts.last}' END AS fmt
       |  FROM $src)""".stripMargin
  }

  private val corpusCte: String = corpusCteFrom("documents")

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    MediaIngest.synthesizeCorpus(
      Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")

  // ----------------------------------------------------------------- meta

  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .select(col("doc_id"), col("meta.fmt").as("fmt"),
        col("meta.byte_len").as("byte_len"),
        col("meta.checksum").as("checksum"))
      .orderBy("doc_id")

  val mmMetaSql: String =
    s"""WITH $corpusCte
       |SELECT doc_id, fmt, octet_length(unhex(hx)) AS byte_len,
       |       md5(hx) AS checksum
       |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- frames

  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    Frames.sample(corpus(spark, dir), "doc_id", "payload", FrameSize, Stride)
      .select(col("doc_id"), col("frame_idx"),
        hex(col("frame")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  val mmFramesSql: String = {
    val idxs = (0 until PayloadBytes / FrameSize by Stride)
      .mkString("[", ", ", "]")
    s"""WITH $corpusCte
       |SELECT doc_id, i AS frame_idx,
       |       substr(hx, i * ${2 * FrameSize} + 1, ${2 * FrameSize}) AS frame_hex
       |FROM m CROSS JOIN (SELECT unnest($idxs) AS i)
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  // ------------------------------------------------------- format filter

  /** Metadata-only filter + aggregate: per-format payload accounting.
    * The plan must never touch the payload column (column pruning) —
    * that's the point of the opaque-payload + typed-metadata design.
    */
  def mmFormatStats(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(col("meta.fmt").as("fmt"))
      .agg(count(lit(1)).as("n"), sum(col("meta.byte_len")).as("total_bytes"))
      .orderBy("fmt")

  val mmFormatStatsSql: String =
    s"""WITH $corpusCte
       |SELECT fmt, count(*) AS n,
       |       CAST(SUM(octet_length(unhex(hx))) AS BIGINT) AS total_bytes
       |FROM m GROUP BY fmt ORDER BY fmt""".stripMargin

  // --------------------------------------------------------------- decode

  /** The full decode dispatch ([[graft.multimodal.MediaDecode.decode]]:
    * batched mapPartitions → ImageIO attempt → audio attempt → stripe
    * fallback) under the driver gate. The synthesized payloads carry no
    * image/audio magic bytes, so every record deterministically takes
    * the stripe path — whose arithmetic is EXACT in float (byte sums
    * divided by the powers of two 8 and 256), so the DuckDB oracle's
    * double-precision replica matches bit-for-bit. The real
    * ImageIO/PCM paths stay golden-spec'd (drawn image, synthesized
    * sine) — no oracle can express them.
    */
  def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val recs = corpus(spark, dir)
      .select(col("doc_id"), col("meta.fmt").as("fmt"), col("payload"))
      .as[MediaDecode.MediaRecord]
    val featCols = (0 until MediaDecode.FeatureDim).map(i =>
      col("features")(i).cast("double").as(s"f$i"))
    MediaDecode.decode(recs)
      .select(col("doc_id") +: col("fmt") +: featCols: _*)
      .orderBy("doc_id")
  }

  val mmDecodeSql: String = {
    def byteVal(p: Int): String =
      s"((instr('0123456789abcdef', substr(lhx, ${2 * p + 1}, 1)) - 1) * 16" +
        s" + instr('0123456789abcdef', substr(lhx, ${2 * p + 2}, 1)) - 1)"
    val stripe = PayloadBytes / MediaDecode.FeatureDim
    val feats = (0 until MediaDecode.FeatureDim).map { i =>
      val s = (0 until stripe).map(j => byteVal(stripe * i + j))
        .mkString(" + ")
      s"CAST($s AS DOUBLE) / $stripe / 256 AS f$i"
    }.mkString(",\n       ")
    s"""WITH $corpusCte,
       |lm AS (SELECT doc_id, fmt, lower(hx) AS lhx FROM m)
       |SELECT doc_id, fmt,
       |       $feats
       |FROM lm ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- dedup

  /** Gate-only (runtime face is mm_meta's — a checksum aggregate over
    * the same metadata projection): exact media dedup by payload
    * checksum, over a corpus carrying PLANTED byte-identical copies
    * (every doc_id % 9 == 0 document re-keyed — identical text ⇒
    * identical synthesized payload; the raw sf tables hold no exact
    * text dups, so without the plant the keep column would be
    * vacuously constant). The min-id member of each checksum group
    * keeps (the [[graft.dedup.ExactDedup]] policy); a copy's format
    * tag may differ (fmt derives from doc_id) — dedup is on BYTES, as
    * it must be. Perceptual near-dup of media is
    * [[graft.multimodal.MediaDedup]] — golden-spec'd, no SQL mirror
    * for a raster decode.
    */
  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("checksum").orderBy("doc_id")
    MediaIngest.synthesizeCorpus(planted, "doc_id", "text")
      .select(col("doc_id"), col("meta.checksum").as("checksum"))
      .withColumn("keep",
        when(row_number().over(w) === 1, 1).otherwise(0).cast("int"))
      .orderBy("doc_id")
  }

  val mmDedupSql: String =
    s"""WITH mdocs AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 700000, text FROM documents
       |  WHERE doc_id % 9 = 0),
       |${corpusCteFrom("mdocs")}
       |SELECT doc_id, md5(hx) AS checksum,
       |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY md5(hx)
       |    ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS INT) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_dedup" -> (mmDedup(_, _)),
    "mm_meta" -> (mmMeta(_, _)),
    "mm_frames" -> (mmFrames(_, _)),
    "mm_format_stats" -> (mmFormatStats(_, _)),
    "mm_decode" -> (mmDecode(_, _)))

  val oracleSql: Map[String, String] = Map(
    "mm_dedup" -> mmDedupSql,
    "mm_meta" -> mmMetaSql,
    "mm_frames" -> mmFramesSql,
    "mm_format_stats" -> mmFormatStatsSql,
    "mm_decode" -> mmDecodeSql)
}
