package graft.queries

import graft.text.Curation
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The end-to-end curation pipeline as ONE oracle-checked query:
  * quality scoring + language ID + exact dedup + MinHash near-dedup,
  * composed exactly as [[graft.text.Curation.curate]] runs them. The
  * oracle chains the already-proven per-family SQL generators over the
  * same intermediate CTEs, so a pass here verifies the COMPOSITION
  * (stage ordering, column threading, keep-first policy), not just the
  * pieces.
  */
object PipelineQueries {

  private val cfg = Curation.Config() // quality>=0.4, lang=en, lsh defaults

  def pipelineCurate(spark: SparkSession, dir: String): DataFrame =
    Curation.curate(
        Tables.loadSpread(spark, dir, "documents"), "doc_id", "text", cfg)
      .orderBy("doc_id")

  val pipelineCurateSql: String = {
    import TextQueries.{langBestExpr, langPredCase, langScoreSelect, qualityExpr}
    s"""WITH w0 AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
       |  FROM documents),
       |feat AS (SELECT doc_id, text,
       |    $qualityExpr AS quality,
       |    $langScoreSelect
       |  FROM w0),
       |ranked AS (SELECT *, $langBestExpr AS best FROM feat),
       |scored AS (SELECT doc_id, text, quality,
       |    $langPredCase AS lang_pred
       |  FROM ranked),
       |kept AS (SELECT doc_id, text, quality, lang_pred FROM scored
       |  WHERE quality >= ${cfg.minQuality} AND lang_pred = '${cfg.lang}'),
       |dedup AS (SELECT doc_id, text, quality, lang_pred FROM (
       |    SELECT doc_id, text, quality, lang_pred,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM kept) WHERE rn = 1),
       |${DedupQueries.minhashJacCtes("dedup")},
       |losers AS (SELECT DISTINCT doc_b FROM jac
       |  WHERE jaccard >= ${cfg.lsh.threshold})
       |SELECT doc_id, lang_pred, quality FROM dedup
       |WHERE doc_id NOT IN (SELECT doc_b FROM losers)
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (pipelineCurate(_, _)))

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" -> pipelineCurateSql)
}
