package graft.queries

import graft.similarity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable similarity-search queries over the `embeddings`
  * table (array<float> vectors).
  *
  * The oracle reproduces cosine values BIT-EXACTLY: both engines widen
  * float→double, fold products left-to-right (`aggregate` ↔
  * `list_reduce`), and apply the same sqrt/divide — IEEE ops are
  * deterministic given operand order, so no tolerance is needed.
  */
object SimilarityQueries {

  private val K = 10
  private val QueryCount = 8 // query set = vec_id < 8
  private val lshCfg = HyperplaneLSH.Config()

  /** Left-fold dot product in DuckDB. */
  private def foldDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, [$a[i] * $b[i] " +
      s"for i in generate_series(1, len($a))]), (x, y) -> x + y)"

  // ----------------------------------------------------------- brute force

  def simTopk(spark: SparkSession, dir: String): DataFrame =
    BruteForceKNN.topK(Tables.loadSpread(spark, dir, "embeddings"),
        "vec_id", "embedding", _ < QueryCount, K)
      .orderBy("q_id", "rank")

  val simTopkSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM v),
       |p AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
       |    ${foldDot("q.v", "d.v")} / (sqrt(q.nrm) * sqrt(d.nrm)) AS cos_sim
       |  FROM n q CROSS JOIN n d
       |  WHERE q.vec_id < $QueryCount AND d.vec_id <> q.vec_id)
       |SELECT q_id, rank, n_id, cos_sim FROM (
       |  SELECT q_id, n_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cos_sim DESC, n_id) AS rank
       |  FROM p)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  // ------------------------------------------------------------------ lsh

  def simLshBucket(spark: SparkSession, dir: String): DataFrame =
    HyperplaneLSH.topKInBucket(Tables.loadSpread(spark, dir, "embeddings"),
        "vec_id", "embedding", _ < QueryCount, K, lshCfg)
      .orderBy("q_id", "rank")

  val simLshBucketSql: String = {
    val planeLists = HyperplaneLSH.planes(lshCfg).zipWithIndex
      .map { case (plane, p) =>
        plane.map(v => f"$v%.3f").mkString("[", ", ", s"]::DOUBLE[] AS p$p")
      }.mkString(",\n    ")
    val bucket = (0 until lshCfg.numPlanes).map { p =>
      s"(CASE WHEN ${foldDot("n.v", s"pl.p$p")} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("\n     + ")
    s"""WITH planes AS (SELECT
       |    $planeLists),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${foldDot("v", "v")} AS nrm FROM v),
       |b AS (SELECT vec_id, v, nrm,
       |    $bucket AS bucket
       |  FROM n CROSS JOIN planes pl),
       |p AS (SELECT q.vec_id AS q_id, d.vec_id AS n_id,
       |    ${foldDot("q.v", "d.v")} / (sqrt(q.nrm) * sqrt(d.nrm)) AS cos_sim
       |  FROM b q JOIN b d ON d.bucket = q.bucket AND d.vec_id <> q.vec_id
       |  WHERE q.vec_id < $QueryCount)
       |SELECT q_id, rank, n_id, cos_sim FROM (
       |  SELECT q_id, n_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |                       ORDER BY cos_sim DESC, n_id) AS rank
       |  FROM p)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> (simTopk(_, _)),
    "sim_lsh_bucket" -> (simLshBucket(_, _)))

  val oracleSql: Map[String, String] = Map(
    "sim_topk" -> simTopkSql,
    "sim_lsh_bucket" -> simLshBucketSql)
}
