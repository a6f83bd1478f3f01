package graft.similarity

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index serving face: write the coded corpus
  * partitioned by coarse cell + the codebooks as catalog tables, then
  * serve query batches with zero training jobs and a scan restricted
  * to the probed cells. Both the row-level results (bit-equal to the
  * train-and-search path — doubles round-trip parquet exactly) and
  * the pruned scan shape are the contract.
  */
class IvfPqIndexSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  for (residual <- Seq(false, true))
    test(s"served index ≡ train-and-search (residual=$residual), " +
        "scan pruned to probed cells") {
      val cfg = IvfPq.Config(residual = residual)
      val table = s"ivfpq_idx_$residual"
      try {
        val model =
          IvfPq.writeIndex(emb, "vec_id", "embedding", 64, table, cfg)

        // codebook round-trip through parquet is exact
        val re = IvfPq.readModel(spark, table)
        assert(re.coarse.map(_.cid) === model.coarse.map(_.cid))
        assert(re.coarse.flatMap(_.cv.toSeq) ===
          model.coarse.flatMap(_.cv.toSeq))
        assert(re.books.flatten.flatMap(_.cv.toSeq) ===
          model.books.flatten.flatMap(_.cv.toSeq))

        val served = IvfPq.topKIndexed(spark, table,
            emb.filter(col("vec_id") < 8), "vec_id", "embedding", 64, 10, cfg)
          .orderBy("q_id", "rank")
        // the coded-corpus scan carries the probed-cell partition filter
        val plan = served.queryExecution.executedPlan.toString
        val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*".r
          .findFirstIn(plan)
        assert(pf.exists(s => s.contains("IN") || s.contains("INSET")),
          "coded scan must prune to probed cells:\n" + plan)

        val direct = IvfPq
          .topK(emb, "vec_id", "embedding", 64, _ < 8, 10, cfg)
          .orderBy("q_id", "rank")
        assert(served.collect().toSeq === direct.collect().toSeq)
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        spark.sql(s"DROP TABLE IF EXISTS ${table}_model")
        spark.catalog.clearCache()
      }
    }
}
