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

  test("append-then-serve ≡ coding the union with the frozen model") {
    val cfg = IvfPq.Config(residual = true) // the coupling-sensitive case
    val corpus = emb.filter(col("vec_id") >= 50)
    val batch = emb.filter(col("vec_id") < 50)
    try {
      val model =
        IvfPq.writeIndex(corpus, "vec_id", "embedding", 64, "ivfpq_grow", cfg)
      IvfPq.appendToIndex(batch, "vec_id", "embedding", 64, "ivfpq_grow",
        model, cfg)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("vid", "cell", "c0", "c3", "c7").orderBy("vid").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4))).toSeq
      // the grown table holds exactly what coding the union up front
      // under the same frozen model produces
      assert(rows(spark.table("ivfpq_grow")) ===
        rows(IvfPq.code(emb, "vec_id", "embedding", 64, model, cfg)))
      // and appended rows serve immediately: an identical-vector query
      // finds its batch-resident twin at cosine 1
      val twin = emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val served = IvfPq.topKIndexed(spark, "ivfpq_grow", twin,
          "vec_id", "embedding", 64, 10, cfg, Some(model))
        .filter(col("n_id") === 3).collect()
      assert(served.length === 1 && served.head.getDouble(3) > 0.9999)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_grow")
      spark.sql("DROP TABLE IF EXISTS ivfpq_grow_model")
      spark.catalog.clearCache()
    }
  }
}
