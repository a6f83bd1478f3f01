package graft.streaming

import graft.SparkTestSession
import graft.operators.CountMin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** CMS streaming face: cross-micro-batch windowed cells must equal the
  * batch operator's cells over the concatenated stream (the sketch's
  * exact mergeability carried into the state store), and estimates
  * served from a window's cells must be the batch estimates.
  */
class CmsStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val cfg = CountMin.Config(depth = 2, width = 8)

  test("streaming cells across batches == batch cells of the concatenation") {
    val w1b1 = Seq("a", "b", "a", "c")
    val w1b2 = Seq("a", "c", "d")
    val w2 = Seq("x", "x", "y")
    def at(h: String, items: Seq[String]) = items.map(i => (ts(h), i))

    val stream = MemoryStream[(Timestamp, String)](spark)
    val q = CmsStream.cells(stream.toDF().toDF("ts", "item"),
        "ts", "item", windowDur = "1 hour", cfg)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cmsstream").start()
    try {
      stream.addData(at("2024-01-01 10:05:00", w1b1))
      q.processAllAvailable()
      stream.addData(at("2024-01-01 10:40:00", w1b2) ++
        at("2024-01-01 11:10:00", w2))
      q.processAllAvailable()

      val out = spark.table("cmsstream").collect()
        .groupBy(_.getAs[Timestamp]("window_start").toString.take(13))
        .map { case (w, rows) => w -> rows.map(r =>
          (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
            r.getAs[Long]("cnt")).toMap }

      def batchCells(items: Seq[String]): Map[(Int, Long), Long] =
        CountMin.cells(items.toDF("item"), "item", cfg).collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(out("2024-01-01 10") === batchCells(w1b1 ++ w1b2))
      assert(out("2024-01-01 11") === batchCells(w2))

      // estimates served from the window's cells are batch estimates
      val w1cells = spark.table("cmsstream")
        .filter($"window_start" === ts("2024-01-01 10:00:00"))
        .select("r", "bucket", "cnt")
      val est = CountMin.estimates(w1cells,
          Seq("a", "d", "zz").toDF("item"), "item", cfg)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("a") >= 3L && est("d") >= 1L)
      val exact = (w1b1 ++ w1b2).groupBy(identity).view.mapValues(_.size.toLong)
      val estBatch = CountMin.estimates(
          CountMin.cells((w1b1 ++ w1b2).toDF("item"), "item", cfg),
          Seq("a", "d", "zz").toDF("item"), "item", cfg)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est === estBatch)
      assert(exact.forall { case (k, n) =>
        !est.contains(k) || est(k) >= n })
    } finally q.stop()
  }
}
