package graft.tables

import graft.SparkTestSession
import graft.operators.AggMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[AggTable]]: the table-held standing aggregates after every fold
  * equal a from-scratch [[AggMerge.aggregate]] of all rows so far —
  * the incremental ≡ recompute identity through the storage round
  * trip, including null keys and untouched-key immobility.
  */
class AggTableSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_aggt_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  private def norm(df: DataFrame): Set[Seq[Any]] =
    df.select("g", "n", "total", "vmin", "vmax").collect()
      .map(_.toSeq).toSet

  // (g, value) batches; g=null exercises the null-key path
  private def toRows(b: Seq[(java.lang.Long, Double)]): DataFrame =
    b.toDF("g", "value").select(col("g").cast("long").as("g"), col("value"))

  private val b1 = Seq[(java.lang.Long, Double)](
    (1L, 10.0), (1L, 2.5), (2L, 7.0), (null, 1.0))
  private val b2 = Seq[(java.lang.Long, Double)](
    (1L, -3.0), (3L, 4.0), (null, 2.0))
  private val b3 = Seq[(java.lang.Long, Double)]((2L, 100.0))

  test("fold ≡ recompute after every batch, null keys included") {
    withTable { t =>
      AggTable.init(spark, t, toRows(b1), Seq("g"), "value")
      var all = b1
      assert(norm(AggTable.read(spark, t)) ===
        norm(AggMerge.aggregate(toRows(all), Seq("g"), "value")))
      Seq(b2, b3).foreach { b =>
        AggTable.fold(spark, t, toRows(b), Seq("g"), "value")
        all = all ++ b
        assert(norm(AggTable.read(spark, t)) ===
          norm(AggMerge.aggregate(toRows(all), Seq("g"), "value")))
      }
    }
  }

  test("untouched keys never move; touched-key reads prune") {
    withTable { t =>
      // clustered standing table over keys 0..799, 8 range files
      val rows = spark.range(800).select(col("id").as("g"),
        (col("id") % 10).cast("double").as("value"))
      CowTable.create(spark, t,
        AggMerge.aggregate(rows, Seq("g"), "value")
          .repartitionByRange(8, col("g")),
        statsCols = Seq("g"))
      val before = TxLog.snapshot(spark, t).files.map(_.path).toSet

      // batch touches keys 0..49 only (first file's range)
      val m = AggTable.fold(spark, t,
        spark.range(50).select(col("id").as("g"), lit(5.0d).as("value")),
        Seq("g"), "value")
      assert(m.touchedFiles === 1 && m.prunedFiles >= 6, s"got $m")
      val after = TxLog.snapshot(spark, t).files.map(_.path).toSet
      assert((before & after).size === 7)

      // and the combined state is exact
      val g0 = AggTable.read(spark, t).filter(col("g") === 0L).collect()(0)
      assert(g0.getAs[Long]("n") === 2 &&
        g0.getAs[java.math.BigDecimal]("total").doubleValue() === 5.0 &&
        g0.getAs[Double]("vmax") === 5.0)
    }
  }

  test("replay under a txn stamp is a no-op") {
    withTable { t =>
      AggTable.init(spark, t, toRows(b1), Seq("g"), "value")
      val stamp = Some(TxLog.Txn("agg", 7L))
      AggTable.fold(spark, t, toRows(b3), Seq("g"), "value", stamp)
      val state = norm(AggTable.read(spark, t))
      AggTable.fold(spark, t, toRows(b3), Seq("g"), "value", stamp)
      assert(norm(AggTable.read(spark, t)) === state,
        "replayed fold double-counted")
    }
  }
}
