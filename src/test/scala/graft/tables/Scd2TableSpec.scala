package graft.tables

import graft.SparkTestSession
import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Scd2Table]]: the CowTable-held history after every batch equals
  * the in-memory [[Scd2.applyDelta]] fold — the storage integration
  * changes WHERE the history lives, never what it says.
  */
class Scd2TableSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2t_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select("k", "v", Scd2.ValidFrom, Scd2.ValidTo).collect()
      .map(_.toSeq).toSet

  private val snap0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
  // (k, v, dead)
  private val d1 = Seq((1L, "a2", false), (4L, "d", false),
    (3L, "c", false)).toDF("k", "v", "dead")          // change, insert, no-op
  private val d2 = Seq((2L, "", true), (4L, "d2", false))
    .toDF("k", "v", "dead")                           // delete, change

  test("table-held history ≡ in-memory fold, after every batch") {
    withTable { t =>
      Scd2Table.init(spark, t, snap0, Seq("k"), asOf = 100L)
      var mem = Scd2.initHistory(snap0, 100L)
      assert(rows(Scd2Table.history(spark, t)) === rows(mem))

      Seq((d1, 200L), (d2, 300L)).foreach { case (d, ts) =>
        Scd2Table.applyDelta(spark, t, d, Seq("k"), ts, Some("dead"))
        mem = Scd2.applyDelta(mem, d, Seq("k"), ts, Some("dead"))
        assert(rows(Scd2Table.history(spark, t)) === rows(mem),
          s"diverged at batch ts=$ts")
      }

      // current slice and as-of reads agree with the batch operator
      assert(Scd2Table.current(spark, t).select("k", "v")
        .collect().map(_.toSeq).toSet ===
        Scd2.currentOf(mem).select("k", "v").collect().map(_.toSeq).toSet)
      assert(Scd2Table.asOf(spark, t, 150L).select("k", "v")
        .collect().map(_.toSeq).toSet ===
        snap0.collect().map(_.toSeq).toSet)
    }
  }

  test("merge ships only the churn; open partition holds the current slice") {
    withTable { t =>
      Scd2Table.init(spark, t, snap0, Seq("k"), asOf = 100L)
      val m = Scd2Table.applyDelta(spark, t, d1, Seq("k"), 200L,
        Some("dead"))
      // churn = close(k=1) + insert(k=1 v2) + insert(k=4): 3 rows in,
      // no-op k=3 and untouched k=2 never enter the merge batch
      assert(m.addedRows - m.removedRows === 2) // net new version rows
      val snap = TxLog.snapshot(spark, t)
      assert(snap.partitionCols === Some(Seq("open")))
      val openFiles = snap.files.filter(_.path.contains("/open=true/"))
      val closedFiles = snap.files.filter(_.path.contains("/open=false/"))
      assert(openFiles.nonEmpty && closedFiles.nonEmpty)
      assert(closedFiles.map(_.rows).sum === 1)   // exactly the k=1 close
      assert(Scd2Table.current(spark, t).count() === 4)
    }
  }

  test("replayed batch is a no-op under a txn stamp") {
    withTable { t =>
      Scd2Table.init(spark, t, snap0, Seq("k"), asOf = 100L)
      val stamp = Some(TxLog.Txn("scd2", 1L))
      Scd2Table.applyDelta(spark, t, d1, Seq("k"), 200L, Some("dead"), stamp)
      val after = rows(Scd2Table.history(spark, t))
      val v = TxLog.latestVersion(spark, t)
      // replay with the SAME stamp (and a bogus later ts): skipped
      Scd2Table.applyDelta(spark, t, d1, Seq("k"), 999L, Some("dead"), stamp)
      assert(TxLog.latestVersion(spark, t) === v)
      assert(rows(Scd2Table.history(spark, t)) === after)
    }
  }
}
