package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion vectors ([[CowTable.deleteWhereDv]], round 16 — protocol
  * 6): merge-on-read deletes that MARK rows instead of rewriting
  * files. Pins the contract corners:
  *
  *   1. a vector delete moves NO data file, reads subtract exactly,
  *      and time travel below reads everything back;
  *   2. repeated deletes FOLD into one vector per file, a
  *      fully-emptied file leaves the manifest, and the write cost is
  *      row-proportional (the vector is tiny beside the file);
  *   3. every rewriting op reads vectors-applied and emits clean
  *      files — merge, purgeDv — and vacuum reclaims superseded
  *      vectors while keeping referenced ones;
  *   4. the FileIndex (sidecar-backed) read path subtracts too, with
  *      hive-escaped partition values in play (the url_decode twin);
  *   5. CDC: the vector delete ships exact delete rows.
  */
class DvSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }
  private def dataFiles(t: String): Set[String] = {
    val fs = TxLog.fs(spark, t)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap(st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.getName))
    walk(new org.apache.hadoop.fs.Path(t, "data")).toSet
  }

  test("vector delete: no data file moves, reads subtract exactly, " +
      "time travel below reads everything back, protocol 6 stamped") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(100).select(col("id").as("k"),
          (col("id") % 10).as("v"))
          .repartitionByRange(4, col("k")), Seq("k"))
      val before = dataFiles(t)
      val m = CowTable.deleteWhereDv(spark, t, col("k") % 7 === 3L)
      assert(dataFiles(t) === before, "a vector delete moves no file")
      assert(TxLog.commitAt(spark, t, 2L).minReader === Some(6))
      val want = (0L until 100L).filterNot(_ % 7 == 3)
      assert(CowTable.read(spark, t).select("k").collect()
        .map(_.getLong(0)).sorted.toSeq === want)
      // live counts decremented exactly
      assert(TxLog.snapshot(spark, t).files.map(_.rows).sum ===
        want.size.toLong)
      assert(m.rowsBefore - m.rowsAfter === 100L - want.size)
      // time travel below the delete: everything back
      assert(CowTable.read(spark, t, Some(1L)).count() === 100L)
      // pruned + predicate reads subtract too
      assert(CowTable.readWhere(spark, t, col("k") < 20L).count() ===
        want.count(_ < 20L))
    }
  }

  test("repeated deletes fold to ONE vector per file; an emptied file " +
      "leaves the manifest; merge and purgeDv rewrite clean") {
    withTable { t =>
      // file A: only k in 0..9; file B: 10..99
      CowTable.create(spark, t,
        spark.range(10).select(col("id").as("k"),
          (col("id") % 10).as("v")).coalesce(1), Seq("k"))
      CowTable.append(spark, t,
        spark.range(10, 100).select(col("id").as("k"),
          (col("id") % 10).as("v")).coalesce(1))
      CowTable.deleteWhereDv(spark, t, col("k") % 2 === 0L)  // v3
      CowTable.deleteWhereDv(spark, t, col("k") % 3 === 0L)  // v4 folds
      val snap = TxLog.snapshot(spark, t)
      assert(snap.files.forall(_.dv.isDefined))
      assert(snap.files.flatMap(_.dv).distinct.size === 1,
        "the second delete must fold each file's pairs into ONE ref")
      val want = (0L until 100L).filter(k => k % 2 != 0 && k % 3 != 0)
      assert(CowTable.read(spark, t).select("k").collect()
        .map(_.getLong(0)).sorted.toSeq === want)
      // a merge touching the HIGH file reads vectors-applied and
      // rewrites it clean; the low file keeps its vector (key bounds
      // never select it)
      CowTable.merge(spark, t,
        Seq((25L, 999L)).toDF("k", "v"), Seq("k"))           // v5
      assert(CowTable.read(spark, t).filter(col("k") === 25L)
        .select("v").head().getLong(0) === 999L)
      assert(CowTable.read(spark, t).filter(col("k") === 24L)
        .count() === 0L, "a merge must not resurrect vectored rows")
      // purge drains the remaining vector (the low file): contents
      // identical, vectors gone
      val beforePurge = CowTable.read(spark, t).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(CowTable.purgeDv(spark, t) >= 1L)
      assert(TxLog.snapshot(spark, t).files.forall(_.dv.isEmpty))
      assert(CowTable.read(spark, t).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        beforePurge)
      // delete EVERYTHING remaining below 10: the (purged) low file
      // fully empties and leaves the manifest whole
      CowTable.deleteWhereDv(spark, t, col("k") < 10L)       // v7
      assert(TxLog.snapshot(spark, t).files
        .forall(f => f.stats("k").min.toLong >= 10L),
        "a fully-emptied file must leave the manifest")
      val finalWant = beforePurge.filter(_._1 >= 10L)
      assert(CowTable.read(spark, t).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        finalWant)
      // vacuum reclaims the superseded vectors (age 0) — the head
      // holds no vector (the last delete emptied its file whole)
      CowTable.vacuum(spark, t, retainVersions = 1, retentionMs = 0)
      val fs = TxLog.fs(spark, t)
      val dvRoot = new org.apache.hadoop.fs.Path(t, "_dv")
      assert(!fs.exists(dvRoot) || fs.listStatus(dvRoot).isEmpty,
        "superseded vectors must vacuum away")
      assert(CowTable.read(spark, t).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        finalWant)
    }
  }

  test("the FileIndex read path subtracts vectors — sidecar-backed, " +
      "hive-escaped partition values in play") {
    sys.props("graft.txlog.parquetCheckpointThreshold") = "3"
    try {
      withTable { t =>
        CowTable.create(spark, t,
          spark.range(90).select(col("id").as("k"),
            when(col("id") % 3 === 0, lit("a b"))
              .when(col("id") % 3 === 1, lit("50%off"))
              .otherwise(lit("plain")).as("p")),
          Seq("k"), partitionBy = Seq("p"))
        (1 to 20).foreach(i => CowTable.append(spark, t,
          Seq((100L + i, "plain")).toDF("k", "p")))
        assert(TxLog.snapshotPlanned(spark, t).isDistributed)
        CowTable.deleteWhereDv(spark, t, col("k") % 5 === 2L)
        val want = ((0L until 90L) ++ (101L to 120L))
          .filterNot(_ % 5 == 2)
        assert(CowTable.read(spark, t).select("k").collect()
          .map(_.getLong(0)).sorted.toSeq === want.sorted)
        // the escaped-partition rows specifically (url_decode twin)
        assert(CowTable.read(spark, t).filter(col("p") === "50%off")
          .select("k").collect().map(_.getLong(0)).sorted.toSeq ===
          (0L until 90L).filter(k => k % 3 == 1 && k % 5 != 2).sorted)
      }
    } finally {
      sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
    }
  }

  test("restore across a vector commit re-adds the TARGET identity " +
      "(deleted rows come back / go away), and a vacuumed vector " +
      "makes restore refuse loudly (review r16)") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(30).select(col("id").as("k")).coalesce(1),
        Seq("k"))                                          // v1
      CowTable.deleteWhereDv(spark, t, col("k") % 5 === 0L) // v2
      assert(CowTable.read(spark, t).count() === 24L)
      // back BELOW the vector: the entry's clean v1 identity re-adds
      // (a path-only delta would silently keep the head's vector)
      CowTable.restore(spark, t, 1L)                       // v3
      assert(CowTable.read(spark, t).count() === 30L)
      // forward again ONTO the vector commit's state
      CowTable.restore(spark, t, 2L)                       // v4
      assert(CowTable.read(spark, t).count() === 24L)
      // purge, then lose the vector to EXTERNAL cleanup (vacuum's own
      // dv keep-set tracks the data keep-set, so only abnormal
      // cleanup creates this state): a restore back onto the vector
      // commit must refuse loudly — never publish unreadable
      CowTable.purgeDv(spark, t)                           // v5
      val fs = TxLog.fs(spark, t)
      fs.delete(new org.apache.hadoop.fs.Path(t, "_dv"), true)
      val e = intercept[IllegalArgumentException] {
        CowTable.restore(spark, t, 2L)
      }
      assert(e.getMessage.contains("deletion vector"))
      assert(CowTable.read(spark, t).count() === 24L)
    }
  }

  test("CDC: a vector delete ships the exact delete rows; external " +
      "references are refused") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(20).select(col("id").as("k"),
          (col("id") * 2).as("v")).coalesce(1), Seq("k"))
      CowTable.deleteWhereDv(spark, t, col("k") >= 15L, cdc = true)
      val changes = CowTable.changesCdcAt(spark, t, 2L)
      assert(changes.select("k", CowTable.ChangeTypeCol).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet ===
        (15L until 20L).map(k => (k, "delete")).toSet)
      // a vector-carrying source refuses BOTH clone forms (a cloned
      // ref would dangle or resurrect) — drain first, then clone
      intercept[IllegalArgumentException] {
        CowTable.shallowClone(spark, t, t + "_nope")
      }
      intercept[IllegalArgumentException] {
        CowTable.deepClone(spark, t, t + "_nope2")
      }
      CowTable.purgeDv(spark, t)
      val sh = t + "_sh"
      CowTable.shallowClone(spark, t, sh)
      // ...and the vector path refuses EXTERNAL references loudly
      intercept[IllegalArgumentException] {
        CowTable.deleteWhereDv(spark, sh, col("k") === 1L)
      }
      ()
    }
  }
}
