package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet-sidecar checkpoints (round 14): above a file-count
  * threshold, the checkpoint's manifest entries publish as a parquet
  * dir the JSON references — bulk-decoded at fold time, and directly
  * readable as a DataFrame. Pins the round trip (contents, zone maps,
  * pruning), the DataFrame manifest face, and the fallback contract.
  */
class TxLogCheckpointSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withThreshold[A](n: Int)(f: => A): A = {
    sys.props("graft.txlog.parquetCheckpointThreshold") = n.toString
    try f finally {
      sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
    }
  }
  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_ckpt_").toFile
    try f(d.getAbsolutePath + "/t") finally rmrf(d)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  test("parquet checkpoint round trip: fold, zone maps, pruning") {
    withThreshold(3) {
      withDir { t =>
        CowTable.create(spark,
          t, spark.range(1000).select(col("id").as("k"),
            (col("id") % 7).as("v"))
            .repartitionByRange(8, col("k")), Seq("k"))
        // push past the interval so a checkpoint lands (8 files > 3)
        (1 to TxLog.CheckpointInterval).foreach { i =>
          CowTable.append(spark, t,
            Seq((10000L + i, 1L)).toDF("k", "v"))
        }
        val logDir = new java.io.File(t, TxLog.LogDir)
        val ckpts = logDir.list().filter(_.endsWith(".checkpoint.json"))
        assert(ckpts.nonEmpty)
        assert(logDir.list().exists(_.endsWith(".checkpoint.files.parquet")),
          s"no parquet sidecar in ${logDir.list().toSeq}")
        val doc = new String(java.nio.file.Files.readAllBytes(
          new java.io.File(logDir, ckpts.max).toPath), "UTF-8")
        assert(doc.contains("filesRef"), doc.take(200))
        assert(!doc.contains("\"stats\""),
          "slim checkpoint must not inline manifest entries")

        // the fold from the sidecar: contents + zone maps intact
        val snap = TxLog.snapshot(spark, t)
        assert(snap.files.map(_.rows).sum === 1000L +
          TxLog.CheckpointInterval)
        assert(CowTable.read(spark, t).count() === 1000L +
          TxLog.CheckpointInterval)
        // stats survived the parquet round trip: pruning still sharp
        val m = CowTable.merge(spark, t, Seq((5L, 99L)).toDF("k", "v"),
          Seq("k"), checkUniqueKeys = false)
        assert(m.candidateFiles <= 2,
          s"zone maps lost through the parquet checkpoint: $m")
        assert(CowTable.read(spark, t).filter(col("k") === 5L)
          .select("v").head().getLong(0) === 99L)
      }
    }
  }

  test("filesAsDf surfaces the manifest as a DataFrame") {
    withDir { t =>
      CowTable.create(spark, t,
        spark.range(100).select(col("id").as("k"), (col("id") % 3).as("v"))
          .repartitionByRange(4, col("k")), Seq("k"))
      val df = TxLog.filesAsDf(spark, t)
      assert(df.columns.toSeq ===
        Seq("path", "rows", "stats", "bytes", "dv"))
      assert(df.count() === 4L)
      assert(df.agg(sum("rows")).head().getLong(0) === 100L)
      // byte lengths recorded at write time (round 16) match the disk
      val want = TxLog.snapshot(spark, t).files
        .map(f => new org.apache.hadoop.fs.Path(s"$t/${f.path}"))
        .map(p => TxLog.fs(spark, t).getFileStatus(p).getLen).sorted
      assert(df.select("bytes").collect().map(_.getLong(0)).sorted
        .toSeq === want)
      // the zone maps are queryable map columns
      val bounds = df.select(col("stats")("k")("min").cast("long"))
        .collect().map(_.getLong(0)).sorted
      assert(bounds.head === 0L)
    }
  }

  test("checkpoints ROLL sidecar-to-sidecar (round 16): successive " +
      "generations stay exact, and a mass delete shrinks back to the " +
      "inline form") {
    sys.props("graft.txlog.parquetCheckpointThreshold") = "3"
    try {
      withDir { t =>
        CowTable.create(spark, t,
          spark.range(100).select(col("id").as("k"))
            .repartitionByRange(4, col("k")), Seq("k"))
        (1 to 45).foreach(i => CowTable.append(spark, t,
          Seq(100L + i).toDF("k")))                       // v46; ckpts v20, v40
        val f = TxLog.fs(spark, t)
        val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
        def sidecars = f.listStatus(logDir).map(_.getPath.getName)
          .filter(_.endsWith(".checkpoint.files.parquet")).sorted
        assert(sidecars.toSeq ===
          Seq(f"${20L}%020d.checkpoint.files.parquet",
            f"${40L}%020d.checkpoint.files.parquet"),
          "both checkpoint generations must carry sidecars")
        // the ROLLED generation (v40 built from v20's sidecar + tail)
        // answers exactly: head, a pruned read, and time travel below
        assert(CowTable.read(spark, t).count() === 145L)
        assert(CowTable.readWhere(spark, t, col("k") === 120L)
          .count() === 1L)
        assert(CowTable.read(spark, t, Some(30L)).count() === 129L)
        // shrink back below the (dynamic) threshold: the ROLL's
        // survivor count decides, and a small manifest INLINES again
        // even though the previous generation was sidecar-backed
        CowTable.deleteWhere(spark, t, col("k") >= 2L)    // v47
        sys.props("graft.txlog.parquetCheckpointThreshold") = "1000"
        (1 to 13).foreach(i => CowTable.append(spark, t,
          Seq(1000L + i).toDF("k")))                      // v60; ckpt v60
        val ckpt60 = TxLog.readString(f, new org.apache.hadoop.fs.Path(
          logDir, f"${60L}%020d.checkpoint.json"))
        assert(!ckpt60.contains("filesRef"),
          "a shrunken manifest must inline again")
        assert(CowTable.read(spark, t).count() === 2L + 13L)
      }
    } finally {
      sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
    }
  }

  test("describeHistory pages with bounded I/O: only the requested " +
      "page's commit files are read (round 16)") {
    withDir { t =>
      CowTable.create(spark, t, Seq((0L, 0L)).toDF("k", "v"), Seq("k"))
      (1 to 59).foreach(i =>
        CowTable.append(spark, t, Seq((i.toLong, i.toLong)).toDF("k", "v")))
      // delete every commit BELOW the page — a paged call that still
      // answers proves it never reads them (the bounded-I/O pin)
      val f = TxLog.fs(spark, t)
      (1L to 49L).foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(t, TxLog.LogDir),
          f"$v%020d.json"), false)
      }
      val page = TxLog.describeHistory(spark, t,
        fromVersion = Some(50L), toVersion = Some(55L)).collect()
      assert(page.map(_.getLong(0)).toSeq === (50L to 55L))
      // limit keeps the NEWEST n of the range
      val tail = TxLog.describeHistory(spark, t, limit = Some(5))
        .collect()
      assert(tail.map(_.getLong(0)).toSeq === (56L to 60L))
      // bounds clamp to the log
      assert(TxLog.describeHistory(spark, t, fromVersion = Some(58L),
        toVersion = Some(999L)).count() === 3L)
      // the FULL default walk would read the deleted commits — loud
      intercept[Exception] {
        TxLog.describeHistory(spark, t).collect()
      }
      ()
    }
  }

  test("AS OF TIMESTAMP resolves the latest commit at-or-before; " +
      "pre-table timestamps fail loudly") {
    withDir { t =>
      CowTable.create(spark, t, Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
      val ts1 = TxLog.commitAt(spark, t, 1L).ts.get
      Thread.sleep(15)
      CowTable.append(spark, t, Seq((2L, 2L)).toDF("k", "v"))
      val ts2 = TxLog.commitAt(spark, t, 2L).ts.get
      assert(TxLog.versionAtTimestamp(spark, t, ts1) === 1L)
      assert(TxLog.versionAtTimestamp(spark, t, ts2 - 1) === 1L)
      assert(TxLog.versionAtTimestamp(spark, t, ts2) === 2L)
      assert(TxLog.versionAtTimestamp(spark, t, ts2 + 3600000) === 2L)
      assert(CowTable.readAsOfTimestamp(spark, t, ts1).count() === 1L)
      assert(CowTable.readAsOfTimestamp(spark, t, ts2).count() === 2L)
      val e = intercept[IllegalArgumentException] {
        TxLog.versionAtTimestamp(spark, t, ts1 - 1000)
      }
      assert(e.getMessage.contains("predates"), e.getMessage)
    }
  }

  test("vacuum reclaims superseded checkpoints (and sidecars), keeps " +
      "the newest two; old reads degrade to the commit fold") {
    withThreshold(3) {
      withDir { t =>
        CowTable.create(spark, t,
          spark.range(200).select(col("id").as("k"), (col("id") % 5).as("v"))
            .repartitionByRange(6, col("k")), Seq("k"))
        // three checkpoint intervals → three checkpoints with sidecars
        (1 to 3 * TxLog.CheckpointInterval).foreach { i =>
          CowTable.append(spark, t, Seq((9000L + i, 1L)).toDF("k", "v"))
        }
        val logDir = new java.io.File(t, TxLog.LogDir)
        def ckpts() = logDir.list().count(_.endsWith(".checkpoint.json"))
        def sidecars() = logDir.list()
          .count(_.endsWith(".checkpoint.files.parquet"))
        assert(ckpts() === 3 && sidecars() === 3)
        CowTable.vacuum(spark, t, retainVersions = 2, retentionMs = 0)
        assert(ckpts() === 2, "keep the newest two checkpoints")
        assert(sidecars() === 2, "sidecars reclaim with their checkpoints")
        // head and DEEP time travel both still read (the old version
        // folds from commits without its reclaimed checkpoint)
        assert(CowTable.read(spark, t).count() === 260L)
        assert(CowTable.read(spark, t, Some(TxLog.CheckpointInterval + 1L))
          .count() === 200L + TxLog.CheckpointInterval)
      }
    }
  }

  test("small tables keep the inline JSON checkpoint (no sidecar)") {
    withDir { t =>
      CowTable.create(spark, t, Seq((1L, 2L)).toDF("k", "v"), Seq("k"))
      (1 to TxLog.CheckpointInterval).foreach { i =>
        CowTable.append(spark, t, Seq((10L + i, 1L)).toDF("k", "v"))
      }
      val logDir = new java.io.File(t, TxLog.LogDir)
      assert(logDir.list().exists(_.endsWith(".checkpoint.json")))
      assert(!logDir.list().exists(_.contains(".checkpoint.files")),
        "small manifest must stay inline JSON")
      assert(CowTable.read(spark, t).count() ===
        1L + TxLog.CheckpointInterval)
    }
  }

  test("checkpoint-resident commit timestamps: AS OF TIMESTAMP on a " +
      "1000+-commit log resolves from ONE checkpoint + the tail, not " +
      "O(history) commit reads") {
    withDir { t =>
      val f = TxLog.fs(spark, t)
      // raw metadata log: 1050 commits with EXPLICIT audit stamps
      // (ts = 1000·v), zero data files — resolution is a pure
      // metadata operation and builds fast
      assert(TxLog.tryCommit(spark, t, TxLog.Commit(1L, "create",
        Seq.empty, Seq.empty, Some("k BIGINT"), Some(Seq("k")),
        ts = Some(1000L))))
      (2L to 1050L).foreach { v =>
        assert(TxLog.tryCommit(spark, t, TxLog.Commit(v, "append",
          Seq.empty, Seq.empty, None, None, ts = Some(1000L * v))))
      }
      // the checkpoint carries the full ts map
      val snap = TxLog.snapshot(spark, t)
      assert(snap.commitTs.exists(_.size === 1050))
      // DELETE the pre-checkpoint commit files (keep v1 for the
      // prehistory error path and the tail after the last checkpoint):
      // resolution must still be exact, PROVING it never reads them
      val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
      val lastCkpt = f.listStatus(logDir).map(_.getPath.getName)
        .filter(_.matches("\\d{20}\\.checkpoint\\.json"))
        .map(_.take(20).toLong).max
      assert(lastCkpt >= 1040L, s"expected checkpoints, got $lastCkpt")
      (2L until lastCkpt).foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(logDir,
          f"$v%020d.json"), false)
      }
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 37) === 37L)
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 37 + 500) === 37L)
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 1050 + 1) === 1050L)
      assert(TxLog.firstVersionAtOrAfter(spark, t, 1000L * 37 + 1) === 38L)
      assert(TxLog.firstVersionAtOrAfter(spark, t, 1000L * 9999) === 1051L)
      val e = intercept[IllegalArgumentException] {
        TxLog.versionAtTimestamp(spark, t, 999L)
      }
      assert(e.getMessage.contains("predates"), e.getMessage)
    }
  }

  test("pre-upgrade checkpoints (no ts map) fall back to per-commit " +
      "reads and stay exact") {
    withDir { t =>
      val f = TxLog.fs(spark, t)
      assert(TxLog.tryCommit(spark, t, TxLog.Commit(1L, "create",
        Seq.empty, Seq.empty, Some("k BIGINT"), Some(Seq("k")),
        ts = Some(1000L))))
      (2L to 30L).foreach { v =>
        assert(TxLog.tryCommit(spark, t, TxLog.Commit(v, "append",
          Seq.empty, Seq.empty, None, None, ts = Some(1000L * v))))
      }
      // forge a pre-upgrade checkpoint: strip the commitTs field from
      // the v20 checkpoint doc
      val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
      val ckpt = new org.apache.hadoop.fs.Path(logDir,
        f"${20L}%020d.checkpoint.json")
      val doc = TxLog.readString(f, ckpt)
      assert(doc.contains("commitTs"))
      val jv = org.json4s.jackson.JsonMethods.parse(doc)
        .removeField { case (n, _) => n == "commitTs" }
      TxLog.writeString(f, ckpt,
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(jv)))
      // versions <= 20 are the legacy gap: resolved via the fallback
      // commit reads; > 20 come from the fold tail
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 7) === 7L)
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 25) === 25L)
      assert(TxLog.firstVersionAtOrAfter(spark, t, 1000L * 19 + 1) === 20L)
    }
  }

  test("the legacy ts-map gap HEALS at the next checkpoint (one " +
      "backfill pass, then bounded forever)") {
    withDir { t =>
      val f = TxLog.fs(spark, t)
      assert(TxLog.tryCommit(spark, t, TxLog.Commit(1L, "create",
        Seq.empty, Seq.empty, Some("k BIGINT"), Some(Seq("k")),
        ts = Some(1000L))))
      (2L to 25L).foreach { v =>
        assert(TxLog.tryCommit(spark, t, TxLog.Commit(v, "append",
          Seq.empty, Seq.empty, None, None, ts = Some(1000L * v))))
      }
      // forge a pre-upgrade v20 checkpoint (strip commitTs)
      val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
      val ckpt = new org.apache.hadoop.fs.Path(logDir,
        f"${20L}%020d.checkpoint.json")
      val jv = org.json4s.jackson.JsonMethods.parse(
        TxLog.readString(f, ckpt))
        .removeField { case (n, _) => n == "commitTs" }
      TxLog.writeString(f, ckpt,
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(jv)))
      // drive to the NEXT checkpoint (v40): the backfill runs there
      (26L to 40L).foreach { v =>
        assert(TxLog.tryCommit(spark, t, TxLog.Commit(v, "append",
          Seq.empty, Seq.empty, None, None, ts = Some(1000L * v))))
      }
      // the healed map covers EVERYTHING: delete the pre-v40 commits
      // and resolution must still be exact for the legacy prefix
      (2L until 40L).foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(logDir,
          f"$v%020d.json"), false)
      }
      assert(TxLog.snapshot(spark, t).commitTs.exists(_.size === 40))
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 7) === 7L)
      assert(TxLog.versionAtTimestamp(spark, t, 1000L * 33 + 5) === 33L)
    }
  }

  test("cow_table_files planning degrades when the sidecar is torn " +
      "(filesAsDf falls back to the commit fold)") {
    withThreshold(3) {
      withDir { t =>
        CowTable.create(spark, t,
          spark.range(100).select(col("id").as("k"))
            .repartitionByRange(4, col("k")), Seq("k"))
        (1 to 20).foreach { i =>
          CowTable.append(spark, t,
            Seq(100L + i).toDF("k"))
        }
        val f = TxLog.fs(spark, t)
        val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
        f.listStatus(logDir).map(_.getPath)
          .filter(_.getName.endsWith(".checkpoint.files.parquet"))
          .foreach(p => f.delete(p, true))
        // the TVF substrate must degrade, not explode at execution
        assert(TxLog.filesAsDf(spark, t).count() === 24L)
      }
    }
  }
}
