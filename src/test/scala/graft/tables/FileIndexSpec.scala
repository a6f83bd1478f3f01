package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-backed FileIndex (round 16 — the last full-read
  * driver ceiling): sidecar-backed FULL scans plan from lean
  * (location, bytes, partition values) entries instead of the decoded
  * AddFile manifest. Pins:
  *
  *   1. a sidecar-backed full read ≡ its inline twin — rows AND
  *      schema — including a PARTITIONED + RENAMED table (partition
  *      values ride the index, the column map conforms);
  *   2. the scan actually plans through [[ManifestFileIndex]] and
  *      partition filters prune FILES before any footer opens;
  *   3. pre-upgrade manifest entries (no `bytes`) back-fill via the
  *      stat pass — reads keep working on legacy logs;
  *   4. shallow-clone EXTERNAL references resolve through the index
  *      (entries under a foreign data root, one relation).
  */
class FileIndexSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_fidx_").toFile
    try f(d.getAbsolutePath) finally rmrf(d)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }
  private def withThreshold[A](n: Int)(f: => A): A = {
    sys.props("graft.txlog.parquetCheckpointThreshold") = n.toString
    try f finally {
      sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
    }
  }

  /** A partitioned, renamed, sidecar-eligible table: 21+ commits so a
    * checkpoint lands under the spec threshold.
    */
  private def build(t: String): Unit = {
    CowTable.create(spark, t,
      spark.range(400).select(col("id").as("k"),
        (col("id") % 4).as("b"),
        concat(lit("s"), col("id")).as("v"))
        .repartitionByRange(4, col("k")),
      Seq("k"), partitionBy = Seq("b"))
    CowTable.renameColumn(spark, t, "v", "val")
    (1 to 20).foreach { i =>
      CowTable.append(spark, t,
        Seq((400L + i, i.toLong % 4, s"w$i")).toDF("k", "b", "val"))
    }
  }

  test("sidecar full read plans through ManifestFileIndex and equals " +
      "the inline twin — rows, schema, partitioned + renamed") {
    withDir { a => withDir { b =>
      val (distT, inlT) = (s"$a/t", s"$b/t")
      withThreshold(3) { build(distT) }
      withThreshold(1000000) { build(inlT) }
      assert(TxLog.snapshotPlanned(spark, distT).isDistributed)
      assert(!TxLog.snapshotPlanned(spark, inlT).isDistributed)
      val dist = CowTable.read(spark, distT)
      val inl = CowTable.read(spark, inlT)
      // the scan is OUR index, not an InMemoryFileIndex re-listing
      val scan = dist.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }
        .getOrElse(fail("no FileSourceScanExec in the sidecar read"))
      assert(scan.relation.location
        .isInstanceOf[org.apache.spark.sql.graft.ManifestFileIndex])
      assert(dist.schema === inl.schema,
        "FileIndex read must surface the exact pinned schema")
      assert(dist.orderBy("k").collect().toSeq ===
        inl.orderBy("k").collect().toSeq)
      // time travel below the rename still reads the OLD name (the
      // index path conforms through the folded DDL + map like any read)
      assert(CowTable.read(spark, distT, Some(1L)).columns.toSeq ===
        Seq("k", "b", "v"))
    } }
  }

  test("partition filters prune files through the index before any " +
      "footer opens") {
    withDir { root =>
      val t = s"$root/t"
      withThreshold(3) { build(t) }
      val df = CowTable.read(spark, t).filter(col("b") === 2L)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      val total = ManifestPlan.livePaths(spark, t,
        TxLog.snapshotPlanned(spark, t)).size.toLong
      val scanned = scan.metrics("numFiles").value
      assert(scanned < total,
        s"partition filter must prune the listing ($scanned vs $total)")
      assert(df.count() === 105L) // 100 base (id%4==2) + appends 2,6,..
    }
  }

  test("pushed DATA filters prune files by zone map through the " +
      "index — the SQL path gets manifest pushdown (round 16)") {
    withDir { root =>
      val t = s"$root/t"
      withThreshold(3) { build(t) }
      // k is range-clustered across the create's 4 files per
      // partition; a narrow k-band must plan a subset of files and
      // still answer exactly
      val df = CowTable.read(spark, t)
        .filter(col("k") >= 100L && col("k") < 150L)
      val got = df.agg(sum("k")).head().getLong(0)
      assert(got === (100L until 150L).sum)
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      val total = ManifestPlan.livePaths(spark, t,
        TxLog.snapshotPlanned(spark, t)).size.toLong
      val scanned = scan.metrics("numFiles").value
      assert(scanned < total,
        s"zone-map data filter must prune files ($scanned vs $total)")
      // ...and through SQL over the TVF face, the same pushdown
      spark.sql(s"SELECT sum(k) FROM cow_table('$t') " +
        "WHERE k >= 100 AND k < 150").head().getLong(0) ===
        (100L until 150L).sum
      ()
    }
  }

  test("pre-upgrade manifests (no bytes) back-fill via the stat pass; " +
      "reads keep working on legacy logs") {
    withThreshold(3) {
      withDir { root =>
        val t = s"$root/t"
        CowTable.create(spark, t,
          spark.range(200).select(col("id").as("k"))
            .repartitionByRange(4, col("k")), Seq("k"))
        (1 to 19).foreach(i => CowTable.append(spark, t,
          Seq(200L + i).toDF("k")))
        // simulate a PRE-UPGRADE log: strip `bytes` from every commit
        // and drop the checkpoints, then land a fresh checkpoint from
        // the stripped fold (its sidecar then carries null bytes)
        val f = TxLog.fs(spark, t)
        val logDir = new org.apache.hadoop.fs.Path(t, TxLog.LogDir)
        f.listStatus(logDir).foreach { st =>
          val n = st.getPath.getName
          if (n.endsWith(".checkpoint.json") ||
              n.endsWith(".checkpoint.files.parquet"))
            f.delete(st.getPath, true)
          else if (n.matches("\\d{20}\\.json")) {
            val doc = TxLog.readString(f, st.getPath)
              .replaceAll(""","bytes":\d+""", "")
            TxLog.writeString(f, st.getPath, doc)
          }
        }
        CowTable.append(spark, t, Seq(999L).toDF("k")) // v21 → checkpoint v20? no: next interval lands at 40
        // force a checkpoint at the CURRENT version by appending to
        // the interval boundary
        val latest = TxLog.latestVersion(spark, t)
        val toInterval = (TxLog.CheckpointInterval -
          (latest % TxLog.CheckpointInterval)) % TxLog.CheckpointInterval
        (1L to toInterval).foreach(i => CowTable.append(spark, t,
          Seq(1000L + i).toDF("k")))
        val planned = TxLog.snapshotPlanned(spark, t)
        assert(planned.isDistributed)
        // most entries carry NO bytes — the lean listing stat-passes
        // them and the full read still answers exactly
        val rootQ = TxLog.fs(spark, t).makeQualified(
          new org.apache.hadoop.fs.Path(t)).toString.stripSuffix("/")
        val lean = ManifestPlan.leanListing(spark, t, planned, rootQ)
        assert(lean.forall(_.bytes > 0L), "every entry gets a real length")
        assert(CowTable.read(spark, t).count() ===
          200L + 19L + 1L + toInterval)
      }
    }
  }

  test("partition values with spaces and percent signs round-trip " +
      "through the index (raw paths, hive unescaping exactly once)") {
    withThreshold(3) {
      withDir { root =>
        val t = s"$root/t"
        // 'a b' exercises a RAW space in the directory name (hive
        // does not escape spaces); '50%off' exercises %-escaping,
        // which a URI-decoding path would double-decode (review r16)
        CowTable.create(spark, t,
          spark.range(90).select(col("id").as("k"),
            when(col("id") % 3 === 0, lit("a b"))
              .when(col("id") % 3 === 1, lit("50%off"))
              .otherwise(lit("plain")).as("p")),
          Seq("k"), partitionBy = Seq("p"))
        (1 to 20).foreach(i => CowTable.append(spark, t,
          Seq((100L + i, "a b")).toDF("k", "p")))
        assert(TxLog.snapshotPlanned(spark, t).isDistributed)
        val df = CowTable.read(spark, t)
        assert(df.groupBy("p").count().orderBy("p").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq ===
          Seq(("50%off", 30L), ("a b", 50L), ("plain", 30L)))
        // partition-filter pruning still holds on the escaped value
        assert(df.filter(col("p") === "50%off").count() === 30L)
        assert(df.filter(col("p") === "a b").count() === 50L)
      }
    }
  }

  test("tryOverwrite is a CAS: a rival commit between the read and " +
      "the publish forces a re-derive instead of silently dropping it") {
    withDir { root =>
      val t = s"$root/t"
      CowTable.create(spark, t,
        spark.range(10).select(col("id").as("k")), Seq("k"))
      val v = TxLog.latestVersion(spark, t)
      // rival lands first
      CowTable.append(spark, t, Seq(99L).toDF("k"))
      assert(!CowTable.tryOverwrite(spark, t,
        spark.range(5).select(col("id").as("k")), v))
      // nothing replaced; the rival's row survives
      assert(CowTable.read(spark, t).count() === 11L)
      // at the CURRENT version the swap goes through
      assert(CowTable.tryOverwrite(spark, t,
        spark.range(5).select(col("id").as("k")),
        TxLog.latestVersion(spark, t)))
      assert(CowTable.read(spark, t).count() === 5L)
    }
  }

  test("shallow-clone external references read through the index " +
      "(foreign data roots in one relation)") {
    withThreshold(3) {
      withDir { root =>
        val src = s"$root/src"
        val dst = s"$root/clone"
        CowTable.create(spark, src,
          spark.range(300).select(col("id").as("k"),
            (col("id") % 4).as("b"))
            .repartitionByRange(3, col("k")),
          Seq("k"), partitionBy = Seq("b"))
        CowTable.shallowClone(spark, src, dst)
        // push the CLONE's log past a checkpoint so ITS manifest goes
        // sidecar — external refs and own appends in one listing
        (1 to 20).foreach(i => CowTable.append(spark, dst,
          Seq((300L + i, i.toLong % 4)).toDF("k", "b")))
        assert(TxLog.snapshotPlanned(spark, dst).isDistributed)
        assert(CowTable.read(spark, dst).count() === 320L)
        // partition values parse against the SOURCE's data root for
        // external entries; pruning holds
        assert(CowTable.read(spark, dst).filter(col("b") === 1L)
          .count() === 80L)
        assert(CowTable.read(spark, dst).agg(sum("k")).head().getLong(0)
          === (0L until 300L).sum + (301L to 320L).sum)
      }
    }
  }

  test("clone commits ride adds-SIDECARS on sidecar-backed sources " +
      "(protocol 5): no driver manifest, reads exact, checkpoint " +
      "absorbs, commit-truth sidecar is loud when torn") {
    withThreshold(3) {
      withDir { root =>
        val src = s"$root/src"
        CowTable.create(spark, src,
          spark.range(300).select(col("id").as("k"),
            (col("id") % 4).as("b"))
            .repartitionByRange(3, col("k")),
          Seq("k"), partitionBy = Seq("b"))
        (1 to 20).foreach(i => CowTable.append(spark, src,
          Seq((300L + i, i.toLong % 4)).toDF("k", "b")))
        assert(TxLog.snapshotPlanned(spark, src).isDistributed)

        // SHALLOW clone: v1 carries addsRef, no inline adds, proto 5
        val sh = s"$root/sh"
        CowTable.shallowClone(spark, src, sh)
        val c1 = TxLog.commitAt(spark, sh, 1L)
        assert(c1.addsRef.isDefined && c1.adds.isEmpty)
        assert(c1.minReader === Some(5))
        val pSh = TxLog.snapshotPlanned(spark, sh)
        assert(pSh.isDistributed && pSh.commitTruthRef)
        assert(CowTable.read(spark, sh).count() === 320L)
        assert(CowTable.read(spark, sh).filter(col("b") === 2L)
          .count() === 80L)
        // the change feed ships the fork's FULL initial contents (the
        // sidecar adds, not the empty inline set), the audit reports
        // the real counts, and provenance stamps every row v1
        assert(CowTable.changesAt(spark, sh, 1L).count() === 320L)
        val h1 = TxLog.describeHistory(spark, sh,
          toVersion = Some(1L)).collect()(0)
        assert(h1.getLong(3) > 0L && h1.getLong(4) === 320L,
          s"history must count sidecar adds, got $h1")
        assert(CowTable.readWithProvenance(spark, sh)
          .filter(col(CowTable.ProvenanceCol) === 1L).count() === 320L)
        // writes flow on the clone; the next checkpoint ROLLS the
        // commit sidecar + tail into a checkpoint sidecar
        (1 to 20).foreach(i => CowTable.append(spark, sh,
          Seq((900L + i, i.toLong % 4)).toDF("k", "b")))
        assert(CowTable.read(spark, sh).count() === 340L)
        assert(!TxLog.snapshotPlanned(spark, sh).commitTruthRef,
          "post-checkpoint plans read the rolled checkpoint sidecar")
        // time travel BELOW the checkpoint still folds through the
        // commit sidecar
        assert(CowTable.read(spark, sh, Some(1L)).count() === 320L)

        // DEEP clone of the sidecar-backed source: own bytes, no
        // external refs, survives source deletion wholesale
        val deep = s"$root/deep"
        CowTable.deepClone(spark, src, deep)
        val d1 = TxLog.commitAt(spark, deep, 1L)
        assert(d1.addsRef.isDefined && d1.minReader === Some(5))
        assert(TxLog.filesAsDf(spark, deep).select("path").collect()
          .forall(r => !TxLog.isExternalPath(r.getString(0))))
        CowTable.dropCloneLease(spark, src, sh)
        val f = TxLog.fs(spark, src)
        f.delete(new org.apache.hadoop.fs.Path(src), true)
        assert(CowTable.read(spark, deep).count() === 320L)
        assert(CowTable.read(spark, deep).filter(col("b") === 1L)
          .count() === 80L)

        // vacuum never reclaims a commit adds-sidecar
        CowTable.vacuum(spark, deep, retainVersions = 1, retentionMs = 0)
        val fd = TxLog.fs(spark, deep)
        assert(fd.listStatus(new org.apache.hadoop.fs.Path(deep,
            TxLog.LogDir)).map(_.getPath.getName)
          .exists(_.contains(".commit.files-")))
        assert(CowTable.read(spark, deep).count() === 320L)

        // the commit sidecar is TRUTH: torn → loud, never silently
        // empty (unlike a checkpoint sidecar's degrade)
        val deep2 = s"$root/deep2"
        CowTable.deepClone(spark, deep, deep2)
        fd.listStatus(new org.apache.hadoop.fs.Path(deep2, TxLog.LogDir))
          .map(_.getPath)
          .filter(_.getName.contains(".commit.files-"))
          .foreach(pp => fd.delete(pp, true))
        intercept[Exception] { CowTable.read(spark, deep2).count() }
        ()
      }
    }
  }

  test("a commit adds-sidecar above version 1 is refused by the fold " +
      "(the lazy set-minus cannot order mid-log ref-adds)") {
    withDir { root =>
      val t = s"$root/t"
      CowTable.create(spark, t,
        spark.range(10).select(col("id").as("k")), Seq("k"))
      // forge v2 with an addsRef
      val forged = TxLog.Commit(2L, "forged", Seq.empty, Seq.empty,
        None, None, minReader = Some(5), addsRef = Some("nope.parquet"))
      assert(TxLog.tryCommit(spark, t, forged))
      val e = intercept[IllegalArgumentException] {
        TxLog.snapshotPlanned(spark, t)
      }
      assert(e.getMessage.contains("constrained to CREATE commits"))
    }
  }
}
