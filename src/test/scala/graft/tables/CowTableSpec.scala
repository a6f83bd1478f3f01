package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CowTableSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cow_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  /** Keyed fixture clustered on k so files carry disjoint zone maps. */
  private def base(n: Int, parts: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
        (col("id") * 7 % 100).as("v"),
        concat(lit("row"), col("id")).as("s"))
      .repartitionByRange(parts, col("k"))

  private def contents(df: DataFrame): Set[(Long, Long, String)] =
    df.select("k", "v", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("create/read round trip preserves contents and schema") {
    withTable { t =>
      val df = base(1000, 4)
      CowTable.create(spark, t, df, Seq("k"))
      val back = CowTable.read(spark, t)
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        df.schema.map(f => (f.name, f.dataType)))
      assert(contents(back) === contents(df))
      assert(TxLog.snapshot(spark, t).files.size === 4)
    }
  }

  test("create refuses an existing table") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      intercept[IllegalArgumentException] {
        CowTable.create(spark, t, base(10, 1), Seq("k"))
      }
    }
  }

  test("append adds rows atomically and conforms column order") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 2), Seq("k"))
      val extra = spark.range(100, 150).select(
        concat(lit("row"), col("id")).as("s"),   // shuffled column order
        (col("id") * 7 % 100).as("v"), col("id").as("k"))
      CowTable.append(spark, t, extra)
      assert(contents(CowTable.read(spark, t)) ===
        contents(base(150, 1)))
    }
  }

  test("merge: upsert + delete + insert, only touched files rewritten") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      val before = TxLog.snapshot(spark, t).files.map(_.path).toSet
      // All update keys live in [0, 110) ⊂ the first of 8 range files,
      // so the batch's key bounds prune the other seven outright.
      val updates = spark.range(50).select(col("id").as("k"),
          lit(-1L).as("v"), lit("upd").as("s"), lit(false).as("del"))
        .union(spark.range(100, 110).select(col("id"), col("id") * 0 - 2,
          lit("x"), lit(true)))                    // deletes: keys 100..109
      val m = CowTable.merge(spark, t, updates, Seq("k"), Some("del"))

      val expect1 = contents(base(1000, 1))
        .filterNot { case (k, _, _) => k < 50 || (k >= 100 && k < 110) } ++
        (0L until 50L).map(k => (k, -1L, "upd"))
      assert(contents(CowTable.read(spark, t)) === expect1)

      // COW discipline: the 7 untouched range files survive verbatim.
      val nowPaths = TxLog.snapshot(spark, t).files.map(_.path).toSet
      assert((before & nowPaths).size === 7)
      assert(m.touchedFiles === 1)
      assert(m.prunedFiles >= 6, s"zone maps should prune, got $m")
      assert(m.removedRows === 125 && m.addedRows === 125 - 10)

      // Insert-only batch: bounds overlap NO file — everything prunes,
      // nothing rewrites, the batch lands as a fresh file.
      val inserts = spark.range(5000, 5010).select(col("id").as("k"),
        lit(9L).as("v"), lit("new").as("s"))
      val m2 = CowTable.merge(spark, t, inserts, Seq("k"))
      assert(m2.touchedFiles === 0 && m2.removedRows === 0 &&
        m2.addedRows === 10)
      assert(contents(CowTable.read(spark, t)) ===
        expect1 ++ (5000L until 5010L).map(k => (k, 9L, "new")))
    }
  }

  test("merge with a NULL update value sets null (no resurrect)") {
    withTable { t =>
      CowTable.create(spark, t, base(20, 1), Seq("k"))
      val upd = Seq((3L, null.asInstanceOf[java.lang.Long], "nulled"))
        .toDF("k", "v", "s")
        .select(col("k"), col("v").cast("long").as("v"), col("s"))
      CowTable.merge(spark, t, upd, Seq("k"))
      val row = CowTable.read(spark, t).filter(col("k") === 3)
        .select("v", "s").collect()(0)
      assert(row.isNullAt(0) && row.getString(1) === "nulled")
    }
  }

  test("merge rejects duplicate keys in the batch") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      val dup = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "v", "s")
      intercept[IllegalArgumentException] {
        CowTable.merge(spark, t, dup, Seq("k"))
      }
    }
  }

  test("time travel: every pre-merge version stays readable") {
    withTable { t =>
      val v1 = base(200, 2)
      CowTable.create(spark, t, v1, Seq("k"))
      CowTable.merge(spark, t,
        Seq((5L, 999L, "m")).toDF("k", "v", "s"), Seq("k"))
      assert(contents(CowTable.read(spark, t, Some(1))) === contents(v1))
      assert(contents(CowTable.read(spark, t))
        .contains((5L, 999L, "m")))
    }
  }

  test("compact: layout shrinks, contents identical") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 10), Seq("k"))
      val before = contents(CowTable.read(spark, t))
      CowTable.compact(spark, t, smallFileRows = 1000, targetFileCount = 2)
      assert(TxLog.snapshot(spark, t).files.size === 2)
      assert(contents(CowTable.read(spark, t)) === before)
    }
  }

  test("vacuum reclaims dropped files but keeps retained versions") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4), Seq("k"))
      CowTable.merge(spark, t,
        Seq((0L, 1L, "a")).toDF("k", "v", "s"), Seq("k"))   // v2
      CowTable.merge(spark, t,
        Seq((0L, 2L, "b")).toDF("k", "v", "s"), Seq("k"))   // v3
      val deleted = CowTable.vacuum(spark, t, retainVersions = 2, retentionMs = 0L)
      assert(deleted.nonEmpty)
      // v2 and v3 retained; v1's rewritten file is gone.
      assert(contents(CowTable.read(spark, t, Some(3)))
        .contains((0L, 2L, "b")))
      assert(contents(CowTable.read(spark, t, Some(2)))
        .contains((0L, 1L, "a")))
      intercept[Exception] {
        CowTable.read(spark, t, Some(1)).collect()
      }
    }
  }

  test("partitioned table: hive layout, round trip, partition pruning") {
    withTable { t =>
      val df = base(400, 2).withColumn("b", col("k") % 4)
      CowTable.create(spark, t, df, Seq("k"), partitionBy = Seq("b"))

      // Files live under hive-style b=<v> segments and carry the
      // partition value as exact point stats.
      val snap = TxLog.snapshot(spark, t)
      assert(snap.partitionCols === Some(Seq("b")))
      assert(snap.files.nonEmpty && snap.files.forall(_.path.contains("/b=")))
      assert(snap.files.forall { f =>
        val st = f.stats("b"); st.min === st.max
      })

      // Round trip reconstructs the partition column from the dirs.
      val back = CowTable.read(spark, t)
      assert(back.select("k", "v", "s", "b").collect().map(_.toSeq).toSet ===
        df.collect().map(_.toSeq).toSet)

      // Merge keyed (b, k): bounds on b prune every other partition.
      val upd = spark.range(100).select((col("id") * 4 + 2).as("k"))
        .filter(col("k") < 120)
        .select(col("k"), lit(-7L).as("v"), lit("p").as("s"),
          lit(2L).as("b"))
      val m = CowTable.merge(spark, t, upd, Seq("b", "k"))
      assert(m.prunedFiles > 0 &&
        m.prunedFiles + m.candidateFiles === snap.files.size)
      // every non-b=2 file survived untouched
      val after = TxLog.snapshot(spark, t)
      assert(snap.files.filterNot(_.path.contains("/b=2/")).toSet
        .subsetOf(after.files.toSet))
      // rewritten + appended rows land back under their partition dirs
      assert(after.files.forall(_.path.contains("/b=")))
      assert(CowTable.read(spark, t).filter(col("v") === -7L).count() ===
        upd.count())

      // compact preserves the partitioned layout and the contents
      val pre = CowTable.read(spark, t).collect().map(_.toSeq).toSet
      CowTable.compact(spark, t, smallFileRows = Long.MaxValue,
        targetFileCount = 1)
      val cSnap = TxLog.snapshot(spark, t)
      assert(cSnap.files.forall(_.path.contains("/b=")))
      assert(CowTable.read(spark, t).collect().map(_.toSeq).toSet === pre)
    }
  }

  test("optimize restores zone-map selectivity after scattered ingest") {
    withTable { t =>
      // Round-robin ingest: every file spans the whole key range, so
      // zone maps are useless — a narrow merge touches everything.
      CowTable.create(spark, t, base(1000, 1).repartition(8), Seq("k"))
      val upd1 = spark.range(50).select(col("id").as("k"),
        lit(-1L).as("v"), lit("u1").as("s"))
      val m1 = CowTable.merge(spark, t, upd1, Seq("k"))
      assert(m1.prunedFiles === 0 && m1.touchedFiles >= 6,
        s"scattered layout should defeat pruning, got $m1")

      val before = contents(CowTable.read(spark, t))
      CowTable.optimize(spark, t,
        _.repartitionByRange(8, col("k")).sortWithinPartitions("k"))
      assert(contents(CowTable.read(spark, t)) === before)

      // Same narrow key range again: now the clustered layout prunes
      // everything but the low-range file(s).
      val upd2 = spark.range(50).select(col("id").as("k"),
        lit(-2L).as("v"), lit("u2").as("s"))
      val m2 = CowTable.merge(spark, t, upd2, Seq("k"))
      assert(m2.prunedFiles >= 6 && m2.touchedFiles <= 2,
        s"optimize should restore pruning, got $m2")
      assert(contents(CowTable.read(spark, t)) ===
        before.filterNot(_._1 < 50) ++
          (0L until 50L).map(k => (k, -2L, "u2")))
    }
  }

  test("commit CAS: exactly one writer wins a version") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      val c = TxLog.Commit(2L, "append", Seq.empty, Seq.empty, None, None)
      assert(TxLog.tryCommit(spark, t, c))
      assert(!TxLog.tryCommit(spark, t, c.copy(op = "rival")))
      assert(TxLog.commitAt(spark, t, 2L).op === "append")
    }
  }

  test("log replay: operations against a moved snapshot land after it") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      // A rival lands version 2 directly; the merge must serialize
      // after it (replay loop), not clobber it.
      assert(TxLog.tryCommit(spark, t,
        TxLog.Commit(2L, "append", Seq.empty, Seq.empty, None, None)))
      val m = CowTable.merge(spark, t,
        Seq((1L, 42L, "m")).toDF("k", "v", "s"), Seq("k"))
      assert(m.version === 3L)
      assert(contents(CowTable.read(spark, t)).contains((1L, 42L, "m")))
    }
  }

  test("checkpoint: long logs fold from the checkpoint, same contents") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      (1 to 21).foreach { i =>
        CowTable.append(spark, t,
          Seq((1000L + i, i.toLong, s"a$i")).toDF("k", "v", "s"))
      }
      val f = TxLog.fs(spark, t)
      assert(f.exists(new org.apache.hadoop.fs.Path(t,
        f"${TxLog.LogDir}/${20L}%020d.checkpoint.json")))
      val snap = TxLog.snapshot(spark, t)
      assert(snap.version === 22L)
      assert(contents(CowTable.read(spark, t)) ===
        contents(base(10, 1)) ++
          (1 to 21).map(i => (1000L + i, i.toLong, s"a$i")))
    }
  }

  test("describeHistory reports each commit's accounting") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4), Seq("k"))
      CowTable.append(spark, t, Seq((999L, 1L, "z")).toDF("k", "v", "s"),
        Some(TxLog.Txn("app", 5L)))
      CowTable.merge(spark, t, Seq((0L, 1L, "m")).toDF("k", "v", "s"),
        Seq("k"))
      val h = TxLog.describeHistory(spark, t)
        .orderBy("version").collect()
      assert(h.map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "create"), (2L, "append"), (3L, "merge")))
      assert(h(0).getAs[Long]("rows_added") === 100 &&
        h(0).getAs[Long]("files_removed") === 0)
      assert(h(1).getAs[String]("txn") === "app@5")
      assert(h(2).getAs[Long]("files_removed") === 1)
      // wall-clock stamps: present and non-decreasing in version order
      val ts = h.map(_.getAs[java.sql.Timestamp]("timestamp"))
      assert(ts.forall(_ != null))
      assert(ts.sliding(2).forall(p => !p(0).after(p(1))))
    }
  }

  test("vacuum dry run reports exactly what a real pass then deletes") {
    withTable { t =>
      CowTable.create(spark, t, base(200, 2), Seq("k"))
      CowTable.merge(spark, t,
        Seq((5L, 1L, "m", false)).toDF("k", "v", "s", "del"),
        Seq("k"), Some("del"))
      CowTable.compact(spark, t, smallFileRows = 1000, targetFileCount = 1)
      val planned = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 0, dryRun = true).sorted
      assert(planned.nonEmpty)
      // nothing was touched: every old version still reads
      assert(CowTable.read(spark, t, Some(1L)).count() === 200)
      val real = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 0).sorted
      assert(real === planned)
      assert(CowTable.read(spark, t).count() === 200)
    }
  }

  test("changesAt exposes a commit's added rows") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      CowTable.append(spark, t, Seq((99L, 9L, "z")).toDF("k", "v", "s"))
      assert(contents(CowTable.changesAt(spark, t, 2L)) ===
        Set((99L, 9L, "z")))
    }
  }

  test("string partition values survive hive escaping (space, colon)") {
    withTable { t =>
      val df = Seq((1L, "us east"), (2L, "eu:west"), (3L, "us east"))
        .toDF("k", "region")
      CowTable.create(spark, t, df, Seq("k"), partitionBy = Seq("region"))
      val back = CowTable.read(spark, t)
      assert(back.select("k", "region").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet ===
        Set(1L -> "us east", 2L -> "eu:west", 3L -> "us east"))
      CowTable.merge(spark, t,
        Seq((2L, "eu:west")).toDF("k", "region"), Seq("k"))
      assert(CowTable.read(spark, t).count() === 3)
    }
  }

  test("concurrent writers all serialize through the CAS, none lost") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (0 until 4).map { w =>
        Future {
          (0 until 5).foreach { i =>
            CowTable.append(spark, t,
              Seq((1000L + w * 100 + i, w.toLong, s"w$w-$i"))
                .toDF("k", "v", "s"))
          }
        }
      }
      Await.result(Future.sequence(writers), 600.seconds)
      // 1 create + 20 appends, every row exactly once
      assert(TxLog.latestVersion(spark, t) === 21L)
      assert(CowTable.read(spark, t).count() === 30L)
      assert(CowTable.read(spark, t).filter(col("k") >= 1000)
        .select("k").distinct().count() === 20L)
    }
  }

  test("schema evolution: additive columns, typed nulls, old versions") {
    withTable { t =>
      CowTable.create(spark, t, base(20, 1), Seq("k"))
      // un-evolved append drops extra passenger columns silently
      CowTable.append(spark, t, Seq((100L, 1L, "x", 9.5))
        .toDF("k", "v", "s", "extra"))
      assert(!CowTable.read(spark, t).columns.contains("extra"))

      // evolved append adds the column; every pre-evolution row null
      CowTable.append(spark, t,
        Seq((101L, 2L, "y", 7.5)).toDF("k", "v", "s", "score"),
        mergeSchema = true)
      val r = CowTable.read(spark, t)
      assert(r.schema("score").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(r.filter(col("score").isNotNull).count() === 1)
      assert(r.count() === 22)

      // pre-evolution versions keep their old schema (time travel)
      assert(!CowTable.read(spark, t, Some(2)).columns.contains("score"))

      // evolved MERGE: matched row gets the value, survivors stay null
      CowTable.merge(spark, t,
        Seq((3L, 3L, "z", 1.25, 4.5)).toDF("k", "v", "s", "score", "w"),
        Seq("k"), mergeSchema = true)
      val r2 = CowTable.read(spark, t)
      assert(r2.filter(col("k") === 3).select("w").collect()(0)
        .getDouble(0) === 4.5)
      assert(r2.filter(col("w").isNotNull).count() === 1)

      // retypes are rejected loudly
      val err = intercept[IllegalArgumentException] {
        CowTable.append(spark, t,
          Seq(("nope", 1L, "s")).toDF("k", "v", "s"))
      }
      assert(err.getMessage.contains("retypes are not supported"))
    }
  }

  test("ColStats pruning predicates are conservative and exact") {
    val longSt = TxLog.ColStats("long", "10", "20")
    assert(longSt.mayOverlap(15, 30) && longSt.mayOverlap(0, 10) &&
      !longSt.mayOverlap(21, 99) && !longSt.mayOverlap(-5, 9))
    assert(longSt.mayContain(10) && !longSt.mayContain(9))
    val strSt = TxLog.ColStats("string", "b", "d")
    assert(strSt.mayOverlap("a", "b") && !strSt.mayOverlap("e", "z"))
    val opaque = TxLog.ColStats("opaque", "", "")
    assert(opaque.mayOverlap("anything", "at all"))

    // A file spanning ["", U+10000] CONTAINS U+FFFD under code-point
    // order; Java compareTo ranks the supplementary max (surrogate
    // 0xD800...) BELOW U+FFFD and would prune the matching file.
    val supp = new String(Character.toChars(0x10000))
    val span = TxLog.ColStats("string", "", supp)
    assert(span.mayContain("\uFFFD"),
      "UTF-16 comparison would wrongly prune this file")
    assert(span.mayContain(supp) && span.mayContain("a"))
    val above = TxLog.ColStats("string", supp, supp)
    assert(!above.mayContain("\uFFFD") && above.mayContain(supp))
    // NaN bounds never prune (NaN sorts above all doubles in Spark)
    assert(TxLog.ColStats("double", "1.0", "2.0")
      .mayOverlap("NaN", "NaN"))
    assert(TxLog.ColStats("double", "NaN", "NaN").mayOverlap("5.0", "6.0"))

    // Null tracking: legacy manifests (no flag) never prune against a
    // null-keyed batch; recorded flags answer exactly.
    assert(TxLog.ColStats("long", "10", "20").mayHaveNulls)
    assert(TxLog.ColStats("long", "10", "20", Some(true)).mayHaveNulls)
    assert(!TxLog.ColStats("long", "10", "20", Some(false)).mayHaveNulls)
  }

  test("merge with null keys keeps the file whose range hides the null") {
    withTable { t =>
      // File A: a null-keyed row + keys 0..9 (nulls sort FIRST under
      // range partitioning); file B: keys 1000..1009. A's zone map
      // reads [0, 9] — min/max ignore nulls — so a range-only pruner
      // drops A against a batch bounded at 1005 even though the
      // batch's null key MATCHES A's null row via <=> (the round-12
      // advice bug: the update would silently duplicate).
      val rows = (0L to 9L).map(k => (java.lang.Long.valueOf(k), k, "a")) ++
        Seq((null.asInstanceOf[java.lang.Long], -1L, "null-row")) ++
        (1000L to 1009L).map(k => (java.lang.Long.valueOf(k), k, "b"))
      val df = rows.toDF("k", "v", "s").repartitionByRange(2, col("k"))
      CowTable.create(spark, t, df, Seq("k"))
      val snap = TxLog.snapshot(spark, t)
      assert(snap.files.size === 2)
      assert(snap.files.count(_.stats("k").mayHaveNulls) === 1)

      val upd = Seq(
        (null.asInstanceOf[java.lang.Long], -2L, "null-upd"),
        (java.lang.Long.valueOf(1005L), -3L, "b-upd")).toDF("k", "v", "s")
      val m = CowTable.merge(spark, t, upd, Seq("k"))
      assert(m.candidateFiles === 2, s"null-holding file was pruned: $m")

      val back = CowTable.read(spark, t)
      assert(back.count() === 21, "a pruned null match became a duplicate")
      val nullRows = back.filter(col("k").isNull)
        .select("v", "s").collect()
      assert(nullRows.length === 1 &&
        nullRows(0).getLong(0) === -2L &&
        nullRows(0).getString(1) === "null-upd")
      assert(back.filter(col("k") === 1005).select("s").collect()(0)
        .getString(0) === "b-upd")
    }
  }

  test("all-null-key batch prunes every null-free file") {
    withTable { t =>
      val rows = (0L to 9L).map(k => (java.lang.Long.valueOf(k), k, "a")) ++
        Seq((null.asInstanceOf[java.lang.Long], -1L, "null-row")) ++
        (1000L to 1009L).map(k => (java.lang.Long.valueOf(k), k, "b"))
      val df = rows.toDF("k", "v", "s").repartitionByRange(2, col("k"))
      CowTable.create(spark, t, df, Seq("k"))

      val upd = Seq((null.asInstanceOf[java.lang.Long], -2L, "null-upd"))
        .toDF("k", "v", "s")
      val m = CowTable.merge(spark, t, upd, Seq("k"))
      // only the null-holding file is a candidate; the null-free file
      // is pruned AND survives verbatim
      assert(m.candidateFiles === 1 && m.prunedFiles === 1)
      val back = CowTable.read(spark, t)
      assert(back.count() === 21)
      assert(back.filter(col("k").isNull).select("s").collect()(0)
        .getString(0) === "null-upd")
    }
  }

  test("vacuum age gate protects in-flight writers' published files") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4), Seq("k"))
      CowTable.merge(spark, t,
        Seq((0L, 1L, "a")).toDF("k", "v", "s"), Seq("k"))   // v2
      val tDir = new java.io.File(t)

      // Simulate an in-flight writer: a data file PUBLISHED into data/
      // (writeFiles renames before TxLog.tryCommit) and a staging dir
      // still being written — both fresh, neither referenced by any
      // snapshot yet.
      val dataDir = new java.io.File(tDir, "data")
      val inflight = new java.io.File(dataDir, "inflight-part-0.parquet")
      java.nio.file.Files.write(inflight.toPath, Array[Byte](1, 2, 3))
      val stagingOp = new java.io.File(tDir, ".staging/op-live")
      stagingOp.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(stagingOp, "part-0.parquet").toPath,
        Array[Byte](4, 5))

      // Retention 1h: NOTHING is young enough to reclaim — the
      // unreferenced v1 file, the in-flight publish, and the live
      // staging all survive.
      val d1 = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 3600L * 1000)
      assert(d1.isEmpty && inflight.exists && stagingOp.exists)

      // Age ONLY the truly-dead v1 file past the horizon: vacuum
      // reclaims it while the fresh in-flight artifacts still survive.
      val live = TxLog.snapshot(spark, t).files.map(_.path).toSet
      val old = java.lang.System.currentTimeMillis() - 7200L * 1000
      val root = tDir.getAbsolutePath
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(dataDir).foreach { f =>
        val rel = f.getAbsolutePath.stripPrefix(root).stripPrefix("/")
        if (!live.contains(rel) && f != inflight) f.setLastModified(old)
      }
      val d2 = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 3600L * 1000)
      assert(d2.nonEmpty && inflight.exists && stagingOp.exists)
      assert(CowTable.read(spark, t).count() === 100)

      // A crashed writer's staging (everything old) IS swept.
      walk(stagingOp).foreach(_.setLastModified(old))
      stagingOp.setLastModified(old)
      CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 3600L * 1000)
      assert(!stagingOp.exists)

      // Crashed-writer LOG leftovers (commit temps / staged
      // checkpoints): fresh ones survive, aged ones are swept, real
      // log files are untouched either way.
      val logDir = new java.io.File(tDir, "_txlog")
      val freshTmp = new java.io.File(logDir, ".tmp-crash-99.json")
      val agedTmp = new java.io.File(logDir, ".ckpt-crash-20.tmp")
      java.nio.file.Files.write(freshTmp.toPath, Array[Byte](1))
      java.nio.file.Files.write(agedTmp.toPath, Array[Byte](2))
      agedTmp.setLastModified(old)
      val nLogs = logDir.listFiles().count(!_.getName.startsWith("."))
      CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 3600L * 1000)
      assert(freshTmp.exists && !agedTmp.exists)
      assert(logDir.listFiles().count(!_.getName.startsWith(".")) === nLogs)
      assert(CowTable.read(spark, t).count() === 100)
    }
  }

  test("appends racing a vacuum loop lose nothing under the age gate") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (0 until 2).map { w =>
        Future {
          (0 until 4).foreach { i =>
            CowTable.append(spark, t,
              Seq((2000L + w * 100 + i, w.toLong, s"w$w-$i"))
                .toDF("k", "v", "s"))
          }
        }
      }
      val vacuums = Future {
        (0 until 6).foreach { _ =>
          CowTable.vacuum(spark, t, retainVersions = 1,
            retentionMs = 3600L * 1000)
          Thread.sleep(50)
        }
      }
      Await.result(Future.sequence(writers :+ vacuums), 600.seconds)
      assert(CowTable.read(spark, t).count() === 18L)
      assert(CowTable.read(spark, t).filter(col("k") >= 2000)
        .select("k").distinct().count() === 8L)
    }
  }

  test("conditional merge: clause gates updates, SET stays partial") {
    withTable { t =>
      CowTable.create(spark, t, base(20, 2), Seq("k"))
      // guard: update only when the incoming v EXCEEDS the standing v
      // (the out-of-order CDC shape); SET only (v) — s is poisoned and
      // must never land; tombstone on k=4 deletes regardless of the
      // clause (4*7%100=28 > 1, clause would PASS; and k=6 tombstone
      // where clause FAILS: 6*7=42 > 999 false — both must delete).
      val upd = Seq(
        (1L, 999L, "poison", false),  // 1*7=7   < 999 → update
        (2L, 0L, "poison", false),    // 2*7=14  > 0   → unchanged
        (4L, 1L, "poison", true),     // delete (clause true)
        (6L, -1L, "poison", true),    // delete (clause false)
        (100L, 5L, "new", false))     // no match → full-row insert
        .toDF("k", "v", "s", "del")
      val m = CowTable.merge(spark, t, upd, Seq("k"), Some("del"),
        matchedCondition = Some((tgt, src) => src("v") > tgt("v")),
        setCols = Some(Seq("v")))
      val got = contents(CowTable.read(spark, t))
      val expect = contents(base(20, 1))
        .filterNot { case (k, _, _) => Set(1L, 4L, 6L).contains(k) } ++
        Set((1L, 999L, "row1"),   // v updated, s kept (partial SET)
          (100L, 5L, "new"))      // insert is always full-row
      assert(got === expect)
      assert(m.removedRows > 0)
    }
  }

  test("conditional merge rejects SET columns outside the table") {
    withTable { t =>
      CowTable.create(spark, t, base(5, 1), Seq("k"))
      val e = intercept[IllegalArgumentException] {
        CowTable.merge(spark, t, Seq((1L, 2L, "x")).toDF("k", "v", "s"),
          Seq("k"), setCols = Some(Seq("nope")))
      }
      assert(e.getMessage.contains("setCols"))
    }
  }

  test("optimizeWhere rewrites only the predicate's files") {
    withTable { t =>
      // 8 range-clustered files, then ONE scattered file spanning the
      // whole key space (the ingest-pollution shape).
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      CowTable.append(spark, t,
        Seq((5L, 1L, "sc1"), (995L, 1L, "sc2")).toDF("k", "v", "s")
          .repartition(1))
      val before = TxLog.snapshot(spark, t)
      val beforeContents = contents(CowTable.read(spark, t))

      // Scope: low half of the key space — selects the scattered file
      // plus the low range files; the HIGH range files survive with
      // their manifest entries (and bytes) untouched.
      val highFiles = before.files.filter(f =>
        f.stats("k").min.toLong >= 500).map(_.path).toSet
      assert(highFiles.nonEmpty)
      val rewritten = CowTable.optimizeWhere(spark, t, "k", "0", "499",
        _.repartitionByRange(4, col("k")).sortWithinPartitions("k"))
      assert(rewritten > 0 &&
        rewritten < before.files.size, s"scoped rewrite hit $rewritten")

      val after = TxLog.snapshot(spark, t)
      assert(highFiles.subsetOf(after.files.map(_.path).toSet),
        "files outside the predicate must survive untouched")
      assert(contents(CowTable.read(spark, t)) === beforeContents)

      // Selectivity restored: a narrow low-range merge prunes again
      // (before the optimize, the scattered file was a candidate for
      // EVERY range).
      val m = CowTable.merge(spark, t,
        Seq((5L, -9L, "m")).toDF("k", "v", "s"), Seq("k"))
      assert(m.prunedFiles >= after.files.size - 2,
        s"zone maps should prune after the scoped optimize: $m")

      // Empty predicate range: no files selected, no commit.
      val v = TxLog.latestVersion(spark, t)
      assert(CowTable.optimizeWhere(spark, t, "k",
        "5000000", "6000000", identity) === 0L)
      assert(TxLog.latestVersion(spark, t) === v)
    }
  }

  test("deleteWhere: TRUE rows go, NULL rows stay, files untouched") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      // null one row's v so the predicate goes three-valued
      CowTable.merge(spark, t,
        Seq((700L, null.asInstanceOf[java.lang.Long], "nullv"))
          .toDF("k", "v", "s")
          .select(col("k"), col("v").cast("long").as("v"), col("s")),
        Seq("k"))
      val before = TxLog.snapshot(spark, t).files.map(_.path).toSet

      // matches live only in [0, 110): keys k<110 with v = k*7%100 > 50
      val m = CowTable.deleteWhere(spark, t,
        col("v") > 50 && col("k") < 110)
      assert(m.touchedFiles >= 1 && m.prunedFiles >= 6,
        s"probe should touch only the low files: $m")
      // the k < 110 conjunct pre-prunes the probe at the MANIFEST:
      // only the low range files are scanned at all
      assert(m.candidateFiles <= 2,
        s"manifest pre-prune should bound the probe: $m")
      val nowPaths = TxLog.snapshot(spark, t).files.map(_.path).toSet
      assert((before -- nowPaths).size === m.touchedFiles)

      // the NULL-v row SURVIVES a TRUE-only delete (three-valued SQL)
      assert(CowTable.read(spark, t).filter(col("k") === 700).count() === 1)
      val nDeleted = contents(base(1000, 1))
        .count { case (k, v, _) => v > 50 && k < 110 && k != 700L }
      assert(nDeleted > 0 &&
        CowTable.read(spark, t).count() === 1000L - nDeleted)
      assert(CowTable.read(spark, t)
        .filter(col("v") > 50 && col("k") < 110).count() === 0)

      // no matches → no commit
      val v = TxLog.latestVersion(spark, t)
      val m2 = CowTable.deleteWhere(spark, t, col("k") === -42L)
      assert(m2.touchedFiles === 0 && TxLog.latestVersion(spark, t) === v)
    }
  }

  test("updateWhere: SET may reference the row, misses pass through") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4), Seq("k"))
      val m = CowTable.updateWhere(spark, t, col("k") < 10,
        Map("v" -> (col("v") * 100L + col("k")), "s" -> lit("upd")))
      assert(m.touchedFiles === 1 && m.rowsBefore === m.rowsAfter)
      val got = contents(CowTable.read(spark, t))
      val expect = contents(base(100, 1)).map {
        case (k, v, _) if k < 10 => (k, v * 100L + k, "upd")
        case r => r
      }
      assert(got === expect)
      intercept[IllegalArgumentException] {
        CowTable.updateWhere(spark, t, col("k") < 5, Map.empty)
      }
    }
  }

  test("restore: head returns to the target version, history intact") {
    withTable { t =>
      val orig = base(200, 2)
      CowTable.create(spark, t, orig, Seq("k"))                    // v1
      CowTable.merge(spark, t,
        Seq((5L, 999L, "bad")).toDF("k", "v", "s"), Seq("k"))      // v2
      CowTable.deleteWhere(spark, t, col("k") < 20)                // v3
      CowTable.restore(spark, t, 1L)                               // v4
      assert(TxLog.latestVersion(spark, t) === 4L)
      assert(contents(CowTable.read(spark, t)) === contents(orig))
      // the bad history is STILL auditable (no rewrite)
      assert(contents(CowTable.read(spark, t, Some(2)))
        .contains((5L, 999L, "bad")))
      // restoring to the restore commit is a no-op (no new version)
      CowTable.restore(spark, t, 4L)
      assert(TxLog.latestVersion(spark, t) === 4L)
      // vacuumed target fails loudly instead of publishing dead refs
      CowTable.merge(spark, t,
        Seq((6L, 1L, "x")).toDF("k", "v", "s"), Seq("k"))          // v5
      CowTable.vacuum(spark, t, retainVersions = 1, retentionMs = 0L)
      val e = intercept[IllegalArgumentException] {
        CowTable.restore(spark, t, 2L)
      }
      assert(e.getMessage.contains("vacuum"))
    }
  }

  test("merge cdc sidecar: exact pre/post/delete/insert rows") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4), Seq("k"))
      val upd = Seq(
        (3L, -3L, "u3", false),    // update
        (7L, -7L, "u7", false),    // update gated OFF by the condition
        (5L, 0L, "", true),        // delete
        (900L, 9L, "new", false))  // insert
        .toDF("k", "v", "s", "del")
      CowTable.merge(spark, t, upd, Seq("k"), Some("del"),
        matchedCondition = Some((tgt, src) => src("k") =!= 7L),
        cdc = true)
      val cdc = CowTable.changesCdcAt(spark, t, 2L)
        .collect().map(r => (r.getString(3), r.getLong(0), r.getLong(1),
          r.getString(2))).toSet
      // base row k: (k, k*7%100, "row"+k)
      assert(cdc === Set(
        ("update_preimage", 3L, 21L, "row3"),
        ("update_postimage", 3L, -3L, "u3"),
        ("delete", 5L, 35L, "row5"),
        ("insert", 900L, 9L, "new")))
      // a failed-condition match emits NOTHING (k=7 untouched)
      assert(contents(CowTable.read(spark, t)).contains((7L, 49L, "row7")))
      // non-CDC commits answer loudly
      intercept[RuntimeException] {
        CowTable.changesCdcAt(spark, t, 1L)
      }
      // vacuum keeps retained CDC, reaps aged unreferenced dirs
      val kept = CowTable.vacuum(spark, t, retainVersions = 2,
        retentionMs = 0L)
      assert(CowTable.changesCdcAt(spark, t, 2L).count() === 4)
      assert(!kept.exists(_.startsWith("_cdc/")))
    }
  }

  test("merge that deletes every touched row publishes no empty file") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      val m = CowTable.merge(spark, t,
        base(10, 1).select(col("k"), col("v"), col("s"),
          lit(true).as("del")),
        Seq("k"), Some("del"))
      assert(m.removedRows === 10)
      assert(CowTable.read(spark, t).count() === 0)
      // the manifest holds NO zero-row stragglers
      assert(TxLog.snapshot(spark, t).files.forall(_.rows > 0))
      // and the table keeps working afterwards
      CowTable.append(spark, t, Seq((99L, 1L, "z")).toDF("k", "v", "s"))
      assert(contents(CowTable.read(spark, t)) === Set((99L, 1L, "z")))
    }
  }

  test("racing CDC merges: committed sidecars fold to the final state") {
    withTable { t =>
      // Both writers touch the SAME file (keys 0..9 in one file), so
      // one loses the version CAS and must REPLAY — the hazard is a
      // committed commit referencing the sidecar of the PRE-replay
      // attempt (computed against the stale snapshot). Folding the
      // committed sidecars over the v1 contents must reproduce the
      // final table exactly.
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val ops = Seq(
        Seq((2L, -2L, "w1", false), (8L, 0L, "", true)),  // upd + del
        Seq((3L, -3L, "w2", false), (11L, 1L, "ins", false)))
        .map(rows => Future {
          CowTable.merge(spark, t, rows.toDF("k", "v", "s", "del"),
            Seq("k"), Some("del"), cdc = true)
        })
      Await.result(Future.sequence(ops), 600.seconds)
      assert(TxLog.latestVersion(spark, t) === 3L)

      // driver-side CDC fold: apply effects version by version
      var state = contents(CowTable.read(spark, t, Some(1L)))
        .map(r => r._1 -> r).toMap
      (2L to 3L).foreach { v =>
        CowTable.changesCdcAt(spark, t, v).collect().foreach { r =>
          val row = (r.getLong(0), r.getLong(1), r.getString(2))
          r.getString(3) match {
            case "insert" | "update_postimage" => state += row._1 -> row
            case "delete" => state -= row._1
            case "update_preimage" => ()
          }
        }
      }
      assert(state.values.toSet === contents(CowTable.read(spark, t)),
        "committed CDC does not reproduce the committed table")
    }
  }

  test("deleteWhere racing an append serializes to a coherent state") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 2), Seq("k"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val del = Future {
        CowTable.deleteWhere(spark, t, col("v") > 50)
      }
      val app = Future {
        CowTable.append(spark, t,
          Seq((500L, 99L, "late"), (501L, 10L, "low"))
            .toDF("k", "v", "s"))
      }
      Await.result(Future.sequence(Seq(del.map(_ => ()), app)), 600.seconds)
      val got = contents(CowTable.read(spark, t))
      val kept = contents(base(100, 1)).filterNot(_._2 > 50)
      // serialization decides whether the late v=99 row was screened
      val a = kept ++ Set((500L, 99L, "late"), (501L, 10L, "low"))
      val b = kept + ((501L, 10L, "low"))
      assert(got === a || got === b, s"incoherent state: $got")
    }
  }

  test("readWhere plans only the covering files, rows exact") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      val narrow = CowTable.readWhere(spark, t,
        col("k") >= 10L && col("k") < 50L && col("s") =!= "row11")
      // exact rows: the FULL predicate applies, not just the ranges
      assert(narrow.count() === 39)
      // manifest pruning: only the low range file(s) are planned
      assert(narrow.inputFiles.length <= 2,
        s"planned ${narrow.inputFiles.length} of 8 files")
      // an unprunable predicate still answers exactly over all files
      val all = CowTable.readWhere(spark, t, length(col("s")) > 5)
      assert(all.count() === contents(base(1000, 1))
        .count(_._3.length > 5))
    }
  }

  test("CHECK constraints gate every row-adding write, wholly") {
    withTable { t =>
      CowTable.create(spark, t, base(20, 1), Seq("k"))
      CowTable.addConstraint(spark, t, "v_nonneg", "v >= 0")
      val v0 = TxLog.latestVersion(spark, t)

      // a violating append publishes NOTHING — not even its valid rows
      val e = intercept[RuntimeException] {
        CowTable.append(spark, t,
          Seq((100L, 5L, "ok"), (101L, -1L, "bad")).toDF("k", "v", "s"))
      }
      assert(e.getMessage.contains("v_nonneg"))
      assert(TxLog.latestVersion(spark, t) === v0)
      assert(CowTable.read(spark, t).count() === 20)

      // a violating UPDATE through merge fails wholly too
      intercept[RuntimeException] {
        CowTable.merge(spark, t,
          Seq((3L, -7L, "neg")).toDF("k", "v", "s"), Seq("k"))
      }
      assert(contents(CowTable.read(spark, t)).contains((3L, 21L, "row3")))

      // NULL passes (SQL CHECK semantics) and clean writes land
      CowTable.merge(spark, t,
        Seq((4L, null.asInstanceOf[java.lang.Long], "nullv"))
          .toDF("k", "v", "s")
          .select(col("k"), col("v").cast("long").as("v"), col("s")),
        Seq("k"))
      CowTable.append(spark, t, Seq((100L, 5L, "ok")).toDF("k", "v", "s"))
      assert(CowTable.read(spark, t).count() === 21)

      // adding a constraint the EXISTING data violates is refused
      val e2 = intercept[IllegalArgumentException] {
        CowTable.addConstraint(spark, t, "s_short", "length(s) < 2")
      }
      assert(e2.getMessage.contains("existing row"))

      // dropped constraints stop validating
      CowTable.dropConstraint(spark, t, "v_nonneg")
      CowTable.merge(spark, t,
        Seq((5L, -9L, "neg-ok")).toDF("k", "v", "s"), Seq("k"))
      val r5 = CowTable.read(spark, t).filter(col("k") === 5)
        .select("v", "s").collect()(0)
      assert(r5.getLong(0) === -9L && r5.getString(1) === "neg-ok")
    }
  }

  test("append re-validates constraints added during its write window") {
    // ADVICE r12: append validated constraints once, against snap0,
    // OUTSIDE the retry loop — an addConstraint landing between snap0
    // and the winning CAS could let violating rows publish into a
    // constrained table. The retry loop must treat a changed
    // constraint set as a conflicting metadata commit and re-validate
    // the published-but-uncommitted adds. Interleaving: wait for the
    // append's .staging dir (it has read snap0 and is writing), then
    // land the constraint; bounded re-tries keep the spec honest if
    // the narrow lose-the-race window ever hits.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    var raced = false
    var attempt = 0
    while (!raced && attempt < 5) {
      attempt += 1
      withTable { t =>
        CowTable.create(spark, t, base(100, 2), Seq("k"))
        val bad = spark.range(2000, 52000)
          .select(col("id").as("k"), lit(1000L).as("v"),
            concat(lit("bad"), col("id")).as("s"))
          .repartition(16)
        val fut = Future(CowTable.append(spark, t, bad))
        val stag = new java.io.File(t, ".staging")
        val deadline = System.currentTimeMillis + 30000
        while (!stag.exists && System.currentTimeMillis < deadline)
          Thread.sleep(2)
        assert(stag.exists, "append never started staging")
        try {
          CowTable.addConstraint(spark, t, "vcap", "v < 500")
          // constraint won the serialization: append MUST fail whole
          val e = intercept[Exception] { Await.result(fut, Duration.Inf) }
          assert(e.getMessage.contains("vcap"), e.getMessage)
          assert(CowTable.read(spark, t)
            .filter(col("v") >= 500).isEmpty,
            "violating rows published into a constrained table")
          assert(CowTable.read(spark, t).count() === 100)
          assert(TxLog.snapshot(spark, t).checkConstraints
            .contains("vcap"))
          raced = true
        } catch {
          case iae: IllegalArgumentException
              if iae.getMessage.contains("existing row") =>
            // append committed first — the legal other order; the
            // table is simply unconstrained with the rows in. Retry
            // the interleaving.
            Await.result(fut, Duration.Inf)
        }
      }
    }
    assert(raced, "constraint never won the race in 5 attempts")
  }

  test("restore validates re-added files against later constraints") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 2), Seq("k")) // v1
      // v2: rows a LATER constraint would reject, in their own files
      CowTable.append(spark, t,
        Seq((200L, 900L, "hot"), (201L, 901L, "hot")).toDF("k", "v", "s"))
      // v3: remove them — the constraint's liveness scan never sees them
      CowTable.deleteWhere(spark, t, col("v") >= 500)
      CowTable.addConstraint(spark, t, "vcap", "v < 500") // v4, passes
      // ADVICE r12: restore to v2 would re-add never-validated files;
      // must fail LOUDLY before publishing, head + constraint intact
      val e = intercept[RuntimeException] { CowTable.restore(spark, t, 2) }
      assert(e.getMessage.contains("vcap"), e.getMessage)
      assert(CowTable.read(spark, t).filter(col("v") >= 500).isEmpty)
      assert(TxLog.snapshot(spark, t).checkConstraints.contains("vcap"))
      // restoring to a version the constraint HOLDS on still works
      CowTable.restore(spark, t, 1)
      assert(CowTable.read(spark, t).count() === 100)
    }
  }

  test("shallow clone: zero bytes copied, contents and governance carry") {
    withTable { t =>
      val dst = t + "_clone"
      CowTable.create(spark, t, base(1000, 4), Seq("k"))
      CowTable.addConstraint(spark, t, "v_nonneg", "v >= 0")
      CowTable.shallowClone(spark, t, dst)
      // identical contents and schema, but NO data directory of its own
      assert(contents(CowTable.read(spark, dst)) ===
        contents(CowTable.read(spark, t)))
      assert(!new java.io.File(dst, "data").exists,
        "a shallow clone must not copy data files")
      val snap = TxLog.snapshot(spark, dst)
      assert(snap.files.forall(f => TxLog.isExternalPath(f.path)))
      // protocol-3 externals are fully qualified (scheme-carrying),
      // so cross-filesystem clones resolve (ADVICE r13)
      assert(snap.files.forall(_.path.startsWith("file:/")))
      // Snapshot.filePaths passes external entries through unchanged —
      // the naive "$root/$path" join would emit malformed root//abs
      // locations (ADVICE r13)
      assert(snap.filePaths(dst).forall(p =>
        p.startsWith("file:/") && !p.contains(dst)))
      assert(snap.checkConstraints.contains("v_nonneg"))
      // constraints ENFORCE on the clone too
      intercept[RuntimeException] {
        CowTable.append(spark, dst, Seq((5000L, -1L, "bad"))
          .toDF("k", "v", "s"))
      }
    }
  }

  test("clone and source diverge independently; zone maps still prune") {
    withTable { t =>
      val dst = t + "_clone"
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      CowTable.shallowClone(spark, t, dst)
      // clone-side COW: a narrow update probes only the covering
      // EXTERNAL files and rewrites them into the clone's own data/
      val m = CowTable.updateWhere(spark, dst, col("k") < 100,
        Map("v" -> lit(7777L)))
      assert(m.candidateFiles <= 2, s"external pruning broke: $m")
      val dsnap = TxLog.snapshot(spark, dst)
      assert(dsnap.files.count(f => !TxLog.isExternalPath(f.path)) >= 1)
      assert(dsnap.files.count(f => TxLog.isExternalPath(f.path)) >= 6)
      // source never saw any of it
      assert(contents(CowTable.read(spark, t)) === contents(base(1000, 8)))
      // source-side divergence never reaches the clone
      CowTable.deleteWhere(spark, t, col("k") >= 900)
      assert(CowTable.read(spark, dst).count() === 1000)
      // clone's vacuum must not reclaim SOURCE files it references
      CowTable.vacuum(spark, dst, retainVersions = 1, retentionMs = 0)
      assert(CowTable.read(spark, dst).count() === 1000)
      assert(CowTable.read(spark, t).count() === 900)
    }
  }

  test("clone at a version; optimize materializes external references") {
    withTable { t =>
      val dst = t + "_clone"
      CowTable.create(spark, t, base(100, 2), Seq("k"))           // v1
      CowTable.append(spark, t, Seq((900L, 1L, "late"))
        .toDF("k", "v", "s"))                                     // v2
      CowTable.shallowClone(spark, t, dst, asOfVersion = Some(1L))
      assert(contents(CowTable.read(spark, dst)) ===
        contents(CowTable.read(spark, t, Some(1L))))
      CowTable.optimize(spark, dst,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      val snap = TxLog.snapshot(spark, dst)
      assert(snap.files.forall(f => !TxLog.isExternalPath(f.path)),
        "optimize must materialize every external reference")
      assert(contents(CowTable.read(spark, dst)) ===
        contents(base(100, 2)))
    }
  }

  test("clone of a partitioned table parses source partition values") {
    withTable { t =>
      val dst = t + "_clone"
      CowTable.create(spark, t,
        base(200, 2).withColumn("b", col("k") % 3),
        Seq("k"), partitionBy = Seq("b"))
      CowTable.shallowClone(spark, t, dst)
      // hive col=value segments live under the SOURCE's data root;
      // the grouped read must parse them against that basePath
      val got = CowTable.read(spark, dst).groupBy("b").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(0L -> 67L, 1L -> 67L, 2L -> 66L))
    }
  }

  test("optimize racing a merge: both land, nothing lost either order") {
    // The layout rewrite and a content merge hit the same files; the
    // CAS loser must REPLAY against the winner's snapshot — a stale
    // optimize landing as-is would resurrect pre-merge rows (it
    // republishes every file it read), a stale merge would rewrite
    // files the optimize already removed. Run several rounds to vary
    // the interleaving.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (0 until 3).foreach { round =>
      withTable { t =>
        CowTable.create(spark, t, base(2000, 8), Seq("k"))
        val upd = spark.range(100, 200).select(col("id").as("k"),
          lit(9999L).as("v"), concat(lit("m"), col("id")).as("s"))
        val fo = Future(CowTable.optimize(spark, t,
          _.repartitionByRange(4, col("k")).sortWithinPartitions("k")))
        val fm = Future(CowTable.merge(spark, t, upd, Seq("k"),
          checkUniqueKeys = false))
        Await.result(fo.zip(fm), 600.seconds)
        val got = CowTable.read(spark, t)
        assert(got.count() === 2000L, s"round $round: row drift")
        assert(got.filter(col("k").between(100, 199) && col("v") === 9999L)
          .count() === 100L, s"round $round: merge effect lost")
        assert(got.filter(col("v") === 9999L).count() === 100L,
          s"round $round: merge rows duplicated or leaked")
      }
    }
  }

  test("clone of a clone: chained external roots all resolve") {
    withTable { t =>
      val c1 = t + "_c1"
      val c2 = t + "_c2"
      CowTable.create(spark, t, base(300, 3), Seq("k"))
      CowTable.shallowClone(spark, t, c1)
      // a local rewrite inside c1, so c2's manifest references BOTH
      // the original source's data root and c1's
      CowTable.updateWhere(spark, c1, col("k") < 50, Map("v" -> lit(1L)))
      CowTable.shallowClone(spark, c1, c2)
      assert(TxLog.snapshot(spark, c2).files
        .forall(f => TxLog.isExternalPath(f.path)))
      assert(CowTable.read(spark, c2).count() === 300)
      assert(CowTable.read(spark, c2)
        .filter(col("k") < 50 && col("v") === 1L).count() === 50)
    }
  }

  test("provenance: write lineage exact, layout ops re-stamp, clone=v1") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 2), Seq("k"))          // v1
      CowTable.append(spark, t, Seq((500L, 1L, "w2"))
        .toDF("k", "v", "s"))                                    // v2
      val p1 = CowTable.readWithProvenance(spark, t)
      assert(p1.filter(col("k") === 500L)
        .select(CowTable.ProvenanceCol).collect()(0).getLong(0) === 2L)
      assert(p1.filter(col(CowTable.ProvenanceCol) === 1L)
        .count() === 100L)
      // asOf BEFORE the append sees only v1 provenance
      assert(CowTable.readWithProvenance(spark, t, Some(1L))
        .select(CowTable.ProvenanceCol).distinct()
        .collect().map(_.getLong(0)).toSeq === Seq(1L))
      // a layout op re-stamps what it rewrote (write provenance)
      CowTable.optimize(spark, t,
        _.repartitionByRange(2, col("k")))                       // v3
      assert(CowTable.readWithProvenance(spark, t)
        .select(CowTable.ProvenanceCol).distinct()
        .collect().map(_.getLong(0)).toSeq === Seq(3L))
      // a shallow clone's rows all trace to its own v1 clone commit
      val dst = t + "_clone"
      CowTable.shallowClone(spark, t, dst)
      assert(CowTable.readWithProvenance(spark, dst)
        .select(CowTable.ProvenanceCol).distinct()
        .collect().map(_.getLong(0)).toSeq === Seq(1L))
    }
    // partitioned: one op's task file names repeat across partition
    // dirs — same commit, so the name-keyed map stays sound
    withTable { t =>
      CowTable.create(spark, t,
        base(90, 1).withColumn("b", col("k") % 3),
        Seq("k"), partitionBy = Seq("b"))                        // v1
      CowTable.append(spark, t,
        Seq((900L, 1L, "x", 0L), (901L, 1L, "x", 1L))
          .toDF("k", "v", "s", "b"))                             // v2
      val p = CowTable.readWithProvenance(spark, t)
      assert(p.filter(col("k") < 900)
        .filter(col(CowTable.ProvenanceCol) =!= 1L).isEmpty)
      assert(p.filter(col("k") >= 900)
        .filter(col(CowTable.ProvenanceCol) =!= 2L).isEmpty)
      assert(p.count() === 92L)
    }
  }

  test("addStatsColumn: new writes prune on it, old files stay exact") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 4), Seq("k"))
      CowTable.addStatsColumn(spark, t, "v")
      // old files carry no 'v' stat -> never prune against it
      val snap0 = TxLog.snapshot(spark, t)
      assert(snap0.statsCols === Seq("k", "v"))
      assert(snap0.files.forall(!_.stats.contains("v")))
      // a new clustered write records the stat and prunes
      CowTable.append(spark, t,
        spark.range(2000, 3000).select(col("id").as("k"),
            (col("id") - 2000).as("v"),
            concat(lit("n"), col("id")).as("s"))
          .repartitionByRange(4, col("v")))
      val snap = TxLog.snapshot(spark, t)
      val newFiles = snap.files.filter(_.stats.contains("v"))
      assert(newFiles.size === 4)
      val covering = snap.files.count(
        _.stats.get("v").forall(_.mayOverlap("10", "20")))
      // all 4 old files (conservative) + exactly 1 new file
      assert(covering === 5, s"covering=$covering")
      // reads stay exact through the mixed-stats manifest
      assert(CowTable.readWhere(spark, t,
        col("v").between(10, 20)).count() ===
        CowTable.read(spark, t).filter(col("v").between(10, 20)).count())
      // unknown column refused
      intercept[IllegalArgumentException] {
        CowTable.addStatsColumn(spark, t, "nope")
      }
    }
  }

  test("optimizeMatching re-clusters exactly the predicate's files") {
    withTable { t =>
      CowTable.create(spark, t, base(2000, 8), Seq("k"))
      // scatter a slice so its range degrades
      CowTable.append(spark, t,
        base(2000, 8).filter(col("k") < 500).repartition(4))
      // StatsPredicate treats the strict `< 500` bound inclusively
      // (pruning may only widen), so "outside" means beyond [0, 500]
      val before = TxLog.snapshot(spark, t).files
        .filter(f => !f.stats.get("k").exists(_.mayOverlap("0", "500")))
        .map(_.path).toSet
      val n = CowTable.optimizeMatching(spark, t,
        col("k") >= 0 && col("k") < 500,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      assert(n >= 4 && n <= 8, s"rewrote $n files")
      // files fully outside the two-conjunct predicate never moved
      val after = TxLog.snapshot(spark, t).files.map(_.path).toSet
      assert(before.subsetOf(after))
      assert(CowTable.read(spark, t).count() === 2500L)
      // selectivity restored on the scoped range
      val covering = TxLog.snapshot(spark, t).files.count(
        _.stats.get("k").forall(_.mayOverlap("100", "150")))
      assert(covering <= 2, s"covering=$covering")
    }
  }

  test("changesWhereAt prunes a commit's files by zone map, rows exact") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      val got = CowTable.changesWhereAt(spark, t, 1L, col("k") < 100)
      assert(got.count() === 100)
      assert(got.inputFiles.length <= 2,
        s"selective feed read ${got.inputFiles.length} of 8 files")
      // unprunable predicate stays row-exact over the full commit
      assert(CowTable.changesWhereAt(spark, t, 1L,
        col("s").endsWith("7")).count() === 100)
    }
  }

  test("reader protocol: future features fail loudly, not wrongly") {
    withTable { t =>
      CowTable.create(spark, t, base(50, 1), Seq("k"))            // v1
      // a commit stamped with a protocol this engine doesn't speak —
      // folding past it would silently misinterpret the feature
      assert(TxLog.tryCommit(spark, t, TxLog.Commit(2L, "future",
        Seq.empty, Seq.empty, None, None, minReader = Some(99))))
      val e = intercept[IllegalArgumentException] {
        TxLog.snapshot(spark, t)
      }
      assert(e.getMessage.contains("protocol 99"), e.getMessage)
      // time travel BELOW the feature commit still reads fine
      assert(CowTable.read(spark, t, Some(1L)).count() === 50)
    }
  }

  test("reader protocol rides the checkpoint, not just the tail") {
    withTable { t =>
      val dst = t + "_c"
      CowTable.create(spark, t, base(50, 1), Seq("k"))
      CowTable.shallowClone(spark, t, dst)
      assert(TxLog.snapshot(spark, dst).minReader === Some(3))
      // push the clone log past a checkpoint: the fold then starts at
      // the checkpoint and never re-reads the clone commit, so the
      // requirement must survive INSIDE the checkpoint
      (1 to TxLog.CheckpointInterval).foreach { i =>
        CowTable.append(spark, dst,
          Seq((10000L + i, 1L, "x")).toDF("k", "v", "s"))
      }
      assert(new java.io.File(dst, "_txlog").list()
        .exists(_.endsWith(".checkpoint.json")))
      assert(TxLog.snapshot(spark, dst).minReader === Some(3))
    }
  }

  test("describeDetail summarizes version, files, rows, governance") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 4).withColumn("b", col("k") % 2),
        Seq("k"), partitionBy = Seq("b"))
      CowTable.addConstraint(spark, t, "v_nonneg", "v >= 0")
      CowTable.append(spark, t,
        Seq((200L, 1L, "x", 0L)).toDF("k", "v", "s", "b"))
      val d = TxLog.describeDetail(spark, t).collect()(0)
      assert(d.getLong(0) === 3L)        // create + constraint + append
      assert(d.getLong(2) === 101L)      // rows
      assert(d.getString(3).contains("k"))
      assert(d.getString(4) === "b")
      assert(d.getString(5) === "v_nonneg")
    }
  }

  test("constraints survive the checkpointed log fold") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      CowTable.addConstraint(spark, t, "v_nonneg", "v >= 0")
      // push the log PAST a checkpoint interval (20) so a fresh
      // snapshot folds from the checkpoint, not the full commit chain
      (0 until 20).foreach { i =>
        CowTable.append(spark, t,
          Seq((1000L + i, i.toLong, s"a$i")).toDF("k", "v", "s"))
      }
      assert(TxLog.latestVersion(spark, t) > TxLog.CheckpointInterval)
      val snap = TxLog.snapshot(spark, t)
      assert(snap.checkConstraints === Map("v_nonneg" -> "v >= 0"))
      // ...and it still ENFORCES after the fold
      intercept[RuntimeException] {
        CowTable.append(spark, t,
          Seq((2000L, -1L, "bad")).toDF("k", "v", "s"))
      }
      assert(CowTable.read(spark, t).count() === 30)
    }
  }

  test("a torn checkpoint degrades to the full fold, never fails reads") {
    withTable { t =>
      CowTable.create(spark, t, base(10, 1), Seq("k"))
      (0 until 20).foreach { i =>
        CowTable.append(spark, t,
          Seq((100L + i, i.toLong, s"x$i")).toDF("k", "v", "s"))
      }
      val before = CowTable.read(spark, t).count()
      // simulate the pre-fix race / a mid-write crash: an EMPTY file
      // where the version-20 checkpoint lives
      val ckpt = new java.io.File(t,
        f"_txlog/${20L}%020d.checkpoint.json")
      assert(ckpt.exists, "fixture expects a checkpoint at version 20")
      java.nio.file.Files.write(ckpt.toPath, Array.empty[Byte])
      // reads fold from the commits instead; contents exact
      assert(CowTable.read(spark, t).count() === before)
      assert(TxLog.snapshot(spark, t).files.nonEmpty)
      // and the table keeps committing (the next interval re-heals)
      CowTable.append(spark, t, Seq((999L, 9L, "z")).toDF("k", "v", "s"))
      assert(CowTable.read(spark, t).count() === before + 1)
    }
  }

  test("posix-rename detection covers RawLocalFileSystem too") {
    // LocalFileSystem is the checksum WRAPPER around RawLocalFileSystem;
    // a file:// deployment with fs.file.impl overridden to the raw form
    // has the same replace-on-rename semantics and must take the
    // hard-link CAS path (matching only the wrapper reopens the
    // lost-commit race).
    assert(TxLog.posixRenameSemantics(
      new org.apache.hadoop.fs.LocalFileSystem()))
    assert(TxLog.posixRenameSemantics(
      new org.apache.hadoop.fs.RawLocalFileSystem()))
  }

  test("deleteWhereMatchingAny audit: an intentionally-short point " +
      "set trips the guard (stats AND exact), a covering one passes " +
      "(round 16)") {
    def build(t: String): Unit = {
      // file A: ONLY k=5 rows (min=max=5, no nulls) — every row
      // matches the delete predicate, provable from the zone map;
      // file B: k in 1..4
      CowTable.create(spark, t,
        spark.range(10).select(lit(5L).as("k"), col("id").as("v"))
          .coalesce(1), Seq("k"))
      CowTable.append(spark, t,
        spark.range(1, 5).select(col("id").as("k"), col("id").as("v"))
          .coalesce(1))
    }
    withTable { t =>
      build(t)
      // SHORT point set {1, 2}: file A (the one actually holding the
      // matches) is never probed — the stats audit proves the miss
      val e = intercept[RuntimeException] {
        CowTable.deleteWhereMatchingAny(spark, t, "k", Seq("1", "2"),
          col("k") === 5L, audit = "stats")
      }
      assert(e.getMessage.contains("PROVABLY missed"))
      // nothing was deleted from the unprobed file
      assert(CowTable.read(spark, t).filter(col("k") === 5L)
        .count() === 10L)
      // exact mode trips on the same short set
      val e2 = intercept[RuntimeException] {
        CowTable.deleteWhereMatchingAny(spark, t, "k", Seq("1", "2"),
          col("k") === 5L, audit = "exact")
      }
      assert(e2.getMessage.contains("missed matching rows"))
    }
    withTable { t =>
      build(t)
      // SOUND point set: covers the matching file — both audits pass
      val m = CowTable.deleteWhereMatchingAny(spark, t, "k",
        Seq("5"), col("k") === 5L, audit = "stats")
      assert(m.touchedFiles === 1L)
      assert(CowTable.read(spark, t).filter(col("k") === 5L)
        .count() === 0L)
    }
    withTable { t =>
      build(t)
      val m = CowTable.deleteWhereMatchingAny(spark, t, "k",
        Seq("5"), col("k") === 5L, audit = "exact")
      assert(m.touchedFiles === 1L)
      assert(CowTable.read(spark, t).count() === 4L)
      // a predicate the range analysis cannot decompose: the stats
      // audit has nothing provable and stays silent (documented —
      // the contract remains the caller's there)
      val m2 = CowTable.deleteWhereMatchingAny(spark, t, "k",
        Seq("99"), col("v") % 2L === 0L, audit = "stats")
      assert(m2.touchedFiles === 0L)
      // ...and the SOUND-direction extraction refuses strict ops and
      // nested references outright (guessing against the wrong
      // column's stats would fail spuriously)
      import org.apache.spark.sql.graft.ColumnBridge
      assert(ColumnBridge.exactRangesTotal(col("k") > 5L).isEmpty)
      assert(ColumnBridge.exactRangesTotal(col("meta.x") === 5L).isEmpty)
      assert(ColumnBridge.exactRangesTotal(
        col("k") === 5L && col("v") >= 2L).isDefined)
    }
  }
}
