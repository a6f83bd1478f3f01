package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Column mapping (protocol 3): RENAME/DROP COLUMN as metadata
  * commits — logical→physical name indirection in the log, no file
  * rewritten. Pins the four hazards the design exists for: reads
  * round-trip the new name, time travel below the change restores the
  * old schema, zone-map pruning survives a stats/partition-column
  * rename, and a dropped-then-readded column can never resurrect old
  * values.
  */
class ColumnMappingSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmap_").toFile
    try f(dir.getAbsolutePath + "/t")
    finally rmrf(dir)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }
  private def base(n: Int, parts: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
        (col("id") * 7 % 100).as("v"),
        concat(lit("row"), col("id")).as("s"))
      .repartitionByRange(parts, col("k"))

  test("rename: metadata-only, reads round-trip, time travel below, " +
      "writes keep flowing, restore rolls the name back") {
    withTable { t =>
      CowTable.create(spark, t, base(100, 2), Seq("k"))          // v1
      val filesBefore = TxLog.snapshot(spark, t).files.map(_.path).toSet
      CowTable.renameColumn(spark, t, "v", "amount")             // v2
      // metadata commit: zero files moved
      assert(TxLog.snapshot(spark, t).files.map(_.path).toSet ===
        filesBefore)
      assert(TxLog.snapshot(spark, t).minReader === Some(3))
      // head reads surface the new name with the old values
      val head = CowTable.read(spark, t)
      assert(head.columns.toSeq === Seq("k", "amount", "s"))
      assert(head.filter(col("k") === 10L).select("amount")
        .head().getLong(0) === 70L)
      // time travel BELOW the rename: the old name
      assert(CowTable.read(spark, t, Some(1L)).columns.toSeq ===
        Seq("k", "v", "s"))
      // writes flow under the new name; both epochs read as ONE column
      CowTable.append(spark, t, Seq((200L, 7777L, "late"))
        .toDF("k", "amount", "s"))                               // v3
      assert(CowTable.read(spark, t).filter(col("amount") === 7777L)
        .count() === 1L)
      // the change feed speaks each commit's own schema
      assert(CowTable.changesAt(spark, t, 3).columns.toSeq ===
        Seq("k", "amount", "s"))
      // restore below the rename rolls the NAME back with the schema
      CowTable.restore(spark, t, 1L)                             // v4
      assert(CowTable.read(spark, t).columns.toSeq === Seq("k", "v", "s"))
    }
  }

  test("renamed merge key keeps zone-map pruning (stats stay physical)") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      CowTable.renameColumn(spark, t, "k", "key_id")
      val m = CowTable.merge(spark, t,
        Seq((5L, 777L, "upd")).toDF("key_id", "v", "s"), Seq("key_id"))
      assert(m.candidateFiles <= 2, s"pruning lost under rename: $m")
      assert(m.touchedFiles === 1L)
      assert(CowTable.read(spark, t).filter(col("key_id") === 5L)
        .select("v").head().getLong(0) === 777L)
      // predicate DML prunes through the map too
      val d = CowTable.deleteWhere(spark, t, col("key_id") >= 990L)
      assert(d.candidateFiles <= 2, s"predicate pruning lost: $d")
      assert(CowTable.read(spark, t).count() === 990L)
    }
  }

  test("partition-column rename: hive dirs stay physical, reads and " +
      "partition pruning keep working") {
    withTable { t =>
      val df = spark.range(100).select(col("id").as("k"),
        (col("id") % 4).cast("string").as("b"))
      CowTable.create(spark, t, df, Seq("k"), partitionBy = Seq("b"))
      CowTable.renameColumn(spark, t, "b", "bucket")
      assert(CowTable.read(spark, t).columns.toSeq === Seq("k", "bucket"))
      assert(CowTable.read(spark, t).filter(col("bucket") === "2")
        .count() === 25L)
      // new writes land under the OLD physical dir name and read back
      CowTable.append(spark, t, Seq((500L, "2")).toDF("k", "bucket"))
      assert(CowTable.read(spark, t).filter(col("bucket") === "2")
        .count() === 26L)
      val pruned = CowTable.readOverlapping(spark, t, "bucket", "3", "3")
      assert(pruned.count() === 25L)
      // dropping a partition column is refused (values live in dirs)
      val e = intercept[IllegalArgumentException] {
        CowTable.dropColumn(spark, t, "bucket")
      }
      assert(e.getMessage.contains("partition column"), e.getMessage)
    }
  }

  test("drop + re-add: old values can never resurrect (fresh physical " +
      "name); time travel below the drop still reads them") {
    withTable { t =>
      CowTable.create(spark, t, base(50, 1), Seq("k"))           // v1
      CowTable.dropColumn(spark, t, "v")                         // v2
      assert(CowTable.read(spark, t).columns.toSeq === Seq("k", "s"))
      assert(TxLog.snapshot(spark, t).retiredPhys === Some(Seq("v")))
      // time travel below the drop: the column and its values are back
      assert(CowTable.read(spark, t, Some(1L))
        .filter(col("k") === 10L).select("v").head().getLong(0) === 70L)
      // re-add the SAME logical name via schema evolution
      CowTable.append(spark, t,
        Seq((500L, "new", 123L)).toDF("k", "s", "v"),
        mergeSchema = true)                                      // v3
      val head = CowTable.read(spark, t)
      assert(head.columns.toSeq === Seq("k", "s", "v"))
      // the new column is bound to a FRESH physical name...
      val snap = TxLog.snapshot(spark, t)
      assert(snap.physName("v") !== "v")
      // ...so pre-drop rows surface NULL, never the old bytes
      assert(head.filter(col("k") === 10L).select("v").head().isNullAt(0))
      assert(head.filter(col("k") === 500L).select("v")
        .head().getLong(0) === 123L)
      // and a merge on the re-added table round-trips it
      CowTable.merge(spark, t,
        Seq((500L, "new", 456L)).toDF("k", "s", "v"), Seq("k"))
      assert(CowTable.read(spark, t).filter(col("k") === 500L)
        .select("v").head().getLong(0) === 456L)
    }
  }

  test("rename/drop guard rails: existing name, missing column, " +
      "constraint references") {
    withTable { t =>
      CowTable.create(spark, t, base(20, 1), Seq("k"))
      intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "v", "s") // exists
      }
      intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "nope", "x")
      }
      CowTable.addConstraint(spark, t, "v_nonneg", "v >= 0")
      val e = intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "v", "amount")
      }
      assert(e.getMessage.contains("v_nonneg"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        CowTable.dropColumn(spark, t, "v")
      }
      assert(e2.getMessage.contains("v_nonneg"), e2.getMessage)
      // after dropping the constraint both proceed; a constraint on an
      // UNTOUCHED column survives a rename fine
      CowTable.dropConstraint(spark, t, "v_nonneg")
      CowTable.addConstraint(spark, t, "k_nonneg", "k >= 0")
      CowTable.renameColumn(spark, t, "v", "amount")
      // the carried constraint still enforces on writes
      intercept[RuntimeException] {
        CowTable.append(spark, t, Seq((-1L, 1L, "bad"))
          .toDF("k", "amount", "s"))
      }
    }
  }

  test("addColumn: metadata-only, typed nulls backfill, a retired " +
      "name binds fresh and never resurrects") {
    withTable { t =>
      CowTable.create(spark, t, base(50, 1), Seq("k"))            // v1
      val filesBefore = TxLog.snapshot(spark, t).files.map(_.path).toSet
      CowTable.addColumn(spark, t, "w", "DOUBLE")                 // v2
      assert(TxLog.snapshot(spark, t).files.map(_.path).toSet ===
        filesBefore, "addColumn moved files")
      val head = CowTable.read(spark, t)
      assert(head.columns.toSeq === Seq("k", "v", "s", "w"))
      assert(head.filter(col("w").isNotNull).count() === 0L)
      // writes carry it; time travel below lacks it
      CowTable.append(spark, t, Seq((500L, 1L, "x", 2.5d))
        .toDF("k", "v", "s", "w"))
      assert(CowTable.read(spark, t).filter(col("w") === 2.5d)
        .count() === 1L)
      assert(CowTable.read(spark, t, Some(1L)).columns.toSeq ===
        Seq("k", "v", "s"))
      intercept[IllegalArgumentException] {
        CowTable.addColumn(spark, t, "w", "DOUBLE") // exists
      }
      // drop then re-ADD via addColumn: fresh physical binding — the
      // old bytes must not resurrect
      CowTable.dropColumn(spark, t, "v")
      CowTable.addColumn(spark, t, "v", "BIGINT")
      val snap = TxLog.snapshot(spark, t)
      assert(snap.physName("v") !== "v")
      assert(CowTable.read(spark, t).filter(col("k") === 10L)
        .select("v").head().isNullAt(0))
    }
  }

  test("readMatchingAny: point-set zone-map prune, each file once, " +
      "typed per kind, conservative on junk values") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 8), Seq("k"))
      // two narrow points + a value that can't parse as the long kind:
      // rows for both points arrive exactly once, the junk is ignored
      val got = CowTable.readMatchingAny(spark, t, "k",
        Seq("5", "995", "zz-not-a-long"))
      assert(got.filter(col("k") === 5L).count() === 1L)
      assert(got.filter(col("k") === 995L).count() === 1L)
      // file-granular: other rows from the covering files may appear,
      // but the read planned a strict subset of the 8 files
      val filesRead = got.select(input_file_name()).distinct().count()
      assert(filesRead <= 2L, s"read $filesRead of 8 files")
      // a renamed column prunes through the map too
      CowTable.renameColumn(spark, t, "k", "key_id")
      val got2 = CowTable.readMatchingAny(spark, t, "key_id", Seq("5"))
      assert(got2.filter(col("key_id") === 5L).count() === 1L)
      assert(got2.select(input_file_name()).distinct().count() <= 1L)
    }
  }

  test("clone-aware vacuum: leases defer reclaim of cloned files; " +
      "dropping the lease releases them") {
    withTable { t =>
      val cl = t + "_cl"
      CowTable.create(spark, t, base(400, 4), Seq("k"))           // v1
      CowTable.shallowClone(spark, t, cl)
      assert(CowTable.cloneLeases(spark, t)
        .map(l => (l.clonePath, l.srcVersion)) === Seq((cl, 1L)))
      // the source moves on: optimize replaces every v1 file
      CowTable.optimize(spark, t,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      // an aggressive vacuum (retain 1, no age gate) must DEFER the
      // leased v1 files — the old behavior reclaimed them here
      val reclaimed = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 0)
      assert(reclaimed.isEmpty,
        s"vacuum reclaimed leased clone files: $reclaimed")
      assert(CowTable.read(spark, cl).count() === 400L,
        "the clone must stay readable after source vacuum")
      // materialize the clone, release the lease: now the source may
      // reclaim the v1 files
      CowTable.optimize(spark, cl,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      assert(CowTable.dropCloneLease(spark, t, cl) === 1)
      val reclaimed2 = CowTable.vacuum(spark, t, retainVersions = 1,
        retentionMs = 0)
      assert(reclaimed2.size === 4,
        s"expected the 4 v1 files reclaimed, got $reclaimed2")
      // both tables still read their full contents
      assert(CowTable.read(spark, t).count() === 400L)
      assert(CowTable.read(spark, cl).count() === 400L)
    }
  }

  test("cloneLeaseReport names the blocking lease: owner, age, and the " +
      "files it defers beyond retention") {
    withTable { t =>
      val cl = t + "_rep"
      CowTable.create(spark, t, base(400, 4), Seq("k"))           // v1
      CowTable.shallowClone(spark, t, cl, leaseOwner = Some("exp-team"))
      CowTable.optimize(spark, t,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      // the abandoned-clone triage face: WHO holds WHAT back
      val r = CowTable.cloneLeaseReport(spark, t, retainVersions = 1)
        .collect()
      assert(r.length === 1)
      assert(r(0).getAs[String]("clone_path") === cl)
      assert(r(0).getAs[Long]("src_version") === 1L)
      assert(r(0).getAs[java.sql.Timestamp]("created_at") != null,
        "lease must carry its creation instant")
      assert(r(0).getAs[Double]("age_hours") >= 0.0)
      assert(r(0).getAs[String]("owner") === "exp-team")
      assert(r(0).getAs[Long]("files_deferred") === 4L,
        "the 4 leased v1 files sit beyond the retain-1 window")
      // release -> the report empties and vacuum reclaims
      assert(CowTable.dropCloneLease(spark, t, cl) === 1)
      assert(CowTable.cloneLeaseReport(spark, t, retainVersions = 1)
        .isEmpty)
    }
  }

  test("clone carries the column map; describeDetail speaks logical") {
    withTable { t =>
      val cl = t + "_clone"
      CowTable.create(spark, t, base(100, 2), Seq("k"))
      CowTable.renameColumn(spark, t, "k", "key_id")
      CowTable.shallowClone(spark, t, cl)
      assert(CowTable.read(spark, cl).columns.toSeq ===
        Seq("key_id", "v", "s"))
      // clone-side merge prunes + rewrites through the inherited map
      val m = CowTable.merge(spark, cl,
        Seq((5L, 1L, "x")).toDF("key_id", "v", "s"), Seq("key_id"))
      assert(m.candidateFiles <= 1, s"clone pruning lost: $m")
      val d = TxLog.describeDetail(spark, t).head()
      assert(d.getAs[String]("stats_cols") === "key_id")
    }
  }

  // ------------------------------------------- nested column mapping

  private def nestedBase(n: Int, parts: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
        struct((col("id") % 50).as("cust"),
          (col("id") * 3 % 97).cast("double").as("amount")).as("meta"),
        array(struct(concat(lit("e"), col("id")).as("name"),
          (col("id") % 9).as("w"))).as("events"))
      .repartitionByRange(parts, col("k"))

  test("nested rename: metadata-only commit, head reads the new field " +
      "name, time travel below reads the old, writes flow after") {
    withTable { t =>
      CowTable.create(spark, t, nestedBase(300, 4), Seq("k"))       // v1
      CowTable.append(spark, t, nestedBase(300, 1)
        .filter(col("k") % 5 === 0)
        .select((col("k") + 1000L).as("k"), col("meta"), col("events"))) // v2
      val filesBefore = TxLog.snapshot(spark, t).files.map(_.path).toSet
      CowTable.renameColumn(spark, t, "meta.amount", "price")       // v3
      // metadata-only: no file moved, protocol 4 stamped
      val c3 = TxLog.commitAt(spark, t, 3L)
      assert(c3.adds.isEmpty && c3.removes.isEmpty)
      assert(c3.minReader === Some(4))
      assert(TxLog.snapshot(spark, t).files.map(_.path).toSet
        === filesBefore)
      // head: new logical name, real values (not nulls)
      val head = CowTable.read(spark, t)
      assert(head.schema("meta").dataType.asInstanceOf[
        org.apache.spark.sql.types.StructType].fieldNames.toSeq
        === Seq("cust", "price"))
      val v7 = head.filter(col("k") === 7L)
        .select(col("meta.price")).collect()(0).getDouble(0)
      assert(v7 === (7L * 3 % 97).toDouble)
      // time travel below the rename: old name, same bytes
      val past = CowTable.read(spark, t, Some(2L))
      assert(past.schema("meta").dataType.asInstanceOf[
        org.apache.spark.sql.types.StructType].fieldNames.toSeq
        === Seq("cust", "amount"))
      assert(past.filter(col("k") === 7L)
        .select(col("meta.amount")).collect()(0).getDouble(0) === v7)
      // writes after the rename conform to the unchanged PHYSICAL name
      CowTable.append(spark, t, spark.range(1).select(
        lit(5000L).as("k"),
        struct(lit(1L).as("cust"), lit(123.5).as("price")).as("meta"),
        array(struct(lit("x").as("name"), lit(2L).as("w"))).as("events"))) // v4
      assert(CowTable.read(spark, t).filter(col("k") === 5000L)
        .select(col("meta.price")).collect()(0).getDouble(0) === 123.5)
      // merge under the new name touches and rewrites correctly
      CowTable.merge(spark, t, spark.range(1).select(
        lit(7L).as("k"),
        struct(lit(9L).as("cust"), lit(777.0).as("price")).as("meta"),
        array(struct(lit("y").as("name"), lit(3L).as("w"))).as("events")),
        Seq("k"))                                                    // v5
      assert(CowTable.read(spark, t).filter(col("k") === 7L)
        .select(col("meta.price")).collect()(0).getDouble(0) === 777.0)
      // the file-level change feed of a PRE-rename commit (old files,
      // head schema read path) surfaces values, not nulls
      val feed2 = CowTable.changesAt(spark, t, 2L)
      assert(feed2.filter(col("k") === 1005L)
        .select(col("meta.amount")).collect()(0).getDouble(0)
        === (5L * 3 % 97).toDouble)
    }
  }

  test("nested rename inside array-of-struct elements") {
    withTable { t =>
      CowTable.create(spark, t, nestedBase(100, 2), Seq("k"))
      CowTable.renameColumn(spark, t, "events.w", "weight")
      val head = CowTable.read(spark, t)
      val got = head.filter(col("k") === 4L)
        .select(element_at(col("events"), 1).getField("weight"))
        .collect()(0).getLong(0)
      assert(got === 4L % 9)
      // time travel below still speaks `w`
      assert(CowTable.read(spark, t, Some(1L)).filter(col("k") === 4L)
        .select(element_at(col("events"), 1).getField("w"))
        .collect()(0).getLong(0) === 4L % 9)
    }
  }

  test("nested guard rails: retype still rejected, missing path, " +
      "sibling collision, dotted target, drop prunes nested keys, " +
      "top-level rename re-keys descendants") {
    withTable { t =>
      CowTable.create(spark, t, nestedBase(50, 1), Seq("k"))
      CowTable.renameColumn(spark, t, "meta.amount", "price")
      // a TRUE retype of the renamed field is still refused loudly
      val e1 = intercept[IllegalArgumentException] {
        CowTable.append(spark, t, spark.range(1).select(
          lit(9000L).as("k"),
          struct(lit(1L).as("cust"), lit("oops").as("price")).as("meta"),
          array(struct(lit("x").as("name"), lit(2L).as("w")))
            .as("events")))
      }
      assert(e1.getMessage.contains("retypes are not supported"),
        e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "meta.nope", "x")
      }
      assert(e2.getMessage.contains("no field path"), e2.getMessage)
      val e3 = intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "meta.price", "cust")
      }
      assert(e3.getMessage.contains("already exists beside"), e3.getMessage)
      val e4 = intercept[IllegalArgumentException] {
        CowTable.renameColumn(spark, t, "meta.price", "meta.q")
      }
      assert(e4.getMessage.contains("bare field name"), e4.getMessage)
      // top-level rename re-keys the nested descendant binding
      CowTable.renameColumn(spark, t, "meta", "m2")
      val snap = TxLog.snapshot(spark, t)
      assert(snap.columnMap.getOrElse(Map.empty)
        .get("m2.price") === Some("amount"))
      assert(CowTable.read(spark, t).filter(col("k") === 7L)
        .select(col("m2.price")).collect()(0).getDouble(0)
        === (7L * 3 % 97).toDouble)
      // dropping the struct column prunes its nested keys from the map
      CowTable.dropColumn(spark, t, "m2")
      val snap2 = TxLog.snapshot(spark, t)
      assert(!snap2.columnMap.getOrElse(Map.empty).keys
        .exists(_.startsWith("m2")))
    }
  }

  test("deepClone: independent byte copy — no lease, survives an " +
      "aggressive source vacuum, materializes a shallow clone's " +
      "external refs, carries the column map") {
    withTable { t =>
      val sh = t + "_sh"
      val deep = t + "_deep"
      CowTable.create(spark, t, base(300, 3), Seq("k"))
      CowTable.renameColumn(spark, t, "v", "val")
      // shallow-clone the mapped table, then DEEP clone the shallow
      // clone: its external references must materialize into copies
      CowTable.shallowClone(spark, t, sh)
      CowTable.deepClone(spark, sh, deep)
      // no lease registered by the deep clone anywhere
      assert(CowTable.cloneLeases(spark, sh).isEmpty)
      // and no external references in its manifest
      val snap = TxLog.snapshot(spark, deep)
      assert(snap.files.forall(f => !TxLog.isExternalPath(f.path)),
        "a deep clone must not reference foreign files")
      assert(snap.columnMap.isDefined, "the column map carries over")
      // kill the originals wholesale: the copy reads on
      CowTable.dropCloneLease(spark, t, sh)
      CowTable.optimize(spark, t,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      CowTable.vacuum(spark, t, retainVersions = 1, retentionMs = 0)
      val f = TxLog.fs(spark, t)
      f.delete(new org.apache.hadoop.fs.Path(t), true)
      f.delete(new org.apache.hadoop.fs.Path(sh), true)
      assert(CowTable.read(spark, deep).count() === 300L)
      assert(CowTable.read(spark, deep).filter(col("k") === 7L)
        .select("val").collect()(0).getLong(0) === 7L * 7 % 100)
      // the copy is a full table: merges flow
      CowTable.merge(spark, deep,
        Seq((7L, 999L, "upd")).toDF("k", "val", "s"), Seq("k"))
      assert(CowTable.read(spark, deep).filter(col("k") === 7L)
        .select("val").collect()(0).getLong(0) === 999L)
    }
  }

  test("nested ADD: metadata-only, old files read typed nulls, new " +
      "writes carry values, time travel below keeps the old shape") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(50).select(col("id").as("k"),
          struct(col("id").as("a"), (col("id") * 2).as("b")).as("m")),
        Seq("k"))                                              // v1
      val filesBefore = TxLog.snapshot(spark, t).files.map(_.path).toSet
      CowTable.addColumn(spark, t, "m.c", "BIGINT")            // v2
      assert(TxLog.snapshot(spark, t).files.map(_.path).toSet ===
        filesBefore, "nested add must move no files")
      // identity binding: no map entry, no protocol bump
      assert(TxLog.snapshot(spark, t).columnMap.isEmpty)
      // old files surface the new field as typed nulls
      val head = CowTable.read(spark, t)
      assert(head.schema("m").dataType.asInstanceOf[
        org.apache.spark.sql.types.StructType].fieldNames.toSeq ===
        Seq("a", "b", "c"))
      assert(head.filter(col("m.c").isNotNull).count() === 0L)
      // new writes carry values; one homogeneous column both epochs
      CowTable.append(spark, t, spark.range(50, 60)
        .select(col("id").as("k"),
          struct(col("id").as("a"), (col("id") * 2).as("b"),
            lit(7L).as("c")).as("m")))                         // v3
      assert(CowTable.read(spark, t).filter(col("m.c") === 7L)
        .count() === 10L)
      // time travel below the add: the old shape
      assert(CowTable.read(spark, t, Some(1L)).schema("m").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq === Seq("a", "b"))
    }
  }

  test("nested DROP + re-add: fresh physical binding per parent scope " +
      "— old values never resurrect, even across a parent rename") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(40).select(col("id").as("k"),
          struct(col("id").as("a"), (col("id") + 100L).as("b")).as("m")),
        Seq("k"))                                              // v1
      CowTable.dropColumn(spark, t, "m.b")                     // v2
      val s2 = TxLog.snapshot(spark, t)
      assert(StructType.fromDDL(s2.schemaDDL)("m").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq === Seq("a"))
      assert(s2.retiredPhys.getOrElse(Seq.empty).contains("m.b"),
        "the dropped field retires scoped under the parent's physical")
      // time travel below the drop still reads the values
      assert(CowTable.read(spark, t, Some(1L)).filter(col("m.b") === 110L)
        .count() === 1L)
      // rename the PARENT, then re-add the same field name: the
      // retired scope is keyed by the parent's PHYSICAL path, so the
      // re-add must still bind fresh
      CowTable.renameColumn(spark, t, "m", "info")             // v3
      CowTable.addColumn(spark, t, "info.b", "BIGINT")         // v4
      val s4 = TxLog.snapshot(spark, t)
      assert(s4.columnMap.getOrElse(Map.empty).get("info.b")
        .exists(_ != "b"), "re-added nested field must bind FRESH")
      assert(s4.minReader === Some(4))
      // no resurrect: every pre-drop row reads null for the re-add
      assert(CowTable.read(spark, t).filter(col("info.b").isNotNull)
        .count() === 0L)
      // and new writes flow under the fresh binding
      CowTable.append(spark, t, spark.range(40, 45)
        .select(col("id").as("k"),
          struct(col("id").as("a"), lit(999L).as("b")).as("info")))
      assert(CowTable.read(spark, t).filter(col("info.b") === 999L)
        .count() === 5L)
    }
  }

  test("nested DDL guard rails: existing field, missing path, last " +
      "field of a struct") {
    withTable { t =>
      CowTable.create(spark, t,
        spark.range(10).select(col("id").as("k"),
          struct(col("id").as("a")).as("m")), Seq("k"))
      intercept[IllegalArgumentException] {
        CowTable.addColumn(spark, t, "m.a", "BIGINT")
      }
      intercept[IllegalArgumentException] {
        CowTable.dropColumn(spark, t, "m.zzz")
      }
      intercept[IllegalArgumentException] {
        CowTable.dropColumn(spark, t, "m.a") // the struct's only field
      }
      intercept[RuntimeException] {
        CowTable.addColumn(spark, t, "k.x", "BIGINT") // not a struct
      }
    }
  }

  test("deepClone lost-race reclaim never deletes the committed " +
      "winner's files, only the loser's own orphans (ADVICE r15)") {
    withTable { t =>
      val dst = t + "_race"
      CowTable.create(spark, t, base(100, 2), Seq("k"))
      // the WINNER: a rival deepClone of the same source, committed.
      // A loser racing it copied the IDENTICAL destination paths
      // (relOf preserves the source-relative layout) plus — to model a
      // rival of a different source version — one path of its own.
      CowTable.deepClone(spark, t, dst)
      val winnerFiles = TxLog.snapshot(spark, dst, Some(1L)).files
        .map(_.path)
      // the winner moved ON after committing: the head no longer
      // references the v1 files, but they are retained for time
      // travel — the reclaim keys on the CREATE commit, so they
      // must still survive the loser (review r16)
      CowTable.optimize(spark, dst,
        _.repartitionByRange(2, col("k")).sortWithinPartitions("k"))
      val f = TxLog.fs(spark, dst)
      val dstRoot = f.makeQualified(new org.apache.hadoop.fs.Path(dst))
        .toUri.toString.stripSuffix("/")
      val own = s"$dstRoot/data/loser-only.parquet"
      TxLog.writeString(f, new org.apache.hadoop.fs.Path(own), "orphan")
      CowTable.reclaimLostCopies(spark, dst, dstRoot,
        winnerFiles.map(p => s"$dstRoot/$p") :+ own)
      // the winner's files survive — head AND the retained v1 both
      // read whole — while the loser-only orphan was reclaimed
      assert(CowTable.read(spark, dst).count() === 100L)
      assert(CowTable.read(spark, dst, Some(1L)).count() === 100L)
      assert(!f.exists(new org.apache.hadoop.fs.Path(own)),
        "the loser's non-colliding orphan must be reclaimed")
      // and when the winner's snapshot is unreadable, reclaim NOTHING
      val ghost = s"$dstRoot/data/ghost.parquet"
      TxLog.writeString(f, new org.apache.hadoop.fs.Path(ghost), "x")
      CowTable.reclaimLostCopies(spark, dst + "_missing", dstRoot,
        Seq(ghost))
      assert(f.exists(new org.apache.hadoop.fs.Path(ghost)),
        "an unreadable winner snapshot must abort the reclaim " +
          "(leaking is recoverable, deleting a winner's data is not)")
      f.delete(new org.apache.hadoop.fs.Path(ghost), false)
      ()
    }
  }

  test("deepClone preserves hive partition layout") {
    withTable { t =>
      val deep = t + "_pdeep"
      CowTable.create(spark, t,
        spark.range(200).select(col("id").as("k"),
          (col("id") % 4).as("b")),
        Seq("k"), partitionBy = Seq("b"))
      CowTable.deepClone(spark, t, deep)
      assert(CowTable.read(spark, deep).groupBy("b").count()
        .orderBy("b").collect().map(_.getLong(1)).toSeq ===
        Seq(50L, 50L, 50L, 50L))
      // partition-pruned reads keep working on the copy
      assert(CowTable.readOverlapping(spark, deep, "b", "2", "2")
        .filter(col("b") === 2L).count() === 50L)
    }
  }
}
