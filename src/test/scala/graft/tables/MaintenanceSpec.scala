package graft.tables

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Maintenance]]: the manifest-only advisor detects over-covered key
  * ranges and small-file buildup, [[Maintenance.maintain]] repairs
  * exactly what it detected, and a healthy table reads quiet. The
  * contents-invariance of the repair is the `table_maintain` gate's.
  */
class MaintenanceSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTable(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mnt_").toFile
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

  test("a well-clustered table advises quiet; scattering is detected") {
    withTable { t =>
      CowTable.create(spark, t, base(4000, 8), Seq("k"))
      assert(Maintenance.advise(spark, t, maxOverlapDepth = 3,
        smallFileRows = 0L).quiet)
      // three full-range scattered ingests: depth over every key range
      // rises to 1 + 3*4 — far past the threshold
      (0 until 3).foreach { _ =>
        CowTable.append(spark, t, base(4000, 8).repartition(4))
      }
      val a = Maintenance.advise(spark, t, maxOverlapDepth = 3,
        smallFileRows = 0L)
      assert(a.hotRanges.nonEmpty)
      val hr = a.hotRanges.head
      assert(hr.depth >= 13, s"expected full stack, got $hr")
      // the detected range must cover ~the whole key domain (exact
      // bounds depend on where the shuffled files' mins landed)
      assert(hr.lo.toLong <= 100L && hr.hi.toLong >= 3900L, hr.toString)
    }
  }

  test("maintain repairs what it detected; selectivity restored") {
    withTable { t =>
      CowTable.create(spark, t, base(4000, 8), Seq("k"))
      (0 until 3).foreach { _ =>
        CowTable.append(spark, t, base(4000, 8).repartition(4))
      }
      val before = Maintenance.advise(spark, t, maxOverlapDepth = 3,
        smallFileRows = 0L)
      assert(before.hotRanges.nonEmpty)
      Maintenance.maintain(spark, t, maxOverlapDepth = 3,
        smallFileRows = 0L, targetFileRows = 2000L)
      assert(Maintenance.advise(spark, t, maxOverlapDepth = 3,
        smallFileRows = 0L).quiet)
      // a narrow range now plans O(range) files again
      val snap = TxLog.snapshot(spark, t)
      val covering = snap.files.count(
        _.stats.get("k").forall(_.mayOverlap("100", "150")))
      assert(covering <= 2, s"selectivity not restored: $covering files")
      assert(CowTable.read(spark, t).count() === 16000L)
    }
  }

  test("small-file buildup advises compact; maintain packs it") {
    withTable { t =>
      CowTable.create(spark, t, base(1000, 2), Seq("k"))
      (0 until 10).foreach { i =>
        CowTable.append(spark, t,
          Seq((10000L + i, 1L, s"tiny$i")).toDF("k", "v", "s"))
      }
      val a = Maintenance.advise(spark, t, maxOverlapDepth = 100,
        smallFileRows = 10L, maxSmallFiles = 4)
      assert(a.compactRecommended && a.smallFiles === 10L)
      Maintenance.maintain(spark, t, maxOverlapDepth = 100,
        smallFileRows = 10L, maxSmallFiles = 4)
      assert(Maintenance.advise(spark, t, maxOverlapDepth = 100,
        smallFileRows = 10L, maxSmallFiles = 4).quiet)
      assert(CowTable.read(spark, t).count() === 1010L)
    }
  }

  test("sidecar-backed advise ≡ inline advise (distributed sweep " +
      "input, round 15)") {
    def adviseOf(threshold: Int): Maintenance.Advice = {
      sys.props("graft.txlog.parquetCheckpointThreshold") = threshold.toString
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft_madv_")
          .toFile
        try {
          val t = dir.getAbsolutePath + "/t"
          CowTable.create(spark, t,
            spark.range(4000).select(col("id").as("k"),
              (col("id") % 5).as("v"))
              .repartitionByRange(4, col("k")), Seq("k"))
          // scattered ingests stack full-range files; push past a
          // checkpoint so the sidecar path engages under threshold 3
          (1 to 20).foreach { i =>
            CowTable.append(spark, t,
              spark.range(4000).select(col("id").as("k"),
                lit(i.toLong).as("v")))
          }
          val p = TxLog.snapshotPlanned(spark, t)
          assert(p.isDistributed === (threshold == 3))
          Maintenance.advise(spark, t, smallFileRows = 100000L)
        } finally {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          rm(dir)
        }
      } finally {
        sys.props.remove("graft.txlog.parquetCheckpointThreshold"); ()
      }
    }
    val dist = adviseOf(3)
    val inline = adviseOf(1000000)
    assert(dist.totalFiles === inline.totalFiles)
    assert(dist.smallFiles === inline.smallFiles)
    // two INDEPENDENT builds aren't file-layout-identical (range
    // partition boundaries sample), so compare the layout-independent
    // shape: same ranges, same peak depths
    assert(dist.hotRanges.map(h => (h.column, h.lo, h.hi, h.depth)) ===
      inline.hotRanges.map(h => (h.column, h.lo, h.hi, h.depth)))
    assert(dist.hotRanges.nonEmpty, "scattered ingests must be detected")
  }
}
