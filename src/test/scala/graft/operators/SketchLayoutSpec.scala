package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch + Z-order layout unit tests. */
class SketchLayoutSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------------ kmv

  test("kmv: small groups report the exact distinct count") {
    val df = (1 to 10).flatMap(i => Seq(("g1", s"v$i"), ("g1", s"v$i")))
      .toDF("grp", "v")
    val r = KmvSketch.distinctEstimate(df, "grp", "v", k = 64).head()
    assert(r.getLong(1) === 10) // n_hashes = exact distinct
    assert(r.getDouble(3) === 10.0)
  }

  test("kmv: estimate of a large population lands near the truth") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"item$i")).toDF("grp", "v")
    val r = KmvSketch.distinctEstimate(df, "grp", "v", k = 256).head()
    val est = r.getDouble(3)
    // KMV standard error is ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est too far from $n")
  }

  test("kmv: estimate is insensitive to duplication of values") {
    val once = (1 to 5000).map(i => ("g", s"x$i")).toDF("grp", "v")
    val thrice = (1 to 5000).flatMap(i =>
      Seq.fill(3)(("g", s"x$i"))).toDF("grp", "v")
    val a = KmvSketch.distinctEstimate(once, "grp", "v", 128).head()
    val b = KmvSketch.distinctEstimate(thrice, "grp", "v", 128).head()
    assert(a.getLong(2) === b.getLong(2)) // identical kth hash
    assert(a.getDouble(3) === b.getDouble(3)) // identical estimate
  }

  test("kmv custom aggregate is bit-identical to the composable form") {
    // adversarial layout: duplicated values spread across many
    // partitions so partial buffers overlap and merge must dedupe
    val df = (1 to 8000).flatMap(i =>
      Seq(("g" + i % 3, s"v${i % 2000}"), ("g" + i % 3, s"v${i % 2000}")))
      .toDF("grp", "v").repartition(16)
    for (k <- Seq(2, 64, 256)) {
      val a = KmvSketch.distinctEstimate(df, "grp", "v", k)
        .orderBy("grp").collect().toSeq
      val b = KmvSketch.distinctEstimateAgg(df, "grp", "v", k)
        .orderBy("grp").collect().toSeq
      assert(a === b, s"k=$k")
    }
  }

  test("kmv aggregate plan: one exchange, no window, no distinct shuffle") {
    val df = (1 to 100).map(i => ("g", s"v$i")).toDF("grp", "v")
    val plan = KmvSketch.distinctEstimateAgg(df, "grp", "v", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), s"no window pass expected:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected a single exchange:\n$plan")
  }

  // --------------------------------------------------------------- zorder

  test("zvalue16: interleaves bits (x even positions, y odd)") {
    val df = Seq((3, 1), (0, 0), (65535, 0), (0, 65535))
      .toDF("x", "y")
    val out = df.select(ZOrder.zvalue16(col("x"), col("y"))).collect()
      .map(_.getLong(0))
    assert(out(0) === 7L) // x=11b → bits 0,2; y=1b → bit 1 → 111b
    assert(out(1) === 0L)
    // x all-ones → all even bit positions: 0x55555555
    assert(out(2) === 0x55555555L)
    assert(out(3) === 0xAAAAAAAAL)
  }

  test("zvalue16 matches its own oracle SQL rendering") {
    val rows = Seq((123, 456), (9999, 1), (40000, 60000))
    val viaColumn = rows.toDF("x", "y")
      .select(ZOrder.zvalue16(col("x"), col("y"))).collect().map(_.getLong(0))
    val viaSql = rows.map { case (x, y) =>
      spark.sql(s"SELECT CAST(${ZOrder.zvalue16Sql(x.toString, y.toString)} " +
        "AS BIGINT)").head().getLong(0)
    }
    assert(viaColumn.toSeq === viaSql)
  }

  test("quantShift: smallest shift that fits the max into 16 bits") {
    val cases = Seq(0L -> 0, 1L -> 0, 65535L -> 0, 65536L -> 1,
      131071L -> 1, 131072L -> 2, (1L << 20) -> 5, (1L << 40) -> 25,
      (1L << 62) -> 47, Long.MaxValue -> 47)
    val got = cases.map(_._1).toDF("m")
      .select(ZOrder.quantShift(col("m"))).collect().map(_.getInt(0))
    assert(got.toSeq === cases.map(_._2))
    // the shifted max actually fits 16 bits, and one less shift would not
    cases.foreach { case (m, s) =>
      assert((m >> s) < 65536)
      if (s > 0) assert((m >> (s - 1)) >= 65536)
    }
  }

  test("quantShift matches its oracle SQL rendering") {
    val ms = Seq(0L, 7L, 65535L, 65536L, 1L << 30, Long.MaxValue)
    val viaSql = ms.map(m =>
      spark.sql(s"SELECT ${ZOrder.quantShiftSql(m.toString)}").head().getInt(0))
    val viaColumn = ms.toDF("m")
      .select(ZOrder.quantShift(col("m"))).collect().map(_.getInt(0))
    assert(viaColumn.toSeq === viaSql)
  }

  test("bucketStats: keys > 65535 apart never alias into one bucket") {
    // with raw 16-bit masking, x = 5 and x = 65541 produce identical
    // z-values (65541 & 0xFFFF == 5) and are GUARANTEED to share a
    // bucket with a bounding box claiming to span both — the aliasing
    // the quantization fix removes. Give the frame a wide domain so
    // the derived shift is > 0.
    val far = 65541L
    val df = Seq((5L, 0L), (far, 0L), ((1L << 20) - 1, 1L))
      .toDF("x", "y")
    val stats = ZOrder.bucketStats(df, col("x"), col("y"), prefixShift = 8)
      .collect()
    // no bucket's bounding box contains both x=5 and x=65541
    stats.foreach { r =>
      val (xMin, xMax) = (r.getLong(2), r.getLong(3))
      assert(!(xMin <= 5L && far <= xMax),
        s"bucket ${r.getLong(0)} box [$xMin,$xMax] aliases distant keys")
    }
    // and each box is tight relative to the quantization: with
    // max x = 2^20-1 the shift is 5, so a prefixShift=8 bucket spans
    // at most 2^(4+5) = 512 quantized-x units × 2^5 raw units... i.e.
    // a raw-x span < 2^14 per bucket — far less than the 2^16+ gap
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < (1L << 14))
    }
  }

  test("zorder cluster: preserves rows and bounds each partition's box") {
    val df = (0 until 1024).map(i => (i % 32, i / 32)).toDF("x", "y")
    val clustered = ZOrder.cluster(df, col("x"), col("y"), numFiles = 4)
    assert(clustered.count() === 1024)
    // each z-prefix bucket covers a tight sub-rectangle: with 32×32
    // uniform points, the 4 buckets of the top-2 z bits are the 4
    // quadrants — each spans half of each dimension
    val stats = ZOrder.bucketStats(df, col("x"), col("y"), prefixShift = 8)
      .collect()
    assert(stats.length === 4)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 15) // x span within quadrant
      assert(r.getLong(5) - r.getLong(4) <= 15) // y span
    }
  }

  test("z-ordered parquet actually skips row groups under a 2-D box filter") {
    // the END of the z-order story: after a clustered write, parquet
    // row-group min/max stats must let the reader SKIP most of the
    // data for a filter selective in both dimensions, while the same
    // rows written round-robin (every file spans the full key range)
    // skip nothing. Measured via the scan's numOutputRows metric —
    // rows surviving the reader, i.e. after row-group pruning.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val n = 40000
    val df = (0 until n).map(i => ((i * 131) % 2000, (i * 71) % 2000, i))
      .toDF("x", "y", "payload")
    val tmp = java.nio.file.Files.createTempDirectory("zskip").toString
    ZOrder.cluster(df, col("x"), col("y"), numFiles = 16)
      .write.parquet(s"$tmp/z")
    df.repartition(16).write.parquet(s"$tmp/n")
    def scanned(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(0, 240) && col("y").between(0, 240))
      // collect() executes THIS Dataset's queryExecution, so the scan
      // node's metrics are the ones we read (a count() would build and
      // execute a different plan); scan→filter has no exchange, so the
      // plan is non-adaptive and the scan is directly collectible
      val kept = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      (scan.map(_.metrics("numOutputRows").value).sum, kept)
    }
    try {
      val (zRows, zKept) = scanned(s"$tmp/z")
      val (nRows, nKept) = scanned(s"$tmp/n")
      assert(zKept === nKept) // same answer from both layouts
      // round-robin: every row group spans the full range → no skipping
      assert(nRows === n, s"expected the natural layout to scan all $n")
      // z-ordered: the ~1.4% box must prune the vast majority
      assert(zRows <= n / 4,
        s"z-ordered scan read $zRows of $n rows — min/max pruning failed")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("hilbert-clustered parquet skips row groups at least as hard as z-order") {
    // the same end-to-end min/max-pruning proof for the Hilbert
    // layout: identical rows written hilbert-clustered vs z-clustered
    // vs round-robin, the same 2-D box over all three
    import org.apache.spark.sql.execution.FileSourceScanExec
    val n = 40000
    val df = (0 until n).map(i => ((i * 131) % 2000, (i * 71) % 2000, i))
      .toDF("x", "y", "payload")
    val tmp = java.nio.file.Files.createTempDirectory("hskip").toString
    HilbertLayout.cluster(df, col("x"), col("y"), numFiles = 16)
      .write.parquet(s"$tmp/h")
    ZOrder.cluster(df, col("x"), col("y"), numFiles = 16)
      .write.parquet(s"$tmp/z")
    df.repartition(16).write.parquet(s"$tmp/n")
    def scanned(path: String): (Long, Long) = {
      val q = spark.read.parquet(path)
        .filter(col("x").between(0, 240) && col("y").between(0, 240))
      val kept = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      (scan.map(_.metrics("numOutputRows").value).sum, kept)
    }
    try {
      val (hRows, hKept) = scanned(s"$tmp/h")
      val (zRows, zKept) = scanned(s"$tmp/z")
      val (nRows, nKept) = scanned(s"$tmp/n")
      assert(hKept === nKept && zKept === nKept)
      assert(nRows === n)
      assert(hRows <= n / 4,
        s"hilbert scan read $hRows of $n rows — min/max pruning failed")
      // the locality claim, end to end — WITH tolerance: range
      // partitioning samples its file-cut boundaries with an RDD-id-
      // derived seed, so the exact cuts shift with suite order, and on
      // an unlucky draw the curves' over-reads wobble both ways (the
      // whole-grid geometric comparison in the hilbert spec is the
      // deterministic form of the locality claim; 2^k-aligned cuts
      // tie). Both layouts must still prune hard (above), and hilbert
      // must stay within noise of z-order, never categorically worse.
      assert(hRows <= zRows * 13 / 10,
        s"hilbert scanned $hRows vs z-order $zRows — beyond boundary noise")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }
}
