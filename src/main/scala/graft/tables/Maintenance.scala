package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Manifest-driven maintenance advisor — the nightly-ops loop that
  * decides WHEN the layout tools ([[CowTable.compact]],
  * [[CowTable.optimizeWhere]]) are worth running, from the zone maps
  * alone: zero executor work, one log fold, O(files · log files)
  * driver time. At 100 TB "optimize the whole table nightly" is not a
  * plan; "optimize the ranges whose files actually overlap" is — and
  * the manifest already knows which ranges those are.
  *
  * '''Overlap depth''' is the fragmentation signal: in a well-laid-out
  * table each key range is covered by ~1 file, so a stats-pruned read
  * or merge touches O(selected range) files. Every scattered ingest
  * stacks another full-range file on top; once `maxOverlapDepth` files
  * cover the same key range, a narrow read pays depth× its fair cost.
  * The advisor sweeps the per-file [min, max] intervals of a stats
  * column (the classic interval endpoint sweep) under the SAME typed
  * order the zone maps prune with ([[TxLog.ColStats]] — UTF-8 byte
  * order for strings, not Java compareTo), and reports each maximal
  * range whose cover depth exceeds the threshold, bounds string-encoded
  * exactly as [[CowTable.optimizeWhere]] consumes them.
  *
  * [[maintain]] applies the advice: one scoped optimize per hot range
  * (file count sized from the manifest's row counts), then a compact
  * if small files accumulated. Contents are untouched by construction
  * (both tools are layout-only); the `table_maintain` gate pins that
  * end to end, and the spec pins the quality contract (scattered →
  * detected; after maintain → quiet, selectivity restored).
  */
object Maintenance {

  /** A maximal key range covered by more than the threshold number of
    * files: `[lo, hi]` in the stats string encoding, the peak cover
    * `depth`, and how many distinct files intersect the range.
    */
  final case class HotRange(column: String, lo: String, hi: String,
      depth: Int, files: Int)

  final case class Advice(totalFiles: Long, smallFiles: Long,
      compactRecommended: Boolean, hotRanges: Seq[HotRange]) {
    def quiet: Boolean = !compactRecommended && hotRanges.isEmpty
  }

  /** Analyze the manifest. `column` defaults to the table's first
    * stats column (the primary clustering key); files without a
    * comparable stat on it (opaque kinds) don't join the sweep.
    *
    * Sidecar-backed tables (round 15): the counts aggregate and the
    * advised column's interval triples come off the MANIFEST FRAME
    * ([[ManifestPlan.filesDf]]) — the driver holds one lean
    * (kind, min, max) triple per file for the endpoint sweep (which is
    * inherently a driver interval algorithm), never the full
    * AddFile-decoded manifest. Inline manifests keep the in-memory
    * path.
    */
  def advise(spark: SparkSession, path: String,
      column: Option[String] = None,
      maxOverlapDepth: Int = 4,
      smallFileRows: Long = 100000L,
      maxSmallFiles: Int = 8): Advice = {
    val psnap = TxLog.snapshotPlanned(spark, path)
    val snap = psnap.meta
    // `column` is LOGICAL (user-facing; HotRange feeds col(...) in the
    // maintain layout); stats keys are PHYSICAL — translate at lookup
    val rev = snap.columnMap.getOrElse(Map.empty)
      .filterNot(_._1.contains(".")).map(_.swap)
    val c = column.getOrElse(snap.statsCols.headOption.map(ph =>
      rev.getOrElse(ph, ph)).getOrElse(
      sys.error(s"$path has no stats columns to advise on")))
    val ph = snap.physName(c)

    def driverInput(files: Seq[TxLog.AddFile])
        : (Long, Long, Seq[TxLog.ColStats]) =
      (files.size.toLong,
        files.count(_.rows < smallFileRows).toLong,
        files.flatMap(f => f.stats.get(ph)
          .filter(s => s.kind == "long" || s.kind == "double" ||
            s.kind == "string")))
    val (total, smalls, stats) =
      if (!psnap.isDistributed) driverInput(snap.files)
      else try {
        import org.apache.spark.sql.functions.{coalesce, count, lit,
          sum, when}
        val df = ManifestPlan.filesDf(spark, path, psnap)
        val counts = df.agg(count(lit(1)),
          coalesce(sum(when(col("rows") < smallFileRows, 1L)
            .otherwise(0L)), lit(0L)))
          .collect()(0)
        val s = col("stats").getItem(ph)
        val triples = df
          .filter(s.isNotNull &&
            s.getField("kind").isin("long", "double", "string"))
          .select(s.getField("kind"), s.getField("min"),
            s.getField("max"))
          .collect()
          .map(r => TxLog.ColStats(r.getString(0), r.getString(1),
            r.getString(2)))
          .toSeq
        (counts.getLong(0), counts.getLong(1), triples)
      } catch { case scala.util.control.NonFatal(e)
          if ManifestPlan.sidecarDegrade(e) && !psnap.commitTruthRef =>
        // a sidecar vacuumed mid-scan: degrade to the commit fold —
        // the same NARROW, logged contract as every other ManifestPlan
        // consumer (non-sidecar failures and commit-truth refs rethrow)
        ManifestPlan.logDegrade(path, snap.version, e)
        driverInput(TxLog.snapshotNoCheckpoint(spark, path,
          snap.version).files)
      }
    val hot =
      if (stats.isEmpty) Seq.empty[HotRange]
      else sweep(c, stats, maxOverlapDepth)
    Advice(total, smalls, smalls > maxSmallFiles, hot)
  }

  /** Apply the advice: a scoped optimize per hot range (layout =
    * range-repartition + sort on the advised column, file count from
    * the manifest rows in range), then a compact when small files
    * accumulated. Returns the PRE-maintenance advice for reporting.
    */
  def maintain(spark: SparkSession, path: String,
      column: Option[String] = None,
      maxOverlapDepth: Int = 4,
      smallFileRows: Long = 100000L,
      maxSmallFiles: Int = 8,
      targetFileRows: Long = 500000L): Advice = {
    val a = advise(spark, path, column, maxOverlapDepth, smallFileRows,
      maxSmallFiles)
    a.hotRanges.foreach { hr =>
      val psnap = TxLog.snapshotPlanned(spark, path)
      val snap = psnap.meta
      val ph = snap.physName(hr.column)
      def driverRows(files: Seq[TxLog.AddFile]): Long = files
        .filter(_.stats.get(ph).forall(_.mayOverlap(hr.lo, hr.hi)))
        .map(_.rows).sum
      val rows =
        if (!psnap.isDistributed) driverRows(snap.files)
        else try {
          import org.apache.spark.sql.functions.{coalesce, lit, sum}
          ManifestPlan.filesDf(spark, path, psnap)
            .filter(ManifestPlan.mayOverlap(ph, hr.lo, hr.hi))
            .agg(coalesce(sum("rows"), lit(0L))).collect()(0).getLong(0)
        } catch { case scala.util.control.NonFatal(e)
            if ManifestPlan.sidecarDegrade(e) && !psnap.commitTruthRef =>
          ManifestPlan.logDegrade(path, snap.version, e)
          driverRows(TxLog.snapshotNoCheckpoint(spark, path,
            snap.version).files)
        }
      val n = math.max(1L, (rows + targetFileRows - 1) / targetFileRows)
      CowTable.optimizeWhere(spark, path, hr.column, hr.lo, hr.hi,
        _.repartitionByRange(n.toInt, col(hr.column))
          .sortWithinPartitions(hr.column))
      ()
    }
    if (a.compactRecommended)
      CowTable.compact(spark, path, smallFileRows,
        targetFileCount = math.max(1,
          (a.smallFiles * smallFileRows / targetFileRows).toInt max 1))
    a
  }

  // ---------------------------------------------------------------- //

  /** Endpoint sweep over inclusive [min, max] intervals: +1 at each
    * min, −1 after each max; at EQUAL values starts order before ends
    * (two files sharing one key value DO overlap there). Emits each
    * maximal value range where depth > threshold, with the peak depth
    * and the count of distinct files intersecting it.
    */
  private[tables] def sweep(column: String, stats: Seq[TxLog.ColStats],
      maxDepth: Int): Seq[HotRange] = {
    val kind = stats.head.kind
    val lt: (String, String) => Boolean = kind match {
      case "long"   => (a, b) => a.toLong < b.toLong
      case "double" => (a, b) => a.toDouble < b.toDouble
      case _        => (a, b) => TxLog.utf8Compare(a, b) < 0
    }
    // (value, isStart): starts sort before ends at the same value
    val events = stats.flatMap(s => Seq((s.min, true), (s.max, false)))
      .sortWith { case ((v1, s1), (v2, s2)) =>
        if (lt(v1, v2)) true
        else if (lt(v2, v1)) false
        else s1 && !s2
      }
    val out = scala.collection.mutable.ArrayBuffer[HotRange]()
    var depth = 0
    var peak = 0
    var files = 0
    var lo: Option[String] = None
    events.foreach { case (v, isStart) =>
      if (isStart) {
        depth += 1
        if (depth > maxDepth && lo.isEmpty) {
          lo = Some(v)
          // files already open contribute to the range too
          peak = depth
          files = depth
        } else if (lo.nonEmpty) {
          files += 1
          peak = math.max(peak, depth)
        }
      } else {
        if (lo.nonEmpty && depth - 1 <= maxDepth) {
          out += HotRange(column, lo.get, v, peak, files)
          lo = None; peak = 0; files = 0
        }
        depth -= 1
      }
    }
    out.toSeq
  }

}
