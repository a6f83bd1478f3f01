package graft.tables

import graft.tables.TxLog.{AddFile, PlannedSnapshot}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Distributed manifest planning — the round-15 close of the last
  * 100 TB driver ceiling: zone-map / point-set / predicate pruning
  * expressed as a DATAFRAME PLAN over the checkpoint's parquet sidecar
  * ([[TxLog.PlannedSnapshot]]), so a 10⁶⁺-file table's scan planning
  * collects ONLY the surviving manifest entries onto the driver
  * instead of folding every `AddFile` there first.
  *
  * The live set is evaluated as `sidecar ∖ removedEver ∪ tailLive`
  * (see [[TxLog.PlannedSnapshot]]); the pruning predicates here are
  * COLUMN-FORM TWINS of the driver-side rules — [[TxLog.ColStats]]
  * (`mayOverlap`/`mayHaveNulls`), [[CowTable.readMatchingAny]]'s
  * point-set test, and [[StatsPredicate]]'s typed conjunct ranges.
  * Two implementations of one semantics is exactly the drift hazard
  * the ColStats scaladoc warns about, so `ManifestPlanProps`
  * property-pins driver ≡ distributed over randomized stats (longs,
  * doubles incl. NaN, strings incl. non-BMP code points, null flags,
  * missing keys, opaque kinds). The string order is safe by
  * construction: Spark's string comparison IS UTF8String binary order,
  * the same total order `TxLog.utf8Compare` implements.
  *
  * Small tables (inline checkpoints) stay on the driver path — no job
  * launch for a 50-file manifest; the switch is simply whether the
  * checkpoint went sidecar ([[TxLog.ParquetCheckpointThreshold]]).
  *
  * Degrade contract: a torn/vacuumed sidecar falls back to the full
  * commit fold evaluated LOCALLY with the same Column predicate — the
  * commits are the truth, the sidecar is an optimization. The degrade
  * is NARROW (round 16, ADVICE r15): only sidecar-I/O-class failures
  * ([[sidecarDegrade]] — missing path, torn parquet) fall back, and
  * every degrade logs a warning with the table and cause; a genuine
  * execution or analysis failure RETHROWS — silently re-materializing
  * a 10⁷-entry manifest on the driver is the exact ceiling this class
  * removes, and masking a twin-drift bug as a 300× slowdown would be
  * worse than failing.
  */
object ManifestPlan {

  private val log = org.slf4j.LoggerFactory.getLogger(
    "graft.tables.ManifestPlan")

  /** Is this failure a torn/vacuumed/corrupt SIDECAR (degrade to the
    * commit fold) rather than a genuine execution failure (rethrow)?
    * Classifies by the cause chain: missing files and I/O errors are
    * sidecar-class (the sidecar is the only input the planned frame
    * reads), parquet decode failures are a torn sidecar, everything
    * else — analysis errors, a predicate that raises, executor
    * failures with non-I/O causes — propagates.
    */
  private[tables] def sidecarDegrade(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).exists {
      case _: java.io.FileNotFoundException => true
      case _: java.io.IOException => true
      case e => e.getClass.getName.startsWith("org.apache.parquet.") ||
        Option(e.getMessage).exists(m =>
          m.contains("PATH_NOT_FOUND") ||
            m.contains("is not a Parquet file") ||
            m.contains("Could not read footer"))
    }

  /** One warning per degrade — the table, checkpoint version and cause
    * an operator greps for when a plan that took 4 ms starts taking
    * 1.2 s (the silent-slowdown hazard of an unlogged fallback).
    */
  private[tables] def logDegrade(table: String, version: Long,
      e: Throwable): Unit =
    log.warn(s"manifest sidecar unreadable for $table (checkpoint " +
      s"version $version) — degrading to the full commit fold: $e")

  /** The live manifest at `p` as a DataFrame (path, rows, stats).
    * Sidecar-backed: one parquet scan minus the tail's removes
    * (broadcast anti-join above [[IsinRemoveCap]] paths — a tail
    * overwrite can remove the whole base) plus the tail's live adds.
    */
  def filesDf(spark: SparkSession, table: String,
      p: PlannedSnapshot): DataFrame =
    p.sidecarRef match {
      case None => localDf(spark, p.meta.files)
      case Some(ref) =>
        // reader construction lists the sidecar path EAGERLY, so a
        // torn/vacuumed sidecar surfaces here — degrade to the full
        // commit fold instead of handing the caller (e.g. the
        // cow_table_files TVF) a frame that explodes at execution:
        // the commits are the truth, the sidecar is an optimization
        val base =
          try spark.read.schema(TxLog.FilesParquetSchema)
            .parquet(TxLog.sidecarLocation(table, ref))
          catch { case scala.util.control.NonFatal(e)
              if sidecarDegrade(e) && !p.commitTruthRef =>
            // checkpoint sidecars degrade to the fold; a COMMIT
            // adds-sidecar is the truth — unreadable rethrows (the
            // guard above). snapshot() materializes either shape.
            logDegrade(table, p.meta.version, e)
            return localDf(spark, TxLog.snapshotNoCheckpoint(spark, table,
              p.meta.version).files)
          }
        val alive =
          if (p.removedEver.isEmpty) base
          else if (p.removedEver.size <= IsinRemoveCap)
            base.filter(!col("path").isInCollection(p.removedEver))
          else {
            import spark.implicits._
            base.join(
              broadcast(p.removedEver.toSeq.toDF("path")),
              Seq("path"), "left_anti")
          }
        if (p.tailLive.isEmpty) alive
        else alive.unionByName(localDf(spark, p.tailLive))
    }

  private val IsinRemoveCap = 1000

  private def localDf(spark: SparkSession,
      files: Seq[AddFile]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(TxLog.manifestRows(files),
        math.max(1, files.size / 65536)),
      TxLog.FilesParquetSchema)

  /** The entries of `p` where `pred` may hold — ONLY the survivors
    * cross to the driver. Driver path for inline manifests (the same
    * Column evaluated over a local frame would cost a job launch for
    * nothing — callers keep their existing in-memory filters there
    * and use this for the `isDistributed` branch).
    */
  def collectSurvivors(spark: SparkSession, table: String,
      p: PlannedSnapshot, pred: Column): Seq[AddFile] =
    collectSurvivorsWith(spark, table, p)(_.filter(pred))

  /** [[collectSurvivors]] for a POINT-SET test on `key`: the
    * literal-array [[matchesAny]] below [[MatchesAnyLiteralCap]]
    * values; above it the values ship ONCE as a broadcast frame and
    * the test runs as a broadcast LEFT SEMI join against the stats
    * ranges (ADVICE r15) — a wide point set (e.g. a BM25 delete
    * batch's full distinct vocabulary) embedded as a Column literal
    * would inflate the serialized plan shipped with every task and
    * pay an O(values) `exists` per manifest entry.
    */
  def collectSurvivorsAnyOf(spark: SparkSession, table: String,
      p: PlannedSnapshot, key: String,
      values: Seq[String]): Seq[AddFile] =
    if (values.size <= MatchesAnyLiteralCap)
      collectSurvivors(spark, table, p, matchesAny(key, values))
    else collectSurvivorsWith(spark, table, p)(
      anyOfJoin(spark, key, values))

  private[tables] val MatchesAnyLiteralCap = 1024

  /** The broadcast-join twin of [[matchesAny]] (same per-kind parse
    * and conservative rules, value-by-value): keep the manifest
    * entries where SOME value may land in the file's range.
    */
  private[tables] def anyOfJoin(spark: SparkSession, key: String,
      values: Seq[String])(fdf: DataFrame): DataFrame = {
    import spark.implicits._
    // parse ON THE DRIVER with the same scala parses the literal form
    // uses — a SQL try_cast could drift (e.g. ANSI-mode differences)
    val vals = broadcast(values.map(v => (v,
      scala.util.Try(v.toLong).toOption,
      scala.util.Try(v.toDouble).toOption.filterNot(_.isNaN)))
      .toDF("v_str", "v_long", "v_dbl"))
    val hasNaN = values
      .exists(v => scala.util.Try(v.toDouble).toOption.exists(_.isNaN))
    val s = fdf("stats").getItem(key)
    val kind = s.getField("kind")
    val mnD = s.getField("min").cast("double")
    val mxD = s.getField("max").cast("double")
    // value-independent survival: no stat, opaque kind, NaN bounds or
    // a NaN in the set — ANY values row satisfies it, so the semi
    // join keeps the file (values is non-empty above the cap)
    val always = s.isNull ||
      (kind === "double" && (isnan(mnD) || isnan(mxD) || lit(hasNaN))) ||
      !kind.isin("long", "double", "string")
    val perValue =
      (kind === "long" && vals("v_long").isNotNull &&
        vals("v_long") >= s.getField("min").cast("long") &&
        vals("v_long") <= s.getField("max").cast("long")) ||
        (kind === "double" && vals("v_dbl").isNotNull &&
          vals("v_dbl") >= mnD && vals("v_dbl") <= mxD) ||
        (kind === "string" && vals("v_str") >= s.getField("min") &&
          vals("v_str") <= s.getField("max"))
    fdf.join(vals, always || perValue, "left_semi")
  }

  /** Lean `(on-disk location, byte length)` listing of the live
    * manifest at `p` — exactly what a FULL scan's
    * [[org.apache.spark.sql.graft.ManifestFileIndex]] needs and
    * nothing more: paths and sizes cross to the driver, the stats maps
    * never do (the round-16 full-read ceiling close; at 1M entries the
    * decoded-AddFile fold held ~300 MB of driver heap for a question
    * the scan planner answers with ~50 B/entry). Entries written
    * before the manifest carried `bytes` back-fill with ONE
    * distributed stat pass (driver loop below 64 — no job launch for
    * a handful of legacy files). Torn-sidecar degrade as everywhere.
    */
  def leanListing(spark: SparkSession, table: String, p: PlannedSnapshot,
      rootQualified: String, pruneWith: Option[Column] = None)
      : Seq[org.apache.spark.sql.graft.ManifestFileIndex.Entry] = {
    import org.apache.spark.sql.graft.ManifestFileIndex.Entry
    def prune(df: DataFrame): DataFrame =
      pruneWith.fold(df)(df.filter)
    // the degrade catch scopes the SIDECAR read only — a stat failure
    // in the bytes back-fill below is a data-file problem, not a torn
    // sidecar, and must surface as itself (review r16)
    val rows =
      try prune(filesDf(spark, table, p))
        .select(col("path"), col("bytes")).collect()
      catch { case scala.util.control.NonFatal(e)
          if p.isDistributed && sidecarDegrade(e) &&
            !p.commitTruthRef =>
        logDegrade(table, p.meta.version, e)
        prune(localDf(spark, TxLog.snapshotNoCheckpoint(spark, table,
            p.meta.version).files))
          .select(col("path"), col("bytes")).collect()
      }
    val (have, missing) = rows.partition(r => !r.isNullAt(1))
    val known = have.toSeq.map { r =>
      val rel = r.getString(0)
      Entry(TxLog.fileLocation(rootQualified, rel), rel, r.getLong(1))
    }
    if (missing.isEmpty) known
    else {
      val stat = statBytes(spark, missing.toSeq.map(r =>
        TxLog.fileLocation(rootQualified, r.getString(0)))).toMap
      known ++ missing.toSeq.map { r =>
        val rel = r.getString(0)
        val loc = TxLog.fileLocation(rootQualified, rel)
        Entry(loc, rel, stat(loc))
      }
    }
  }

  private def statBytes(spark: SparkSession,
      paths: Seq[String]): Seq[(String, Long)] =
    if (paths.size <= 64) {
      val conf = spark.sessionState.newHadoopConf()
      paths.map { s =>
        val hp = new org.apache.hadoop.fs.Path(s)
        (s, hp.getFileSystem(conf).getFileStatus(hp).getLen)
      }
    } else {
      val bc = org.apache.spark.sql.graft.HadoopConfBridge
        .broadcast(spark.sparkContext, spark.sessionState.newHadoopConf())
      val slices = math.max(1, math.min(paths.size / 256,
        spark.sparkContext.defaultParallelism * 2))
      spark.sparkContext.parallelize(paths, slices).map { s =>
        val c = org.apache.spark.sql.graft.HadoopConfBridge.value(bc)
        val hp = new org.apache.hadoop.fs.Path(s)
        (s, hp.getFileSystem(c).getFileStatus(hp).getLen)
      }.collect().toSeq
    }

  /** Live relative PATHS at `p` — the maintenance ops' listing
    * (vacuum keep-sets, optimize/overwrite removes, provenance's live
    * names): one string per file crosses the driver, never the decoded
    * stats (round 16).
    */
  def livePaths(spark: SparkSession, table: String,
      p: PlannedSnapshot): Seq[String] =
    if (!p.isDistributed) p.meta.files.map(_.path)
    else
      try filesDf(spark, table, p).select("path").collect()
        .map(_.getString(0)).toSeq
      catch { case scala.util.control.NonFatal(e)
          if sidecarDegrade(e) && !p.commitTruthRef =>
        logDegrade(table, p.meta.version, e)
        TxLog.snapshotNoCheckpoint(spark, table, p.meta.version)
          .files.map(_.path)
      }

  /** Distinct DELETION-VECTOR refs of the live manifest — lean (a
    * handful of strings) for the FileIndex read path's DV subtraction.
    */
  def dvRefs(spark: SparkSession, table: String,
      p: PlannedSnapshot): Seq[String] =
    if (!p.isDistributed) p.meta.files.flatMap(_.dv).distinct
    else
      try filesDf(spark, table, p).filter(col("dv").isNotNull)
        .select("dv").distinct().collect().map(_.getString(0)).toSeq
      catch { case scala.util.control.NonFatal(e)
          if sidecarDegrade(e) && !p.commitTruthRef =>
        logDegrade(table, p.meta.version, e)
        TxLog.snapshotNoCheckpoint(spark, table, p.meta.version)
          .files.flatMap(_.dv).distinct
      }

  /** RESTORE's delta sets, computed as anti-joins between the two
    * versions' planned manifests: only the files the restore actually
    * re-adds cross the driver DECODED (they go into the commit), and
    * only the removed paths cross at all — a restore between two
    * nearby versions of a 10⁶-file table is delta-proportional, not
    * 2×manifest-proportional. Degrades whole to the materialized fold.
    */
  def restoreDelta(spark: SparkSession, table: String,
      pHead: PlannedSnapshot,
      pTarget: PlannedSnapshot): (Seq[AddFile], Seq[String]) =
    try {
      val headDf = filesDf(spark, table, pHead)
      val targetDf = filesDf(spark, table, pTarget)
      // adds key on (path, rows, dv): a deletion-vector commit mutates
      // an entry in place, and the restore must re-add its TARGET
      // identity (review r16); removes stay path-keyed. dv is
      // NULLABLE — the join must be null-safe or every vectorless
      // entry would re-add
      val h = headDf.select(col("path").as("_hp"),
        col("rows").as("_hr"), col("dv").as("_hd"))
      val adds = targetDf
        .join(h, col("path") === col("_hp") &&
          col("rows") === col("_hr") && col("dv") <=> col("_hd"),
          "left_anti")
        .collect().map(TxLog.rowToAddFile).toSeq
      val removes = headDf.select("path")
        .join(targetDf.select("path"), Seq("path"), "left_anti")
        .collect().map(_.getString(0)).toSeq
      (adds, removes)
    } catch { case scala.util.control.NonFatal(e)
        if sidecarDegrade(e) &&
          !pHead.commitTruthRef && !pTarget.commitTruthRef =>
      logDegrade(table, pHead.meta.version, e)
      def fold(p: PlannedSnapshot): Seq[AddFile] =
        if (!p.isDistributed) p.meta.files
        else TxLog.snapshotNoCheckpoint(spark, table,
          p.meta.version).files
      val (h, t) = (fold(pHead), fold(pTarget))
      val headPaths = h.map(_.path).toSet
      val targetPaths = t.map(_.path).toSet
      (t.filterNot(a => headPaths.contains(a.path)),
        h.map(_.path).filterNot(targetPaths.contains))
    }

  /** [[collectSurvivors]] minus an EXCLUDED path set — broadcast
    * anti-join above [[MatchesAnyLiteralCap]] paths, so a large
    * exclusion (e.g. the delete audit's probed set) never rides the
    * serialized plan as a literal (review r16).
    */
  private[tables] def collectSurvivorsExcluding(spark: SparkSession,
      table: String, p: PlannedSnapshot, pred: Column,
      except: Set[String]): Seq[AddFile] =
    collectSurvivorsWith(spark, table, p) { df0 =>
      val base = df0.filter(pred)
      if (except.isEmpty) base
      else if (except.size <= MatchesAnyLiteralCap)
        base.filter(!col("path").isInCollection(except))
      else {
        import spark.implicits._
        base.join(broadcast(except.toSeq.toDF("path")), Seq("path"),
          "left_anti")
      }
    }

  private def collectSurvivorsWith(spark: SparkSession, table: String,
      p: PlannedSnapshot)(
      build: DataFrame => DataFrame): Seq[AddFile] =
    try
      build(filesDf(spark, table, p)).collect()
        .map(TxLog.rowToAddFile).toSeq
    catch { case scala.util.control.NonFatal(e)
        if p.isDistributed && sidecarDegrade(e) &&
          !p.commitTruthRef =>
      // torn/vacuumed CHECKPOINT sidecar → full commit fold, SAME
      // predicate evaluated over a local frame (no second pruning
      // semantics); non-sidecar failures and commit-truth refs
      // rethrow — see the object doc
      logDegrade(table, p.meta.version, e)
      build(localDf(spark, TxLog.snapshotNoCheckpoint(spark, table,
          p.meta.version).files))
        .collect().map(TxLog.rowToAddFile).toSeq
    }

  /** Live-entry count of `p` (merge metrics) without materializing the
    * manifest: a count over the planned frame — parquet-footer scale.
    */
  def fileCount(spark: SparkSession, table: String,
      p: PlannedSnapshot): Long =
    if (!p.isDistributed) p.meta.files.size.toLong
    else
      try filesDf(spark, table, p).count()
      catch { case scala.util.control.NonFatal(e)
          if sidecarDegrade(e) && !p.commitTruthRef =>
        logDegrade(table, p.meta.version, e)
        TxLog.snapshotNoCheckpoint(spark, table, p.meta.version)
          .files.size.toLong
      }

  // ------------------------------------------------- predicate twins

  /** The stats struct of physical column `key` (null = no stat
    * recorded → every twin answers conservatively TRUE, matching the
    * driver's `stats.get(c).forall(...)`).
    */
  private def st(key: String): Column = col("stats").getItem(key)

  /** Column twin of [[TxLog.ColStats.mayOverlap]] with STRING-encoded
    * bounds (the merge key-bounds encoding): could the file's range on
    * `key` intersect `[lo, hi]`? Bounds that don't parse as the file's
    * kind FAIL LOUDLY on the first row of that kind (`raise_error`) —
    * exactly when the driver twin throws `NumberFormatException` — so
    * mis-typed caller bounds (`optimizeWhere(longCol, "5.5", "9.5")`)
    * surface on sidecar-backed tables instead of silently selecting
    * and rewriting broadly (ADVICE r15). Files of OTHER kinds never
    * evaluate the raising branch, matching the driver's per-file
    * dispatch.
    */
  def mayOverlap(key: String, lo: String, hi: String): Column = {
    val s = st(key)
    s.isNull || overlapEncoded(s, lo, hi)
  }

  /** Loud twin of the driver's `NumberFormatException` for bounds that
    * don't parse as the encountered file's kind.
    */
  private def badBounds(kindName: String, lo: String,
      hi: String): Column =
    raise_error(lit(s"zone-map bounds [$lo, $hi] do not parse as the " +
      s"file's stats kind '$kindName' — mis-typed caller bounds " +
      "(the driver path throws NumberFormatException here)"))

  private def overlapEncoded(s: Column, lo: String, hi: String): Column = {
    val kind = s.getField("kind")
    val longC = scala.util.Try((lo.toLong, hi.toLong)).toOption
      .map { case (l, h) =>
        s.getField("min").cast("long") <= lit(h) &&
          lit(l) <= s.getField("max").cast("long")
      }.getOrElse(badBounds("long", lo, hi))
    val dblC = scala.util.Try((lo.toDouble, hi.toDouble)).toOption
      .map { case (l, h) =>
        if (l.isNaN || h.isNaN) lit(true)
        else {
          val mn = s.getField("min").cast("double")
          val mx = s.getField("max").cast("double")
          isnan(mn) || isnan(mx) || (mn <= lit(h) && lit(l) <= mx)
        }
      }.getOrElse(badBounds("double", lo, hi))
    // Spark string comparison IS the manifest's UTF-8 byte order
    val strC = s.getField("min") <= lit(hi) && lit(lo) <= s.getField("max")
    when(kind === "long", longC)
      .when(kind === "double", dblC)
      .when(kind === "string", strC)
      .otherwise(lit(true))
  }

  /** [[mayOverlap]]'s conservative-EXCLUSIVE twin for layout rewrites
    * ([[CowTable.optimizeWhere]]): stats-less and opaque entries are
    * excluded — rewriting them once per hot range forever is pure
    * waste, and a layout rewrite that misses a file loses nothing.
    */
  def mayOverlapExclusive(key: String, lo: String, hi: String): Column = {
    val s = st(key)
    s.isNotNull && s.getField("kind") =!= "opaque" &&
      overlapEncoded(s, lo, hi)
  }

  /** Column twin of the MERGE candidate rule ([[CowTable.merge]] step
    * 1): on EVERY key the file may overlap the batch's non-null bounds
    * OR (the batch holds a null on that key AND the file may hold
    * nulls — `ColStats.mayHaveNulls`, legacy None answering true).
    */
  def mergeCandidate(
      keyBounds: Map[String, (Option[(String, String)], Boolean)],
      phys: String => String): Column =
    keyBounds.map { case (k, (range, batchNull)) =>
      val s = st(phys(k))
      val rangeC = range.map { case (lo, hi) => overlapEncoded(s, lo, hi) }
        .getOrElse(lit(false))
      val nullC =
        if (batchNull) coalesce(s.getField("nulls"), lit(true))
        else lit(false)
      s.isNull || rangeC || nullC
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Column twin of [[CowTable.readMatchingAny]]'s point-set test:
    * could the file hold AT LEAST ONE of `values`? Values that don't
    * parse as the file's kind drop out; NaN doubles keep the
    * conservative always-match; opaque/missing stats never prune.
    * O(values) per entry — distributed over executors, where the
    * driver path's binary search would be false economy.
    */
  def matchesAny(key: String, values: Seq[String]): Column = {
    val s = st(key)
    val kind = s.getField("kind")
    val longVals = values.flatMap(v => scala.util.Try(v.toLong).toOption)
    val dblVals = values.flatMap(v => scala.util.Try(v.toDouble).toOption)
      .filterNot(_.isNaN)
    val hasNaN = values
      .exists(v => scala.util.Try(v.toDouble).toOption.exists(_.isNaN))
    def anyIn(arr: Column, mn: Column, mx: Column): Column =
      exists(arr, x => x >= mn && x <= mx)
    val longC =
      if (longVals.isEmpty) lit(false)
      else anyIn(lit(longVals.toArray), s.getField("min").cast("long"),
        s.getField("max").cast("long"))
    val dblC = {
      val mn = s.getField("min").cast("double")
      val mx = s.getField("max").cast("double")
      val in =
        if (dblVals.isEmpty) lit(false)
        else anyIn(lit(dblVals.toArray), mn, mx)
      isnan(mn) || isnan(mx) || lit(hasNaN) || in
    }
    val strC =
      if (values.isEmpty) lit(false)
      else anyIn(lit(values.toArray), s.getField("min"), s.getField("max"))
    s.isNull || when(kind === "long", longC)
      .when(kind === "double", dblC)
      .when(kind === "string", strC)
      .otherwise(lit(true))
  }

  /** Column twin of [[StatsPredicate.prune]]: the conjunct ranges
    * [[ColumnBridge.simpleRanges]] extracts from `cond`, each compared
    * under the file's kind with the driver's exact type-dispatch
    * rules. None = no recognized conjuncts (no pruning — scan all).
    */
  def prunePredicate(cond: Column,
      phys: String => String): Option[Column] =
    rangesPredicate(ColumnBridge.simpleRanges(cond), phys)

  /** The conjunct-range pruning predicate from ALREADY-EXTRACTED
    * ranges — shared by the Column path above and the FileIndex's
    * pushed-filter path ([[ColumnBridge.simpleRangesResolved]]).
    */
  def rangesPredicate(
      ranges: Seq[(String, Option[Any], Option[Any])],
      phys: String => String): Option[Column] =
    if (ranges.isEmpty) None
    else Some(ranges.map { case (name, lo, hi) =>
      val s = st(phys(name))
      s.isNull || overlapsTyped(s, lo, hi)
    }.reduce(_ && _))

  /** [[prunePredicate]]'s conservative-EXCLUSIVE twin
    * ([[StatsPredicate.pruneForRewrite]]): stats-less and opaque
    * entries are EXCLUDED (rewriting them per hot range is pure
    * waste), and every recognized conjunct must POSITIVELY overlap.
    */
  def rewritePredicate(cond: Column,
      phys: String => String): Option[Column] = {
    val ranges = ColumnBridge.simpleRanges(cond)
    if (ranges.isEmpty) None
    else Some(ranges.map { case (name, lo, hi) =>
      val s = st(phys(name))
      s.isNotNull && s.getField("kind") =!= "opaque" &&
        overlapsTyped(s, lo, hi)
    }.reduce(_ && _))
  }

  /** PROVABLE-match test for the point-set delete audit
    * ([[CowTable.deleteWhereMatchingAny]]'s `audit = "stats"`): TRUE
    * only when the manifest entry PROVABLY holds at least one row
    * matching every range conjunct — rows > 0, and for each conjunct
    * the stat exists, records NO nulls, the kind matches the
    * literal's family, and the file's WHOLE [min, max] sits inside
    * the conjunct's bounds (then every row satisfies every conjunct
    * simultaneously, so one matching row certainly exists). The exact
    * OPPOSITE polarity of the pruning twins: those must never answer
    * false wrongly, this must never answer TRUE wrongly — NaN,
    * missing stats, opaque kinds, family mismatches all answer false.
    */
  def provablyAllMatch(
      ranges: Seq[(String, Option[Any], Option[Any])],
      phys: String => String): Column =
    ranges.map { case (nm, lo, hi) =>
      val s = st(phys(nm))
      // NULL-safe: a legacy entry's null `nulls` flag must answer
      // FALSE (unprovable), never infect the conjunction with NULL
      coalesce(s.isNotNull && s.getField("nulls") === lit(false) &&
        containsTyped(s, lo, hi), lit(false))
    }.reduce(_ && _) && col("rows") > lit(0L)

  /** `[min, max] ⊆ [lo, hi]` under the file's kind — the sound
    * (never-wrongly-true) containment counterpart of
    * [[overlapsTyped]].
    */
  private def containsTyped(s: Column, lo: Option[Any],
      hi: Option[Any]): Column = {
    val kind = s.getField("kind")
    val longC = {
      val (l, h) = (lo.map(asL), hi.map(asL))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) lit(false)
      else {
        val c1 = l.flatten
          .map(v => s.getField("min").cast("long") >= lit(v))
          .getOrElse(lit(true))
        val c2 = h.flatten
          .map(v => s.getField("max").cast("long") <= lit(v))
          .getOrElse(lit(true))
        c1 && c2
      }
    }
    val dblC = {
      val (l, h) = (lo.map(asD), hi.map(asD))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty) ||
          l.flatten.exists(_.isNaN) || h.flatten.exists(_.isNaN))
        lit(false)
      else {
        val mn = s.getField("min").cast("double")
        val mx = s.getField("max").cast("double")
        val c1 = l.flatten.map(v => mn >= lit(v)).getOrElse(lit(true))
        val c2 = h.flatten.map(v => mx <= lit(v)).getOrElse(lit(true))
        !isnan(mn) && !isnan(mx) && c1 && c2
      }
    }
    val strC = {
      val (l, h) = (lo.map(asS), hi.map(asS))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) lit(false)
      else {
        val c1 = l.flatten.map(v => s.getField("min") >= lit(v))
          .getOrElse(lit(true))
        val c2 = h.flatten.map(v => s.getField("max") <= lit(v))
          .getOrElse(lit(true))
        c1 && c2
      }
    }
    when(kind === "long", longC)
      .when(kind === "double", dblC)
      .when(kind === "string", strC)
      .otherwise(lit(false))
  }

  private def asL(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case sh: Short => Some(sh.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }
  private def asD(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case fl: Float => Some(fl.toDouble)
    case _ => None
  }
  private def asS(v: Any): Option[String] = v match {
    case str: String => Some(str)
    case _ => None
  }

  /** Column twin of `StatsPredicate.overlaps` — runtime-typed bounds
    * from the predicate's literals, matched against the file's kind
    * family exactly as the driver form does (a literal of the wrong
    * family never prunes).
    */
  private def overlapsTyped(s: Column, lo: Option[Any],
      hi: Option[Any]): Column = {
    val kind = s.getField("kind")
    val longC = {
      val (l, h) = (lo.map(asL), hi.map(asL))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) lit(true)
      else {
        val c1 = l.flatten
          .map(v => lit(v) <= s.getField("max").cast("long"))
          .getOrElse(lit(true))
        val c2 = h.flatten
          .map(v => lit(v) >= s.getField("min").cast("long"))
          .getOrElse(lit(true))
        c1 && c2
      }
    }
    val dblC = {
      val (l, h) = (lo.map(asD), hi.map(asD))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) lit(true)
      else {
        val mn = s.getField("min").cast("double")
        val mx = s.getField("max").cast("double")
        val c1 = l.flatten.map(v =>
          if (v.isNaN) lit(true) else lit(v) <= mx).getOrElse(lit(true))
        val c2 = h.flatten.map(v =>
          if (v.isNaN) lit(true) else lit(v) >= mn).getOrElse(lit(true))
        isnan(mn) || isnan(mx) || (c1 && c2)
      }
    }
    val strC = {
      val (l, h) = (lo.map(asS), hi.map(asS))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) lit(true)
      else {
        val c1 = l.flatten.map(v => lit(v) <= s.getField("max"))
          .getOrElse(lit(true))
        val c2 = h.flatten.map(v => lit(v) >= s.getField("min"))
          .getOrElse(lit(true))
        c1 && c2
      }
    }
    when(kind === "long", longC)
      .when(kind === "double", dblC)
      .when(kind === "string", strC)
      .otherwise(lit(true))
  }
}
