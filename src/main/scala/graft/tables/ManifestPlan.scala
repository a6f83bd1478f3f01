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
  * commits are the truth, the sidecar is an optimization.
  */
object ManifestPlan {

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
          catch { case scala.util.control.NonFatal(_) =>
            return localDf(spark, TxLog.snapshotPlanned(spark, table,
              Some(p.meta.version), useCheckpoint = false).meta.files)
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
    try
      filesDf(spark, table, p).filter(pred).collect()
        .map(TxLog.rowToAddFile).toSeq
    catch { case scala.util.control.NonFatal(_) if p.isDistributed =>
      // torn/vacuumed sidecar → full commit fold, SAME predicate
      // evaluated over a local frame (no second pruning semantics)
      localDf(spark, TxLog.snapshotPlanned(spark, table,
          Some(p.meta.version), useCheckpoint = false).meta.files)
        .filter(pred).collect().map(TxLog.rowToAddFile).toSeq
    }

  /** Live-entry count of `p` (merge metrics) without materializing the
    * manifest: a count over the planned frame — parquet-footer scale.
    */
  def fileCount(spark: SparkSession, table: String,
      p: PlannedSnapshot): Long =
    if (!p.isDistributed) p.meta.files.size.toLong
    else
      try filesDf(spark, table, p).count()
      catch { case scala.util.control.NonFatal(_) =>
        TxLog.snapshotPlanned(spark, table, Some(p.meta.version),
          useCheckpoint = false).meta.files.size.toLong
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
    * kind answer TRUE (conservative — the driver callers guarantee
    * type-consistent bounds, so this branch never prunes wrongly).
    */
  def mayOverlap(key: String, lo: String, hi: String): Column = {
    val s = st(key)
    s.isNull || overlapEncoded(s, lo, hi)
  }

  private def overlapEncoded(s: Column, lo: String, hi: String): Column = {
    val kind = s.getField("kind")
    val longC = scala.util.Try((lo.toLong, hi.toLong)).toOption
      .map { case (l, h) =>
        s.getField("min").cast("long") <= lit(h) &&
          lit(l) <= s.getField("max").cast("long")
      }.getOrElse(lit(true))
    val dblC = scala.util.Try((lo.toDouble, hi.toDouble)).toOption
      .map { case (l, h) =>
        if (l.isNaN || h.isNaN) lit(true)
        else {
          val mn = s.getField("min").cast("double")
          val mx = s.getField("max").cast("double")
          isnan(mn) || isnan(mx) || (mn <= lit(h) && lit(l) <= mx)
        }
      }.getOrElse(lit(true))
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
      phys: String => String): Option[Column] = {
    val ranges = ColumnBridge.simpleRanges(cond)
    if (ranges.isEmpty) None
    else Some(ranges.map { case (name, lo, hi) =>
      val s = st(phys(name))
      s.isNull || overlapsTyped(s, lo, hi)
    }.reduce(_ && _))
  }

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

  /** Column twin of `StatsPredicate.overlaps` — runtime-typed bounds
    * from the predicate's literals, matched against the file's kind
    * family exactly as the driver form does (a literal of the wrong
    * family never prunes).
    */
  private def overlapsTyped(s: Column, lo: Option[Any],
      hi: Option[Any]): Column = {
    val kind = s.getField("kind")
    def asL(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case sh: Short => Some(sh.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def asD(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case fl: Float => Some(fl.toDouble)
      case _ => None
    }
    def asS(v: Any): Option[String] = v match {
      case str: String => Some(str)
      case _ => None
    }
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
