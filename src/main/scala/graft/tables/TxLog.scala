package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Transaction log for [[CowTable]] — the "production holder" the
  * Scd2/AggMerge scaladocs defer to: a versioned, atomically-committed
  * manifest of which parquet files constitute the table, in the style
  * the open table formats (Delta/Iceberg/Hudi) established, built from
  * nothing but Hadoop `FileSystem` + JSON.
  *
  * Layout under the table root:
  * {{{
  *   _txlog/00000000000000000001.json             one file per commit
  *   _txlog/00000000000000000020.checkpoint.json  folded snapshot
  *   data/<op-uuid>/part-*.parquet                one dir per write op
  * }}}
  *
  * Commit `v` is a single JSON document: the files it ADDS (with row
  * counts and per-column min/max zone maps), the live files it REMOVES,
  * and — on commit 1 — the pinned schema DDL. The live file set at
  * version v is the ordered fold of commits 1..v (adds ∪, removes ∖);
  * nothing is ever rewritten in place, so every historical version
  * stays readable until [[CowTable.vacuum]] reclaims it (time travel).
  *
  * '''Atomicity / concurrency''' — optimistic: a writer computes its
  * changes against snapshot version v, serializes them to a temp file,
  * and publishes by renaming to `_txlog/{v+1}.json`. Exactly one writer
  * can create that name: HDFS `rename` is atomic and fails when the
  * destination exists, so the loser observes `false` (or sees the
  * winner's file), re-reads the log, and replays its operation against
  * the new snapshot ([[CowTable.merge]] retries this loop). On a raw
  * object store without atomic rename-if-absent this final publish
  * needs a conditional-put primitive (the same caveat every log-based
  * format documents); everything else is plain immutable-file I/O.
  *
  * '''Scale shape''' — the log is METADATA: its size tracks file count,
  * not data volume. Opening a table reads the latest checkpoint (one
  * folded JSON, written every [[CheckpointInterval]] commits) plus the
  * commit tail — O(files + interval) driver-side work, zero executor
  * work. At 100 TB / ~1 GB files that is ~1e5 manifest entries; the
  * fold is a driver hash-map pass. Zone-map stats ride the manifest, so
  * merge-time file pruning ([[CowTable.merge]]) never touches parquet
  * footers.
  */
object TxLog {

  val LogDir = "_txlog"
  val CheckpointInterval = 20

  /** Above this live-file count a checkpoint's manifest entries are
    * written as a PARQUET sidecar instead of inline JSON (the
    * checkpoint JSON then carries only the table-level state plus a
    * `filesRef` pointer). At 100 TB small-file counts (~1e5 entries) a
    * driver-side JSON parse of the full manifest becomes the
    * table-open bottleneck; the parquet form decodes in bulk, is
    * directly readable as a DataFrame ([[filesAsDf]] — distributed
    * manifest consumers never touch the driver fold), and compresses
    * the repetitive stats encoding. Below the threshold the inline
    * JSON form is simpler and has no executor dependency.
    */
  def ParquetCheckpointThreshold: Int =
    sys.props.get("graft.txlog.parquetCheckpointThreshold")
      .map(_.toInt).getOrElse(5000)

  /** One data file in the manifest. `path` is RELATIVE to the table
    * root so the table directory can be relocated wholesale. Zone maps
    * (`stats`) cover the table's declared stats columns; min/max are
    * encoded as strings with a kind tag so the manifest stays
    * schema-stable JSON (compared after decoding, [[ColStats.contains]]).
    * `bytes` is the on-disk file LENGTH (round 16 — what Spark's scan
    * planning sizes splits from): recorded at write time so a
    * manifest-backed `FileIndex` can hand the scheduler real lengths
    * without an O(files) stat storm; None in pre-upgrade manifests
    * (additive JSON evolution — [[graft.ManifestFileIndex]] back-fills
    * those with ONE distributed stat pass).
    */
  /** `dv` (round 16, protocol 6): table-relative location of the
    * file's DELETION VECTOR — a parquet sidecar of (rel_path,
    * row_index) pairs under `_dv/` that reads subtract (merge-on-read:
    * a small delete marks rows instead of rewriting a 1 GB file; see
    * [[CowTable.deleteWhereDv]]). None = no deleted rows. `rows` is
    * the LIVE count (decremented as the vector grows); `stats` stay
    * those of the written file — conservative, never wrong.
    */
  final case class AddFile(path: String, rows: Long,
      stats: Map[String, ColStats], bytes: Option[Long] = None,
      dv: Option[String] = None)

  final case class ColStats(kind: String, min: String, max: String,
      nulls: Option[Boolean] = None) {
    /** Could a row with `value` for this column live in this file?
      * Conservative: unknown kinds never prune.
      */
    def mayContain(value: Any): Boolean =
      mayOverlap(value, value)
    /** Could this file hold a row with a NULL in this column? Spark's
      * min/max aggregates IGNORE nulls, so the range alone says nothing
      * about null presence — yet merge joins with null-safe `<=>`, so a
      * null-keyed batch row CAN match a null-keyed file row whose
      * non-null range is disjoint from the batch bounds. Pruning such a
      * file would silently turn the update into a duplicate insert (the
      * round-12 advice bug). `nulls` is recorded at writeFiles time;
      * None (a pre-upgrade manifest) answers true — legacy files never
      * prune against null-keyed batches.
      */
    def mayHaveNulls: Boolean = nulls.getOrElse(true)
    /** Range-overlap form: could this file intersect [lo, hi]?
      * Pruning must use the SAME total order Spark's min/max used to
      * build the stats, or a real match can be pruned into a silent
      * duplicate insert:
      *   - strings compare as UTF-8 BYTES (Spark's UTF8String binary
      *     order = code-point order), NOT Java compareTo (UTF-16 units
      *     rank supplementary-plane chars below U+E000);
      *   - NaN bounds answer true (every NaN comparison is false, so a
      *     NaN-keyed batch would otherwise prune the very files that
      *     hold its rows — NaN sorts above all doubles in Spark, a
      *     range test can't place it).
      */
    def mayOverlap(lo: Any, hi: Any): Boolean = kind match {
      case "long"   => min.toLong <= hi.toString.toLong &&
        lo.toString.toLong <= max.toLong
      case "double" =>
        val (l, h) = (lo.toString.toDouble, hi.toString.toDouble)
        val (mn, mx) = (min.toDouble, max.toDouble)
        l.isNaN || h.isNaN || mn.isNaN || mx.isNaN ||
          (mn <= h && l <= mx)
      case "string" =>
        utf8Compare(min, hi.toString) <= 0 &&
          utf8Compare(lo.toString, max) <= 0
      case _        => true
    }
  }

  /** THE string order of the manifest: UTF-8 byte comparison —
    * Spark's UTF8String binary order (= code-point order), NOT Java
    * compareTo (UTF-16 units rank supplementary-plane chars below
    * U+E000). Every consumer of string zone maps must compare with
    * this one function ([[ColStats.mayOverlap]], [[StatsPredicate]],
    * [[CowTable.readMatchingAny]], the [[graft.tables.Maintenance]]
    * sweep) — a second implementation that drifted would silently
    * desync pruning from the stats.
    */
  private[tables] def utf8Compare(a: String, b: String): Int = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Idempotence stamp for exactly-once writers (the streaming sink):
    * a commit carrying `Txn(app, v)` marks "application `app` has
    * applied its batch `v`". A writer replaying batch ≤ v (retries,
    * restarts from an old streaming checkpoint) observes the stamp in
    * the snapshot and skips — the replay becomes a no-op instead of a
    * double-apply.
    */
  final case class Txn(app: String, version: Long)

  /** A committed version: what it added/removed, (v1 only) the pinned
    * schema + stats columns, an optional idempotence stamp, and — for
    * CDC-enabled merges — the table-relative dir of the commit's
    * row-level change file ([[CowTable.changesCdcAt]]). All optional
    * fields default None so pre-upgrade logs parse unchanged.
    * `meta` is free-form per-commit annotation for DOMAIN layers built
    * on the log (e.g. the ANN index stamps the model epoch its coded
    * rows were produced under) — never read by the fold itself, so it
    * can't change what a snapshot contains (reader protocol unaffected:
    * ignoring an annotation misses a domain-level check, it never
    * misinterprets data).
    */
  /** `addsRef` (round 16, protocol 5): the commit's adds live in a
    * parquet SIDECAR under `_txlog/` instead of inline JSON — the
    * bulk-reference mechanism CLONE CREATES need (a 10⁷-file clone's
    * v1 would otherwise be a multi-GB JSON document built on the
    * driver). Constrained to VERSION-1 commits (a mid-log ref-add
    * could resurrect a previously removed path, which the lazy
    * set-minus algebra cannot see) and stamped `minReader = 5`: an
    * older reader ignores the unknown field and would silently read
    * an EMPTY table. The sidecar is COMMIT TRUTH, not an optimization
    * — unreadable means corruption (loud), unlike a checkpoint
    * sidecar's degrade-to-the-fold.
    */
  final case class Commit(version: Long, op: String, adds: Seq[AddFile],
      removes: Seq[String], schemaDDL: Option[String],
      statsCols: Option[Seq[String]], txn: Option[Txn] = None,
      partitionCols: Option[Seq[String]] = None,
      cdcDir: Option[String] = None,
      constraintsAdd: Option[Map[String, String]] = None,
      constraintsDrop: Option[Seq[String]] = None,
      minReader: Option[Int] = None,
      ts: Option[Long] = None,
      columnMap: Option[Map[String, String]] = None,
      retiredPhys: Option[Seq[String]] = None,
      meta: Option[Map[String, String]] = None,
      addsRef: Option[String] = None)

  /** The reader-protocol version THIS engine folds correctly. A commit
    * whose feature an older reader would silently MISINTERPRET (not
    * merely ignore) stamps `minReader`; folding any commit stamped
    * above this constant fails LOUDLY instead of producing wrong reads
    * — the forward-compatibility contract every open table format
    * carries, and the difference between "upgrade the engine" and a
    * silent wrong answer. History: 1 = the round-11 base format (json4s
    * ignores unknown JSON fields, so every ADDITIVE evolution — txns,
    * cdcDir, constraints, stats nulls — stayed at 1); 2 = shallow-clone
    * external file references (a v1 reader would resolve an absolute
    * manifest path against the table root and read nothing); 3 =
    * scheme-qualified external references (a v2 reader keys externality
    * on a leading '/' and would resolve `file:/...` against the table
    * root) and column mapping (a v2 reader would read a renamed
    * column's files under the new LOGICAL name and surface silent
    * nulls, or resurrect a dropped-then-readded column's old values);
    * 4 = NESTED column mapping (round 15 — dotted map keys bind
    * struct-internal fields; a v3 reader renames top-level only and
    * would silently null a renamed nested field inside the struct).
    * Tables whose map stays top-level keep stamping 3. 5 = commit
    * adds-SIDECARS (round 16 — a clone create's entries live in a
    * parquet sidecar; an older reader ignores the unknown field and
    * silently reads an EMPTY table). Only sidecar-committed clones
    * stamp 5. 6 = DELETION VECTORS (round 16 — an entry's `dv` names
    * rows reads must subtract; an older reader would ignore it and
    * RESURRECT deleted rows). Only dv-attaching commits stamp 6.
    */
  val ReaderVersion: Int = 6

  /** Folded view of the log at a version. `txns` holds the highest
    * stamped batch version per writer application; `partitionCols` the
    * hive-style layout columns pinned at create time (their per-file
    * CONSTANT value rides the same stats map as any zone map, so
    * partition pruning and zone-map pruning are one mechanism with
    * exact bounds).
    *
    * `commitTs` maps every folded version (as a string — JSON map
    * keys) to its audit timestamp ([[UnstampedTs]] for ts-less
    * hand-written commits, so "known unplaceable" is distinct from
    * "not folded"). It rides the CHECKPOINT, which is what bounds
    * `AS OF TIMESTAMP` resolution to one checkpoint read plus the
    * commit tail instead of O(history) per-commit JSON reads
    * ([[versionAtTimestamp]]). Size shape: ~30 bytes/commit — a
    * 10⁵-commit log adds ~3 MB to the checkpoint doc, the same
    * metadata class as the manifest itself (and unlike the manifest it
    * never needs a sidecar: it is read only by the driver-side
    * resolution). Checkpoints written before this field cover only
    * their tail — resolution falls back to per-commit reads for the
    * uncovered prefix and the gap heals at the next checkpoint.
    */
  final case class Snapshot(version: Long, files: Seq[AddFile],
      schemaDDL: String, statsCols: Seq[String],
      txns: Option[Map[String, Long]] = None,
      partitionCols: Option[Seq[String]] = None,
      constraints: Option[Map[String, String]] = None,
      minReader: Option[Int] = None,
      columnMap: Option[Map[String, String]] = None,
      retiredPhys: Option[Seq[String]] = None,
      commitTs: Option[Map[String, Long]] = None) {
    /** Physical (on-disk / manifest-stats) name of logical column `c`
      * — the protocol-3 column-mapping indirection that makes renames
      * metadata commits: data files and their stats are keyed by
      * physical names (stable from the column's first write), the
      * schema DDL speaks logical names, and every read/write/prune
      * translates through here. Absent entry = identity (the
      * pre-mapping common case). `retiredPhys` holds physical names no
      * longer bound to any logical column (drops): a re-added logical
      * name takes a FRESH physical name, or old files' values would
      * resurrect under the new column.
      */
    def physName(c: String): String =
      columnMap.getOrElse(Map.empty).getOrElse(c, c)
    /** On-disk locations of the live files. External (shallow-clone)
      * entries are already absolute/qualified and pass through
      * unchanged — the same [[TxLog.fileLocation]] rule every CowTable
      * read resolves with; naive `"$root/${f.path}"` concatenation
      * would produce malformed `root//abs/...` paths for clones.
      */
    def filePaths(root: String): Seq[String] =
      files.map(f => fileLocation(root, f.path))
    def txnVersion(app: String): Option[Long] =
      txns.getOrElse(Map.empty).get(app)
    def checkConstraints: Map[String, String] =
      constraints.getOrElse(Map.empty)
  }

  /** Is this manifest entry EXTERNAL — a shallow clone's reference to
    * another table's file? Two encodings exist: scheme-qualified URIs
    * (`file:/...`, `s3a://bucket/...` — written since protocol 3, so
    * clones keep working across filesystems) and bare absolute paths
    * (`/...` — protocol-2 clones, resolved against the entry's default
    * filesystem). Table-relative entries (`data/...`) are neither.
    */
  def isExternalPath(p: String): Boolean =
    p.startsWith("/") || hasUriScheme(p)

  private[tables] def hasUriScheme(p: String): Boolean = {
    val i = p.indexOf(':')
    i > 0 && p.substring(0, i).matches("[A-Za-z][A-Za-z0-9+.-]*") &&
      p.length > i + 1 && p.charAt(i + 1) == '/'
  }

  /** On-disk location of a manifest entry under its owning root:
    * external entries pass through unchanged (they carry their own
    * root, and for protocol-3 clones their own filesystem scheme);
    * relative entries resolve under the table root.
    */
  def fileLocation(root: String, p: String): String =
    if (isExternalPath(p)) p else s"$root/$p"

  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def logPath(table: String): Path = new Path(table, LogDir)
  private def commitPath(table: String, v: Long): Path =
    new Path(logPath(table), f"$v%020d.json")
  private def checkpointPath(table: String, v: Long): Path =
    new Path(logPath(table), f"$v%020d.checkpoint.json")

  private[graft] def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bs = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { bs.write(buf, 0, n); n = in.read(buf) }
      bs.toString("UTF-8")
    } finally in.close()
  }

  /** Latest committed version, 0 if the table doesn't exist yet. */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val dir = logPath(table)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.take(20).toLong)
      .foldLeft(0L)(math.max)
  }

  /** Does this filesystem's `rename` REPLACE an existing destination
    * (POSIX `rename(2)`) instead of failing like HDFS? Such filesystems
    * must claim a version with an atomic hard link, or two racing
    * writers both "win" and one commit silently vanishes.
    * RawLocalFileSystem counts alongside its checksum wrapper
    * LocalFileSystem: a `file://` deployment configured with
    * `fs.file.impl=org.apache.hadoop.fs.RawLocalFileSystem` falls
    * through to the very same POSIX rename (the round-12 advice item) —
    * matching only the wrapper would reopen the lost-commit race the
    * link path was added to close.
    */
  private[tables] def posixRenameSemantics(f: FileSystem): Boolean =
    f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  /** Attempt to publish `commit` as version `commit.version`. Returns
    * true iff THIS writer won the version (the CAS described in the
    * object doc). On success, also writes a checkpoint when the version
    * lands on the interval.
    *
    * The publish primitive is filesystem-specific: HDFS `rename` is
    * atomic and FAILS when the destination exists — a true CAS. POSIX
    * `rename(2)` REPLACES an existing destination, so on a local
    * filesystem two racing writers would both "win" and one commit
    * would silently vanish (caught by the concurrent-writer spec);
    * there the claim is an atomic hard LINK (`link(2)` fails EEXIST,
    * and the destination carries the full content the instant it
    * exists). Object stores need a conditional put, as the object doc
    * notes.
    */
  def tryCommit(spark: SparkSession, table: String, commit: Commit): Boolean = {
    val f = fs(spark, table)
    f.mkdirs(logPath(table))
    val dst = commitPath(table, commit.version)
    if (f.exists(dst)) return false
    val tmp = new Path(logPath(table),
      s".tmp-${java.util.UUID.randomUUID()}-${commit.version}.json")
    // wall-clock stamp for describeHistory/audit only — never read by
    // the fold, so table contents stay a pure function of the inputs
    val stamped =
      if (commit.ts.isDefined) commit
      else commit.copy(ts = Some(System.currentTimeMillis()))
    writeString(f, tmp, Serialization.write(stamped))
    val local = Option(dst.toUri.getScheme).forall(_ == "file") &&
      posixRenameSemantics(f)
    val won =
      if (local) {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false
                  case _: java.io.IOException => false }
      } else {
        try f.rename(tmp, dst) && f.exists(dst)
        catch { case _: java.io.IOException => false }
      }
    try f.delete(tmp, false) catch { case _: Exception => () }
    if (won && commit.version % CheckpointInterval == 0) {
      // Checkpoint failures are benign: readers fall back to the full
      // commit fold; the next interval retries. The publish must be
      // ATOMIC (stage + rename), NOT an in-place create: a concurrent
      // reader lists the log between create and close, sees the
      // checkpoint name, and parses a half-written file — the
      // end-of-input race the 4-writer spec caught. A POSIX
      // rename-replace is safe here (unlike the version CAS): only the
      // version's winner writes its checkpoint, and replacing it with
      // identical content would be harmless anyway.
      try {
        val planned = snapshotPlanned(spark, table, Some(commit.version))
        def sidecarDoc(slim: Snapshot, refName: String): String = {
          // json4s writes the case class; splice the ref field in
          import org.json4s.JsonDSL._
          JsonMethods.compact(JsonMethods.render(
            Extraction.decompose(slim.copy(files = Seq.empty))
              .asInstanceOf[JObject] ~ ("filesRef" -> refName)))
        }
        val refName = f"${commit.version}%020d.checkpoint.files.parquet"
        val stageDir = new Path(logPath(table),
          s".ckptp-${java.util.UUID.randomUUID()}")
        val dst = new Path(logPath(table), refName)
        val doc =
          if (!planned.isDistributed) {
            // inline world: the fold is already in hand driver-side
            val snap = backfillCommitTs(spark, table, planned.meta)
            if (snap.files.size < ParquetCheckpointThreshold)
              Serialization.write(snap)
            else {
              // first crossing of the threshold: one materialized
              // sidecar write; every later checkpoint ROLLS (below)
              writeFilesParquet(spark, stageDir.toString, snap.files)
              if (!f.rename(stageDir, dst)) f.delete(stageDir, true)
              sidecarDoc(snap, refName)
            }
          } else {
            // sidecar → sidecar ROLL (round 16): the new checkpoint's
            // entries are the live algebra `old ∖ removedEver ∪
            // tailLive` evaluated as a JOB (ManifestPlan.filesDf) and
            // written straight to the new sidecar — the periodic
            // every-interval driver materialization the old
            // `snapshot()` here paid on big tables is gone. Staged +
            // renamed before the JSON references it, as always. A
            // mass delete can shrink the table back under the
            // threshold — the row count (parquet footers, no second
            // scan) decides, and a small survivor set inlines again.
            ManifestPlan.filesDf(spark, table, planned)
              .coalesce(4).write.mode("overwrite")
              .parquet(stageDir.toString)
            val n = spark.read.schema(FilesParquetSchema)
              .parquet(stageDir.toString).count()
            val slim = backfillCommitTs(spark, table, planned.meta)
            if (n < ParquetCheckpointThreshold) {
              val files = spark.read.schema(FilesParquetSchema)
                .parquet(stageDir.toString).collect()
                .map(rowToAddFile).toSeq
              f.delete(stageDir, true)
              Serialization.write(slim.copy(files = files))
            } else {
              if (!f.rename(stageDir, dst)) f.delete(stageDir, true)
              sidecarDoc(slim, refName)
            }
          }
        val stage = new Path(logPath(table),
          s".ckpt-${java.util.UUID.randomUUID()}-${commit.version}.tmp")
        writeString(f, stage, doc)
        if (!f.rename(stage, checkpointPath(table, commit.version)))
          f.delete(stage, false)
        ()
      } catch { case _: Exception => () }
    }
    won
  }

  /** The fold of [[snapshotPlanned]] with the checkpoint sidecar's
    * base entries left UNMATERIALIZED: table-level state folds as
    * always (`meta.files` is EMPTY when `sidecarRef` is set), and the
    * live-file set is expressed as
    * `sidecar ∖ removedEver ∪ tailLive` — the algebra
    * [[graft.tables.ManifestPlan]] evaluates as a DataFrame plan, so
    * manifest pruning on a 10⁶⁺-file table collects ONLY the
    * surviving entries onto the driver. `tailLive` is the ordered
    * fold of the post-checkpoint commits' adds/removes (bounded by
    * [[CheckpointInterval]] commits); `removedEver` every path those
    * commits removed (a base path removed and restored in the tail
    * re-enters through `tailLive`, so the set-minus stays exact).
    */
  final case class PlannedSnapshot(meta: Snapshot,
      sidecarRef: Option[String], tailLive: Seq[AddFile],
      removedEver: Set[String],
      refIsCommitTruth: Boolean = false) {
    /** False → `meta.files` is the complete live set (inline
      * checkpoint or no checkpoint) and driver-side pruning is the
      * cheaper path (no job launch).
      */
    def isDistributed: Boolean = sidecarRef.isDefined
    /** True → `sidecarRef` points at a COMMIT adds-sidecar (a clone
      * create below any checkpoint): it is part of the log's truth,
      * so an unreadable ref is CORRUPTION (rethrow), never a
      * degrade-to-the-fold (there is no fold without it).
      */
    def commitTruthRef: Boolean = refIsCommitTruth
  }

  /** Fold the log into the live-file set at `asOf` (default: latest).
    * Starts from the newest checkpoint ≤ asOf when one exists. For a
    * sidecar-backed checkpoint this MATERIALIZES every manifest entry
    * on the driver — pruning paths use [[snapshotPlanned]] +
    * [[graft.tables.ManifestPlan]], full reads the manifest-backed
    * FileIndex, maintenance listings the lean path forms, and
    * checkpoints ROLL sidecar-to-sidecar (round 16) — the remaining
    * materializing consumers are clone COMMITS (which publish every
    * entry by design) and explicit audits.
    */
  def snapshot(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Snapshot =
    materialize(spark, table, asOf,
      snapshotPlanned(spark, table, asOf), retryFold = true)

  /** The degrade fallback's materialization: the full commit fold,
    * IGNORING the (just-failed) checkpoint but honoring a commit
    * adds-sidecar (it is the truth — its failure here is loud). The
    * degrade paths call this instead of [[snapshot]] so a torn
    * checkpoint sidecar is never doomed-re-read a second time.
    */
  private[tables] def snapshotNoCheckpoint(spark: SparkSession,
      table: String, v: Long): Snapshot =
    materialize(spark, table, Some(v),
      snapshotPlanned(spark, table, Some(v), useCheckpoint = false),
      retryFold = false)

  private def materialize(spark: SparkSession, table: String,
      asOf: Option[Long], p: PlannedSnapshot,
      retryFold: Boolean): Snapshot =
    p.sidecarRef match {
      case None => p.meta
      case Some(ref) =>
        try {
          val base = readFilesParquet(spark,
            new Path(logPath(table), ref).toString)
          p.meta.copy(files =
            base.filter(a => !p.removedEver.contains(a.path)) ++ p.tailLive)
        } catch { case scala.util.control.NonFatal(e) =>
          // a CHECKPOINT sidecar is an optimization — degrade to the
          // full commit fold; a COMMIT adds-sidecar is the truth (the
          // fold has nothing without it) — unreadable is corruption,
          // rethrow. The re-fold may itself carry a commit-truth ref
          // (a clone create below the torn checkpoint) — one retry,
          // then its failure is equally loud.
          if (p.commitTruthRef || !retryFold) throw e
          materialize(spark, table, asOf,
            snapshotPlanned(spark, table, asOf, useCheckpoint = false),
            retryFold = false)
        }
    }

  /** [[snapshot]]'s fold WITHOUT materializing a sidecar-backed
    * checkpoint's entries (see [[PlannedSnapshot]]).
    * `useCheckpoint = false` forces the full commit fold (the
    * torn-checkpoint degrade path).
    */
  def snapshotPlanned(spark: SparkSession, table: String,
      asOf: Option[Long] = None,
      useCheckpoint: Boolean = true): PlannedSnapshot = {
    val f = fs(spark, table)
    val dir = logPath(table)
    require(f.exists(dir), s"not a CowTable (no ${LogDir}): $table")
    val names = f.listStatus(dir).map(_.getPath.getName)
    val target = asOf.getOrElse(
      names.filter(_.matches("\\d{20}\\.json"))
        .map(_.take(20).toLong).foldLeft(0L)(math.max))
    require(target > 0, s"empty log at $table")

    val ckptV0 =
      if (!useCheckpoint) 0L
      else names.filter(_.matches("\\d{20}\\.checkpoint\\.json"))
        .map(_.take(20).toLong).filter(_ <= target)
        .foldLeft(0L)(math.max)
    // A torn/unreadable checkpoint (pre-atomic-publish logs, or a
    // mid-write crash) must degrade to the FULL commit fold, never
    // fail the read: the checkpoint is an optimization, the commits
    // are the truth.
    val (base: Snapshot, ckptV: Long, sidecarRef: Option[String]) =
      if (ckptV0 == 0) (Snapshot(0L, Seq.empty, "", Seq.empty), 0L, None)
      else try {
        val jv = JsonMethods.parse(readString(f, checkpointPath(table, ckptV0)))
        val snap0 = jv.extract[Snapshot]
        (jv \ "filesRef") match {
          case JString(ref) =>
            // parquet-sidecar form: the entries stay ON DISK — a
            // dangling/torn sidecar surfaces at evaluation time and
            // ManifestPlan degrades to the full commit fold there
            (snap0, ckptV0, Some(ref))
          case _ => (snap0, ckptV0, None)
        }
      }
      catch { case scala.util.control.NonFatal(_) =>
        (Snapshot(0L, Seq.empty, "", Seq.empty), 0L, None) }

    // Protocol gate: the checkpoint records the max requirement folded
    // into it, so a fold that starts there still sees pre-checkpoint
    // feature commits.
    var minReader = base.minReader.getOrElse(1)
    def requireReadable(m: Int, where: String): Unit =
      require(m <= ReaderVersion,
        s"$table requires reader protocol $m ($where) but this engine " +
          s"supports $ReaderVersion — upgrade the engine (or time-travel " +
          "below the feature commit)")
    requireReadable(minReader, s"checkpoint v$ckptV")
    val files = scala.collection.mutable.LinkedHashMap(
      base.files.map(a => a.path -> a): _*)
    val txns = scala.collection.mutable.Map[String, Long](
      base.txns.getOrElse(Map.empty).toSeq: _*)
    val commitTs = scala.collection.mutable.Map[String, Long](
      base.commitTs.getOrElse(Map.empty).toSeq: _*)
    val constraints = scala.collection.mutable.LinkedHashMap[String, String](
      base.constraints.getOrElse(Map.empty).toSeq: _*)
    var schemaDDL = base.schemaDDL
    var statsCols = base.statsCols
    var partitionCols = base.partitionCols
    var columnMap = base.columnMap
    var retiredPhys = base.retiredPhys
    val listed = names.filter(_.matches("\\d{20}\\.json"))
      .map(_.take(20).toLong).toSet
    val removedEver = scala.collection.mutable.Set[String]()
    // a fold starting BELOW any checkpoint may pick up a commit
    // adds-sidecar as its base frame (clone creates, protocol 5)
    var baseRef: Option[String] = sidecarRef
    var refTruth = false
    var v = ckptV + 1
    while (v <= target) {
      val p = commitPath(table, v)
      // the directory listing is already in hand — an exists() RPC per
      // commit would tax every fold with O(tail) namenode round-trips;
      // fall back to one exists only for versions the listing predates
      // (an explicit asOf above the listed max)
      require(listed.contains(v) || f.exists(p),
        s"log has a hole at version $v: $table")
      val c = JsonMethods.parse(readString(f, p)).extract[Commit]
      c.minReader.foreach { m =>
        requireReadable(m, s"commit v$v, op '${c.op}'")
        minReader = math.max(minReader, m)
      }
      c.schemaDDL.foreach(schemaDDL = _)
      c.statsCols.foreach(statsCols = _)
      c.partitionCols.foreach(pc => partitionCols = Some(pc))
      // full-replacement semantics (a commit stamps the WHOLE map/list)
      c.columnMap.foreach(m => columnMap = Some(m))
      c.retiredPhys.foreach(r => retiredPhys = Some(r))
      c.txn.foreach(t => txns.update(t.app,
        math.max(t.version, txns.getOrElse(t.app, Long.MinValue))))
      commitTs.update(v.toString, c.ts.getOrElse(UnstampedTs))
      c.constraintsAdd.foreach(_.foreach { case (k, e) =>
        constraints.update(k, e) })
      c.constraintsDrop.foreach(_.foreach(constraints.remove))
      c.addsRef.foreach { ref =>
        require(v == 1,
          s"commit adds-sidecar at version $v of $table — the format " +
            "is constrained to CREATE commits (a mid-log ref-add " +
            "could resurrect a removed path past the lazy set-minus)")
        // ckptV == 0 here by construction (v == 1 ⇒ the loop started
        // below any checkpoint)
        baseRef = Some(ref); refTruth = true
      }
      c.removes.foreach { r => files.remove(r); removedEver += r }
      c.adds.foreach(a => files.update(a.path, a))
      v += 1
    }
    val folded = files.values.toSeq
    val meta = Snapshot(target,
      if (baseRef.isDefined) Seq.empty else folded,
      schemaDDL, statsCols,
      if (txns.isEmpty) None else Some(txns.toMap), partitionCols,
      if (constraints.isEmpty) None else Some(constraints.toMap),
      if (minReader <= 1) None else Some(minReader),
      columnMap.filter(_.nonEmpty), retiredPhys.filter(_.nonEmpty),
      if (commitTs.isEmpty) None else Some(commitTs.toMap))
    PlannedSnapshot(meta, baseRef,
      if (baseRef.isDefined) folded else Seq.empty,
      if (baseRef.isDefined) removedEver.toSet else Set.empty,
      refIsCommitTruth = refTruth)
  }

  /** Sentinel for "this commit exists but carries no audit timestamp"
    * in [[Snapshot.commitTs]] — hand-written logs; never qualifies in
    * timestamp resolution, and never triggers the legacy per-commit
    * fallback read.
    */
  private[tables] val UnstampedTs: Long = Long.MinValue

  /** Back-fill the ts map for versions a PRE-UPGRADE checkpoint never
    * folded — run once at CHECKPOINT-WRITE time (never in the per-op
    * fold), so the doc'd "heals at the next checkpoint" is literally
    * true: one O(gap) pass of commit reads, then every later
    * checkpoint carries the full map. A commit file already pruned by
    * external cleanup back-fills as [[UnstampedTs]] (unplaceable —
    * conservative, and resolution stops paying a doomed read for it).
    */
  private def backfillCommitTs(spark: SparkSession, table: String,
      snap: Snapshot): Snapshot = {
    val m = snap.commitTs.getOrElse(Map.empty)
    val missing = (1L to snap.version).filter(v => !m.contains(v.toString))
    if (missing.isEmpty) snap
    else snap.copy(commitTs = Some(m ++ missing.map { v =>
      v.toString -> (try commitAt(spark, table, v).ts.getOrElse(UnstampedTs)
      catch { case scala.util.control.NonFatal(_) => UnstampedTs })
    }))
  }

  private[graft] val FilesParquetSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, rows BIGINT, " +
        "stats MAP<STRING, STRUCT<kind: STRING, min: STRING, max: STRING, " +
        "nulls: BOOLEAN>>, bytes BIGINT, dv STRING")

  private[graft] def manifestRows(
      files: Seq[AddFile]): Seq[org.apache.spark.sql.Row] =
    files.map(a => org.apache.spark.sql.Row(a.path, a.rows,
      a.stats.map { case (c, s) =>
        c -> org.apache.spark.sql.Row(s.kind, s.min, s.max, s.nulls.orNull)
      }, a.bytes.map(Long.box).orNull, a.dv.orNull))

  /** Decode one (path, rows, stats, bytes, dv) manifest row — the
    * inverse of [[manifestRows]], shared by the sidecar reader and
    * [[graft.tables.ManifestPlan]]'s survivor collection. `bytes`/`dv`
    * are null for entries written before they existed (parquet fills
    * the missing columns).
    */
  private[graft] def rowToAddFile(r: org.apache.spark.sql.Row): AddFile = {
    val stats = r.getMap[String, org.apache.spark.sql.Row](2)
    AddFile(r.getString(0), r.getLong(1),
      stats.map { case (c, s) =>
        c -> ColStats(s.getString(0), s.getString(1), s.getString(2),
          if (s.isNullAt(3)) None else Some(s.getBoolean(3)))
      }.toMap,
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getString(4)))
  }

  /** On-disk location of a checkpoint's parquet sidecar. */
  private[tables] def sidecarLocation(table: String, ref: String): String =
    new Path(logPath(table), ref).toString

  /** Stage and publish a COMMIT adds-sidecar for version `v` from a
    * manifest frame ([[FilesParquetSchema]]); returns the ref name the
    * commit stamps into [[Commit.addsRef]]. The name carries a UUID so
    * two clones RACING for the same version never reference each
    * other's content — the loser's published-but-unreferenced sidecar
    * is a bounded metadata orphan (one per failed create attempt),
    * documented rather than swept (a sweepable name pattern would put
    * the WINNER's referenced sidecar in the same reaper's path).
    */
  private[tables] def writeCommitAddsSidecar(spark: SparkSession,
      table: String, v: Long, entries: DataFrame): String = {
    val f = fs(spark, table)
    f.mkdirs(logPath(table))
    val refName =
      f"$v%020d.commit.files-${java.util.UUID.randomUUID()}.parquet"
    val stage = new Path(logPath(table),
      s".ckptp-${java.util.UUID.randomUUID()}")
    entries.coalesce(4).write.mode("overwrite").parquet(stage.toString)
    val dst = new Path(logPath(table), refName)
    require(f.rename(stage, dst),
      s"failed to publish commit adds-sidecar $dst")
    refName
  }

  private def writeFilesParquet(spark: SparkSession, dir: String,
      files: Seq[AddFile]): Unit =
    spark.createDataFrame(
        spark.sparkContext.parallelize(manifestRows(files), 1),
        FilesParquetSchema)
      .write.mode("overwrite").parquet(dir)

  private def readFilesParquet(spark: SparkSession,
      dir: String): Seq[AddFile] =
    spark.read.schema(FilesParquetSchema).parquet(dir).collect()
      .map(rowToAddFile).toSeq

  /** The live manifest at `asOf` as a DATAFRAME — (path, rows, stats)
    * with the zone maps as a map column — for distributed manifest
    * consumers (file-level audits, reconciliation joins, maintenance
    * analytics over millions of entries) that should never funnel
    * through a driver-side Seq. Sidecar-backed checkpoints plan
    * straight off the parquet sidecar ([[ManifestPlan.filesDf]] — the
    * base entries never touch the driver); inline manifests
    * parallelize the folded Seq.
    */
  def filesAsDf(spark: SparkSession, table: String,
      asOf: Option[Long] = None): DataFrame =
    ManifestPlan.filesDf(spark, table,
      snapshotPlanned(spark, table, asOf))

  /** Raw commit `v` (for audits / change inspection). A protocol-5
    * commit's adds live in its sidecar — consumers that need the ADD
    * SET use [[commitAdds]]/[[commitAddPaths]], never `c.adds` alone.
    */
  def commitAt(spark: SparkSession, table: String, v: Long): Commit = {
    val f = fs(spark, table)
    JsonMethods.parse(readString(f, commitPath(table, v))).extract[Commit]
  }

  /** The commit's FULL add set — inline adds, or the adds-sidecar
    * materialized (data-proportional: the consumers are change feeds
    * and audits that ship those files' contents anyway). The sidecar
    * is commit truth: unreadable is loud.
    */
  private[graft] def commitAdds(spark: SparkSession, table: String,
      c: Commit): Seq[AddFile] =
    c.addsRef.fold(c.adds)(ref =>
      readFilesParquet(spark, sidecarLocation(table, ref)))

  /** [[commitAdds]]'s lean PATH-only form (provenance's name map). */
  private[graft] def commitAddPaths(spark: SparkSession, table: String,
      c: Commit): Seq[String] =
    c.addsRef.fold(c.adds.map(_.path))(ref =>
      spark.read.schema(FilesParquetSchema)
        .parquet(sidecarLocation(table, ref))
        .select("path").collect().map(_.getString(0)).toSeq)

  /** Does commit `c` add data files at all (inline or by sidecar)? */
  private[graft] def commitHasAdds(c: Commit): Boolean =
    c.adds.nonEmpty || c.addsRef.isDefined

  /** The change feed's timestamp start: the SMALLEST version whose
    * commit timestamp is ≥ `tsMillis` (a feed "from last Tuesday"
    * starts at the first commit of Tuesday). `latest + 1` when every
    * commit predates the timestamp — the feed then ships only future
    * commits, which is exactly what a from-now subscription wants.
    * Same full-scan caveat as [[versionAtTimestamp]] (audit stamps,
    * not guaranteed monotone under clock skew).
    */
  def firstVersionAtOrAfter(spark: SparkSession, table: String,
      tsMillis: Long): Long = {
    val latest = latestVersion(spark, table)
    require(latest >= 1, s"empty log at $table")
    val at = commitTsResolver(spark, table)
    (1L to latest).foldLeft(latest + 1) { (best, v) =>
      if (at(v).exists(_ >= tsMillis)) math.min(best, v) else best
    }
  }

  /** Per-version commit-timestamp lookup backed by the CHECKPOINT's
    * `commitTs` map (one snapshot fold = one checkpoint read + the
    * commit tail), with a per-commit JSON read ONLY for versions a
    * pre-upgrade checkpoint never folded — the bound that makes
    * `AS OF TIMESTAMP` / `startingTimestamp` resolution a
    * table-open-scale operation on a 10⁵-commit log instead of
    * O(history) driver RPCs (ADVICE r14). The scan over versions
    * stays FULL and in-memory: audit stamps are not guaranteed
    * monotone under clock skew, so no binary search (the documented
    * [[versionAtTimestamp]] contract).
    */
  private def commitTsResolver(spark: SparkSession,
      table: String): Long => Option[Long] = {
    // snapshotPlanned, NOT snapshot: the ts map is table-level state
    // that folds without touching the sidecar — a materializing
    // snapshot() here would collect a 10⁶-entry manifest to answer a
    // metadata question (review r15)
    val m = snapshotPlanned(spark, table).meta.commitTs
      .getOrElse(Map.empty)
    (v: Long) =>
      m.get(v.toString) match {
        case Some(UnstampedTs) => None
        case Some(t)           => Some(t)
        case None              => commitAt(spark, table, v).ts
      }
  }

  /** TIMESTAMP time travel resolution: the latest version whose commit
    * timestamp is ≤ `tsMillis` — `AS OF TIMESTAMP` resolved against
    * the audit stamps [[tryCommit]] records. The stamps are wall-clock
    * (the documented audit-only contract: table contents stay a pure
    * function of the inputs — the RESOLUTION is explicit user input,
    * so determinism is unaffected), and commit times are monotone in
    * practice but not guaranteed under clock skew, so resolution scans
    * all commits IN MEMORY and takes the max qualifying version rather
    * than binary-searching a possibly-non-monotone sequence. I/O is
    * bounded by [[commitTsResolver]] (one checkpoint read + the commit
    * tail — not O(history) per-commit reads). Fails loudly
    * when `tsMillis` predates the first commit — "before the table
    * existed" has no version to answer with.
    */
  def versionAtTimestamp(spark: SparkSession, table: String,
      tsMillis: Long): Long = {
    val latest = latestVersion(spark, table)
    require(latest >= 1, s"empty log at $table")
    // ts-less commits (hand-written logs) are UNPLACEABLE in time and
    // never qualify — the same convention as [[firstVersionAtOrAfter]]
    // (exists on both sides); treating them as always-qualifying
    // would resolve an instant to a version far after it
    val at = commitTsResolver(spark, table)
    val v = (1L to latest).foldLeft(0L) { (best, v) =>
      if (at(v).exists(_ <= tsMillis)) math.max(best, v) else best
    }
    require(v >= 1,
      s"timestamp $tsMillis predates the first (time-stamped) commit " +
        s"of $table (earliest: " +
        s"${commitAt(spark, table, 1L).ts.getOrElse("unstamped")})")
    v
  }

  /** DESCRIBE DETAIL: the one-row table summary an operator reads
    * first — current version, live file/row counts, layout and
    * governance surface (partition columns, stats columns, named
    * constraints). Pure manifest fold, zero executor work.
    */
  def describeDetail(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val p = snapshotPlanned(spark, table)
    val s = p.meta
    // file/row totals aggregate over the planned frame on sidecar-
    // backed tables (round 16) — a one-row answer never decodes the
    // manifest onto the driver
    val (numFiles, numRows) =
      if (!p.isDistributed) (s.files.size.toLong, s.files.map(_.rows).sum)
      else try {
        val r = ManifestPlan.filesDf(spark, table, p)
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum("rows"),
              org.apache.spark.sql.functions.lit(0L)))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      } catch { case scala.util.control.NonFatal(e)
          if ManifestPlan.sidecarDegrade(e) && !p.commitTruthRef =>
        ManifestPlan.logDegrade(table, s.version, e)
        val files = snapshotNoCheckpoint(spark, table, s.version).files
        (files.size.toLong, files.map(_.rows).sum)
      }
    // stats/partition columns are stored PHYSICAL; surface the logical
    // names a user knows (reverse column map; an unmapped physical —
    // e.g. a dropped stats column's — shows as itself)
    // top-level bindings only: nested (dotted) entries share leaf
    // names with unrelated columns and would collide in the swap
    val rev = s.columnMap.getOrElse(Map.empty)
      .filterNot(_._1.contains(".")).map(_.swap)
    def logicalOf(ph: String) = rev.getOrElse(ph, ph)
    Seq((s.version, numFiles, numRows,
      s.statsCols.map(logicalOf).mkString(","),
      s.partitionCols.getOrElse(Seq.empty).map(logicalOf).mkString(","),
      s.checkConstraints.keys.toSeq.sorted.mkString(",")))
      .toDF("version", "num_files", "num_rows", "stats_cols",
        "partition_cols", "constraints")
  }

  /** DESCRIBE HISTORY: one row per commit — version, operation, files
    * and rows added/removed, idempotence stamp — the audit frame a
    * governance review reads before trusting a table. Driver-side over
    * the log (metadata-sized by construction), and PAGEABLE (round 16,
    * verdict #5): `fromVersion`/`toVersion` bound the range and
    * `limit` keeps the NEWEST n commits of it — only the requested
    * page's commit files are read, so "the last 50 commits of a
    * 100k-commit log" is 50 reads, not a minutes-long O(history) walk.
    * Defaults preserve the full-history behavior. Versions outside the
    * log clamp; commit files already reaped by external cleanup would
    * fail loudly, like any explicit read of a missing version.
    */
  def describeHistory(spark: SparkSession, table: String,
      fromVersion: Option[Long] = None, toVersion: Option[Long] = None,
      limit: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(spark, table)
    val hi = math.min(toVersion.getOrElse(latest), latest)
    val lo0 = math.max(fromVersion.getOrElse(1L), 1L)
    val lo = limit.fold(lo0)(n => math.max(lo0, hi - n + 1))
    (lo to hi).map { v =>
      val c = commitAt(spark, table, v)
      // sidecar-committed adds (protocol-5 clones) count via ONE
      // aggregate over the sidecar — the audit must not read a
      // million-file fork as an empty create
      val (nAdds, nRows) = c.addsRef match {
        case None => (c.adds.size.toLong, c.adds.map(_.rows).sum)
        case Some(ref) =>
          val r = spark.read.schema(FilesParquetSchema)
            .parquet(sidecarLocation(table, ref))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.sum("rows"),
                org.apache.spark.sql.functions.lit(0L)))
            .collect()(0)
          (r.getLong(0), r.getLong(1))
      }
      (c.version, c.op,
        c.ts.map(t => new java.sql.Timestamp(t)).orNull,
        nAdds, nRows,
        c.removes.size.toLong, c.txn.map(t => s"${t.app}@${t.version}"))
    }.toDF("version", "op", "timestamp", "files_added", "rows_added",
      "files_removed", "txn")
  }
}
