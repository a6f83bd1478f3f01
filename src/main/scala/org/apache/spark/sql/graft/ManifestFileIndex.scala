package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, GenericInternalRow, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory, PartitioningUtils}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A manifest-backed [[FileIndex]] — the round-16 close of the last
  * 100 TB driver ceiling: FULL table scans hand Spark their file
  * listing as lean `(path, length, partition values)` entries instead
  * of first materializing every manifest `AddFile` (stats maps and
  * all) on the driver. The listing itself comes from ONE distributed
  * pass over the checkpoint's parquet sidecar (the provider thunk —
  * built by `graft.tables.CowTable`, which owns the log access), so
  * the driver holds exactly what Spark's own scan planning holds for
  * ANY file source (an `InMemoryFileIndex` stores the same statuses) —
  * that is the floor: `FileSourceScanExec` plans splits driver-side by
  * design, and DSv2's `planInputPartitions` is equally driver-side.
  *
  * Partition handling: hive `col=value` fragments are parsed from each
  * entry's path HERE (one pass per listing, Spark's own
  * `PartitioningUtils` escaping/casting rules), and the values ride
  * the `PartitionDirectory` — the scan never infers partitions from
  * directories, so entries under different data roots (shallow-clone
  * external references, deep-clone layouts) coexist in one relation
  * without the per-root basePath grouping the explicit-list read path
  * needs. `listFiles` evaluates the pushed partition filters against
  * those values (the `PartitioningAwareFileIndex` discipline), so
  * partition-pruned reads through SQL prune before any footer opens;
  * data filters are left to parquet row-group pruning, as the built-in
  * indexes do.
  *
  * File lengths come from the manifest's `bytes` (recorded at write
  * time); the provider back-fills pre-upgrade entries with one
  * distributed stat pass — never an O(files) driver RPC storm.
  */
final class ManifestFileIndex(
    root: Path,
    physPartitionSchema: StructType,
    provider: () => Seq[ManifestFileIndex.Entry],
    prunedProvider: Seq[Expression] => Option[Seq[ManifestFileIndex.Entry]]
      = _ => None) extends FileIndex {
  import ManifestFileIndex.Entry

  /** One lean entry per live file. Lazy: computed at first planning
    * use, refreshed on [[refresh]].
    */
  @volatile private var cached: Seq[Entry] = null
  private def listing: Seq[Entry] = {
    if (cached == null) cached = provider()
    cached
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = { cached = null }

  override def partitionSchema: StructType = physPartitionSchema

  override def sizeInBytes: Long = listing.map(_.bytes).sum

  override def inputFiles: Array[String] = listing.map(_.location).toArray

  /** Hive `k=v` fragments of an entry's RAW manifest path (the
    * segments between the last `/data/` and the file name), unescaped
    * per Spark's rules — EXACTLY ONCE, by `parsePathFragment`. The raw
    * path carries hive escaping only (writeFiles lays it out with
    * Spark's own escapePathName), so going through a URI decode here
    * would both crash on legal raw characters (a space in a partition
    * value) and double-decode `%`-escapes into corrupted values.
    */
  private def fragmentsOf(rawPath: String): Map[String, String] = {
    val i = rawPath.lastIndexOf("/data/")
    val dir = (if (i >= 0) rawPath.substring(i + "/data/".length)
      else rawPath)
      .split('/').dropRight(1).filter(_.contains('=')).mkString("/")
    if (dir.isEmpty) Map.empty
    else PartitioningUtils.parsePathFragment(dir)
  }

  private val BlockSize = 128L * 1024 * 1024

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    def status(e: Entry): FileStatus =
      new FileStatus(e.bytes, false, 0, BlockSize, 0L,
        new Path(e.location))
    // pushed DATA filters prune by zone map when the provider
    // recognizes their conjunct ranges (round 16 — the SQL path gets
    // the same manifest-level pushdown the explicit readWhere API
    // has); unrecognized filters fall back to the full listing, and
    // the pruned listing is per-call (never poisons the cache)
    val entries =
      if (dataFilters.isEmpty) listing
      else prunedProvider(dataFilters).getOrElse(listing)
    val dirs: Seq[PartitionDirectory] =
      if (physPartitionSchema.isEmpty)
        Seq(PartitionDirectory(InternalRow.empty,
          entries.map(status).toArray))
      else {
        val zone = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        entries.groupBy(e => fragmentsOf(e.rawPath))
          .toSeq
          .map { case (frags, files) =>
            val values = new GenericInternalRow(
              physPartitionSchema.fields.map { f =>
                frags.get(f.name)
                  .map(v => PartitioningUtils.castPartValueToDesiredType(
                    f.dataType, v, zone))
                  .orNull
              }.asInstanceOf[Array[Any]])
            PartitionDirectory(values, files.map(status).toArray)
          }
      }
    if (partitionFilters.isEmpty || physPartitionSchema.isEmpty) dirs
    else {
      // bind the pushed filters to the partition-values row layout by
      // NAME (the PartitioningAwareFileIndex.prunePartitions rule)
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = physPartitionSchema.fieldNames.indexOf(a.name)
            if (i < 0) a
            else BoundReference(i, physPartitionSchema(i).dataType,
              nullable = true)
        })
      dirs.filter(d => bound.eval(d.values))
    }
  }
}

object ManifestFileIndex {
  /** One lean listing entry: the resolved on-disk location (Hadoop
    * Path string form — raw characters, NOT URI-encoded), the RAW
    * manifest path the hive fragments parse from, and the byte length.
    */
  final case class Entry(location: String, rawPath: String, bytes: Long)
}

/** Builds the physical-schema DataFrame over a [[ManifestFileIndex]]
  * — `HadoopFsRelation` + `LogicalRelation` are `execution` internals,
  * hence this bridge. Output columns: `dataSchema` fields then the
  * partition fields (the HadoopFsRelation layout; the caller reorders
  * and conforms to logical names).
  */
object ManifestRelation {
  def frame(spark: org.apache.spark.sql.SparkSession,
      index: ManifestFileIndex, physDataSchema: StructType,
      physPartitionSchema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = HadoopFsRelation(index, physPartitionSchema,
      physDataSchema, None, new ParquetFileFormat, Map.empty)(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs, LogicalRelation(rel))
  }
}
