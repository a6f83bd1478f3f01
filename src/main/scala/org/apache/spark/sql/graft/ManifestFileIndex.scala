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
    provider: () => Seq[(String, Long)]) extends FileIndex {

  /** One lean entry per live file. Lazy: computed at first planning
    * use, refreshed on [[refresh]].
    */
  @volatile private var cached: Seq[(String, Long)] = null
  private def listing: Seq[(String, Long)] = {
    if (cached == null) cached = provider()
    cached
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = { cached = null }

  override def partitionSchema: StructType = physPartitionSchema

  override def sizeInBytes: Long = listing.map(_._2).sum

  override def inputFiles: Array[String] = listing.map(_._1).toArray

  /** Hive `k=v` fragments of an entry's path (the segments between the
    * last `/data/` and the file name), unescaped per Spark's rules.
    */
  private def fragmentsOf(location: String): Map[String, String] = {
    val p = new java.net.URI(location).getPath
    val i = p.lastIndexOf("/data/")
    val dir = (if (i >= 0) p.substring(i + "/data/".length) else p)
      .split('/').dropRight(1).mkString("/")
    if (dir.isEmpty) Map.empty
    else PartitioningUtils.parsePathFragment(dir)
  }

  private val BlockSize = 128L * 1024 * 1024

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    def status(loc: String, len: Long): FileStatus =
      new FileStatus(len, false, 0, BlockSize, 0L, new Path(loc))
    val dirs: Seq[PartitionDirectory] =
      if (physPartitionSchema.isEmpty)
        Seq(PartitionDirectory(InternalRow.empty,
          listing.map { case (loc, len) => status(loc, len) }.toArray))
      else {
        val zone = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        listing.groupBy { case (loc, _) => fragmentsOf(loc) }
          .toSeq
          .map { case (frags, files) =>
            val values = new GenericInternalRow(
              physPartitionSchema.fields.map { f =>
                frags.get(f.name)
                  .map(v => PartitioningUtils.castPartValueToDesiredType(
                    f.dataType, v, zone))
                  .orNull
              }.asInstanceOf[Array[Any]])
            PartitionDirectory(values,
              files.map { case (loc, len) => status(loc, len) }.toArray)
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
