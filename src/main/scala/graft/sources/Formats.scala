package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink coverage beyond the harness parquet: header CSV (the
  * reference's only input format — reference tests/test_find_datacol_diff.py:20-22
  * read header CSV with no inferSchema), JSON lines, and ORC.
  *
  * Two rules a 100 TB pipeline cares about:
  *   - always pass an explicit schema on text formats (CSV/JSON):
  *     schema inference is a FULL extra pass over the data before the
  *     real job starts;
  *   - prefer columnar (parquet/ORC) for anything read more than once —
  *     text formats can't push filters or prune columns.
  */
object Formats {

  /** Header CSV, all-string columns — the reference's exact input model. */
  def readCsvAllString(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Header CSV with an explicit schema (no inference pass). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** JSON lines with an explicit schema (no inference pass). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Hive-style partitioned parquet layout (`path/col=value/...`) — the
    * 100 TB table organization: a filter on a partition column becomes
    * PARTITION PRUNING (whole directories skipped at planning time,
    * before any file is opened), not a row filter. Choose partition
    * columns with bounded cardinality (source, date, language — never a
    * key) so file counts stay sane.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
