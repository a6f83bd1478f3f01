package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for co-located joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key pins rows to hash buckets AT WRITE TIME, so every later
  * join on that key runs with ZERO shuffle — at 100 TB the difference
  * between a nightly-pipeline join that moves nothing and one that
  * re-exchanges the fact table every run. The write itself pays one
  * shuffle, amortized over every subsequent read.
  *
  * Uses the session catalog (`saveAsTable` — bucketing metadata lives
  * in the catalog, not the parquet files; a plain `.parquet(path)`
  * write cannot record buckets).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Append to an existing bucketed table under the SAME bucket spec
    * (Spark validates the spec against the catalog's): each append
    * adds per-bucket files, so the zero-shuffle join property holds
    * for the grown table — the incremental-maintenance write path of
    * a standing index ([[graft.dedup.IncrementalDedup.appendToIndex]]).
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("append")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts the planner aligns buckets 1:1 and the plan contains
    * no Exchange above either scan (assert it — see BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, key)
  }
}
