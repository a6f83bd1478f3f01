package graft.tables

import graft.operators.AggMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A standing aggregate table MAINTAINED IN a [[CowTable]] — the
  * storage-backed form of [[graft.operators.AggMerge]]'s daily-ingest
  * fold. Each batch:
  *
  *   1. aggregates map-side to one state row per touched key
  *      ([[AggMerge.aggregate]] — the only pass over the raw rows);
  *   2. reads the CURRENT state of just the touched keys — a
  *      [[CowTable.readOverlapping]] manifest-pruned scan on the batch
  *      key bounds, then a semi-join cut to exactly the touched keys;
  *   3. combines old ∪ new state with the PROVEN field combiners
  *      ([[AggMerge.merge]]: counts/decimal sums add, mins/maxes fold);
  *   4. ships the combined rows as one replace-MERGE (unique by
  *      construction — they are groupBy output), `txn`-stamped for
  *      exactly-once streaming feeds.
  *
  * History is never rescanned and untouched keys never move: per batch
  * the table does O(|touched keys|) work + one manifest fold, whatever
  * the standing table's size — with a key-clustered layout (ingest-date
  * keys cluster for free; [[CowTable.optimize]] restores clustering
  * otherwise) the pruned read covers only the files the batch's key
  * range overlaps.
  */
object AggTable {

  /** Create the standing table from the first batch of raw rows. */
  def init(spark: SparkSession, path: String, rows: DataFrame,
      keys: Seq[String], valueCol: String): Unit =
    CowTable.create(spark, path,
      AggMerge.aggregate(rows, keys, valueCol), statsCols = keys)

  /** Fold one batch of raw rows into the standing aggregates. */
  def fold(spark: SparkSession, path: String, deltaRows: DataFrame,
      keys: Seq[String], valueCol: String,
      txn: Option[TxLog.Txn] = None): CowTable.MergeMetrics = {
    val delta = AggMerge.aggregate(deltaRows, keys, valueCol).persist()
    try {
      val k0 = keys.head
      val b = delta.agg(min(col(k0)).cast("string"),
        max(col(k0)).cast("string"),
        count(when(col(k0).isNull, 1)).as("_nulls")).collect()(0)
      // A null leading key defeats range pruning twice over (its state
      // row may hide in any file's null slice), so fall back to the
      // full manifest when the batch carries one.
      val cur =
        (if (b.isNullAt(0) || b.getLong(2) > 0) CowTable.read(spark, path)
        else CowTable.readOverlapping(spark, path, k0,
          b.getString(0), b.getString(1)))
      val deltaKeys = delta.select(keys.map(col): _*)
      // null-SAFE semi join: a standing null-key state row must be
      // read and combined, not silently replaced by the delta's state
      val curTouched = cur.join(deltaKeys,
        keys.map(k => cur(k) <=> deltaKeys(k)).reduce(_ && _),
        "left_semi")
      CowTable.merge(spark, path,
        AggMerge.merge(curTouched, delta, keys), keys,
        checkUniqueKeys = false, txn = txn)
    } finally { delta.unpersist(); () }
  }

  /** The standing aggregates (optionally time-traveled). */
  def read(spark: SparkSession, path: String,
      asOfVersion: Option[Long] = None): DataFrame =
    CowTable.read(spark, path, asOfVersion)
}
