package graft.streaming

import graft.tables.{CowTable, TxLog}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face #33: exactly-once maintenance of a [[CowTable]] from
  * a CDC/upsert stream — the production holder the in-process
  * [[Scd2Stream.HistoryHolder]] stands in for, now real: each
  * micro-batch MERGEs into the transactional table, stamped with
  * `Txn(appId, batchId)` so REPLAYED batches (sink retries, restarts
  * from an older streaming checkpoint) observe their own stamp in the
  * log and no-op instead of double-applying. Structured Streaming's
  * foreachBatch is at-least-once; the log stamp is what upgrades the
  * composition to exactly-once — the standard idempotent-writer
  * contract of log-based table formats.
  *
  * Within-batch key collisions (a key changed twice inside one
  * micro-batch — normal in CDC) are resolved BEFORE the merge by
  * `orderCol`: one `max(struct(ord, row))` aggregate keeps the latest
  * change per key (map-side combining collapses hot keys early;
  * callers guarantee (keys, orderCol) unique, the usual CDC sequence
  * contract). The merge itself then sees unique keys.
  *
  * Scale shape: per micro-batch cost is [[CowTable.merge]]'s — zone-map
  * pruning + rewrite of only the files holding batch keys. A
  * key-clustered layout keeps per-batch write amplification at
  * O(batch-key-range); periodic [[CowTable.compact]] folds the
  * accumulating small per-batch insert files.
  */
object TableSink {

  /** The per-batch application, exposed so replay behavior is directly
    * testable: calling this twice with the same `batchId` applies once.
    */
  def applyBatch(path: String, keys: Seq[String],
      deleteCol: Option[String], orderCol: Option[String], appId: String)(
      batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val resolved = orderCol.fold(batch) { ord =>
        val others = batch.columns.filterNot(keys.contains)
        batch.groupBy(keys.map(col): _*)
          .agg(max(struct(col(ord).as("_o") +: others.map(col): _*))
            .as("_w"))
          .select(keys.map(col) ++
            others.map(c => col(s"_w.$c").as(c)): _*)
      }
      CowTable.merge(batch.sparkSession, path, resolved, keys, deleteCol,
        checkUniqueKeys = orderCol.isEmpty,
        txn = Some(TxLog.Txn(appId, batchId)))
      ()
    }

  /** Wire `stream` (a CDC/upsert frame: key columns + full row +
    * optional delete flag + optional sequence column) into the
    * CowTable at `path`.
    */
  def mergeSink(stream: DataFrame, path: String, keys: Seq[String],
      deleteCol: Option[String] = None, orderCol: Option[String] = None,
      appId: String = "table-sink"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(
      applyBatch(path, keys, deleteCol, orderCol, appId) _)

  /** Append-only variant (event logs: no keys, no rewrites — each
    * batch lands as fresh files, same idempotence stamp).
    */
  def appendSink(stream: DataFrame, path: String,
      appId: String = "table-append"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty)
        CowTable.append(batch.sparkSession, path, batch,
          Some(TxLog.Txn(appId, batchId)))
    }

  /** Standing-aggregate variant: each micro-batch of RAW rows folds
    * into a [[graft.tables.AggTable]] (map-side delta aggregate →
    * pruned touched-key read → proven combiners → one stamped merge).
    * The exactly-once stamp matters doubly here — a replayed additive
    * fold would silently double-count, not just duplicate rows.
    */
  def aggSink(stream: DataFrame, path: String, keys: Seq[String],
      valueCol: String,
      appId: String = "table-agg"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        graft.tables.AggTable.fold(batch.sparkSession, path, batch,
          keys, valueCol, Some(TxLog.Txn(appId, batchId)))
        ()
      }
    }
}
