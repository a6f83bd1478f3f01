package graft.streaming

import graft.tables.{CowTable, TxLog}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face #35: table REPLICATION over the row-level change
  * feed — [[TableChangeFeed.readCdc]] folded into an exact copy, the
  * composition CDC exists for (read replicas, cross-region copies,
  * downstream materializations that must not re-scan the source).
  *
  * Per micro-batch: preimages are dropped (informational), the
  * effects (insert / update_postimage / delete) are resolved
  * latest-commit-wins per key — one batch may span several commits
  * touching the same key, and within a commit a key appears at most
  * once as an effect (merge batches are unique per key) — then
  * applied through [[TableSink.applyBatch]]'s stamped MERGE, so the
  * replica inherits exactly-once semantics: a replayed batch (sink
  * retry, restart from an old checkpoint) observes its own Txn stamp
  * and no-ops.
  *
  * The replica table is created on the first non-empty batch (empty,
  * schema from the feed) — O(change volume) per trigger thereafter,
  * never a source rescan. A source `restore` is not representable in
  * the CDC stream (the feed fails loudly); restore the replica and
  * restart the stream past it, the same runbook every CDC replication
  * product documents.
  */
object TableReplica {

  /** Wire a [[TableChangeFeed.readCdc]] frame into a replica CowTable
    * at `path`, keyed by `keys`.
    *
    * `where`: a FILTERED replica (regional copies, tenant slices) —
    * replica contents ≡ source.filter(where) after every drain: the
    * filter applies to the EFFECT rows inside the fold, remapping any
    * effect whose row falls OUTSIDE the predicate into a DELETE — so
    * an update that moves a row out of the slice evicts it, an insert
    * that never belonged no-ops (merge deletes on unmatched keys do
    * nothing), and a move INTO the slice upserts. Consume the
    * UNFILTERED feed with this option; NULL predicate results count
    * as outside (SQL filter semantics). ALTERNATIVELY (round 15,
    * cheaper at scale): consume the SCOPED feed —
    * `readCdc(where, whereKeys)` ships predicate exits as delete
    * markers itself, the replica then needs no `where` here and the
    * feed volume tracks the slice's change rate instead of the
    * table's (`pipeline_table_replica_where` gates that composition).
    */
  def replicaSink(cdcFeed: DataFrame, path: String, keys: Seq[String],
      appId: String = "table-replica",
      where: Option[String] = None): DataStreamWriter[Row] =
    cdcFeed.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val ct = CowTable.ChangeTypeCol
        val vc = TableChangeFeed.VersionCol
        val del = where match {
          case Some(w) =>
            col(ct) === "delete" || !coalesce(expr(w), lit(false))
          case None => col(ct) === "delete"
        }
        val fx = batch.filter(col(ct) =!= "update_preimage")
          .withColumn("_gf_rdel", del)
          .drop(ct)
        if (TxLog.latestVersion(batch.sparkSession, path) == 0)
          CowTable.create(batch.sparkSession, path,
            fx.drop(vc, "_gf_rdel").limit(0), statsCols = keys)
        TableSink.applyBatch(path, keys, Some("_gf_rdel"), Some(vc),
          appId)(fx, batchId)
      }
    }
}
