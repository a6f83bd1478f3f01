package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the block-manager storage behind a
  * `localCheckpoint(eager = true)`'d frame (the [[PlanSurgery]] /
  * [[ColumnBridge]] shims' sibling — `LogicalRDD` is
  * `org.apache.spark.sql.execution` internal).
  *
  * Why this exists: `Dataset.localCheckpoint` persists the computed
  * rows as RDD blocks, but `Dataset.unpersist` only releases
  * CacheManager entries (`.persist`/`.cache`), NOT checkpoint blocks —
  * those are reclaimed only when the ContextCleaner eventually GCs the
  * dropped RDD reference. A long-running streaming maintainer that
  * checkpoints its standing frame every micro-batch can therefore
  * accumulate corpus-sized storage between GC cycles (ADVICE r15). The
  * checkpointed RDD rides the frame's `LogicalRDD` leaf; unpersisting
  * it releases the blocks the moment the batch is done with them —
  * the same scoped, deterministic release discipline as the engine's
  * `*Scoped` persist hand-backs.
  */
object CheckpointBridge {

  /** Release the checkpoint blocks behind `df`: every `LogicalRDD`
    * leaf under the frame's plan unpersists (a bare `localCheckpoint`
    * result IS one; a projection/join over checkpoints contains them
    * as leaves). No-op for plans without checkpoint leaves — safe to
    * call unconditionally in a `finally`. Callers own the scoping:
    * release a frame only once nothing derived from it will compute
    * again.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
