package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream face of [[graft.operators.Funnel]]: track each entity's
  * stage-completion times incrementally and emit a row the moment an
  * entity ADVANCES a stage — the live view of the same strictly-after
  * semantics the batch operator computes over history. Stage counts
  * are then a trivial downstream aggregation of the advancement
  * stream (count per step).
  *
  * State per entity is one fixed-length vector of completion times
  * (−1 = not reached) — O(#entities × #steps) longs total, partitioned
  * by entity. Events may arrive out of order ACROSS micro-batches;
  * because a stage's first-completion time can only move EARLIER under
  * the definition, a late event that would re-time an already-passed
  * stage re-evaluates the suffix: later stages are recomputed against
  * the corrected floor from the events this operator has seen for that
  * entity — impossible without keeping per-entity event history, so
  * this operator makes the standard streaming trade: it applies
  * in-order semantics PER BATCH sorted by time, and documents that
  * cross-batch late data needs the batch backfill (the reason both
  * faces exist; same trade as [[EventStream]]'s watermark).
  */
object FunnelStream {

  case class Event(entity: String, step: String, ts: Long)
  /** An entity reaching stage `step` (1-based) at `ts`. */
  case class Advance(entity: String, step: Int, ts: Long)

  def advances(events: Dataset[Event], steps: Seq[String])(
      implicit spark: SparkSession): Dataset[Advance] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_.entity)
      .flatMapGroupsWithState[Vector[Long], Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: String, batch: Iterator[Event],
            state: GroupState[Vector[Long]]) =>
          var times = state.getOption
            .getOrElse(Vector.fill(steps.size)(-1L))
          val out = Vector.newBuilder[Advance]
          // in-order semantics within the batch: process by event time
          batch.toSeq.filter(e => stepIdx.contains(e.step)).sortBy(_.ts)
            .foreach { e =>
              val i = stepIdx(e.step)
              val floorOk =
                if (i == 0) true
                else times(i - 1) >= 0 && e.ts > times(i - 1)
              if (floorOk && times(i) < 0) {
                times = times.updated(i, e.ts)
                out += Advance(entity, i + 1, e.ts)
              }
            }
          state.update(times)
          out.result().iterator
      }
  }
}
