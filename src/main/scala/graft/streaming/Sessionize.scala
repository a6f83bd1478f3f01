package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Event-gap sessionization via `flatMapGroupsWithState` — the
  * canonical stream logic that windowed aggregation cannot express
  * (session boundaries depend on the DATA, not the clock grid).
  *
  * A session is a maximal run of a user's events with consecutive gaps
  * below `gapMs`. Out-of-order events (any arrival above the watermark)
  * are handled fully: state holds the user's OPEN SESSION SET — a
  * sorted list of disjoint candidate sessions — and each event
  * merge-inserts, possibly FUSING two neighbors it bridges. A session
  * is emitted only when the event-time watermark passes its end + gap:
  * at that point no event that could still arrive may extend it, so
  * emission is final and identical to the batch `session_window`
  * result (spec-verified on real data). Emitting earlier (e.g. when a
  * later in-order event exceeds the gap) would be wrong under
  * lateness — a late event inside the gap could bridge the two.
  *
  * State is O(open sessions within the watermark horizon) per user —
  * bounded by the horizon, partitioned by key across executors.
  */
object Sessionize {

  case class Click(user: String, ts: Timestamp)
  case class Session(user: String, start: Timestamp, end: Timestamp,
      n_events: Long)

  /** Internal per-user state (public: Spark's encoder codegen requires
    * accessible accessors). `sessions` is sorted by start, disjoint,
    * neighbors separated by more than the gap.
    */
  case class Open(start: Long, end: Long, n: Long)
  case class OpenSet(sessions: List[Open])

  /** Merge-insert: fold the point session [t, t] into the sorted
    * disjoint session set, fusing every session STRICTLY within gap on
    * either side — a gap of exactly gapMs separates, matching batch
    * session_window's half-open [start, end+gap) windows. The fold is
    * insertion-ORDER-INSENSITIVE (property-tested), which is what makes
    * out-of-order arrival safe.
    */
  private[streaming] def mergeInsert(sorted: List[Open], t: Long,
      gapMs: Long): List[Open] = {
    val (before, rest) = sorted.span(_.end <= t - gapMs)
    val (touching, after) = rest.span(_.start < t + gapMs)
    val fused = touching.foldLeft(Open(t, t, 1)) { (acc, s) =>
      Open(math.min(acc.start, s.start), math.max(acc.end, s.end),
        acc.n + s.n)
    }
    before ::: fused :: after
  }

  /** Completed sessions of a WATERMARKED streaming Dataset[Click]
    * (callers: `clicks.withWatermark("ts", ...)` first; required by
    * the event-time timeout).
    */
  def sessions(clicks: Dataset[Click], gapMs: Long)
      (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._

    clicks.groupByKey(_.user)
      .flatMapGroupsWithState[OpenSet, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, events: Iterator[Click], state: GroupState[OpenSet]) =>
          val open0 = state.getOption.map(_.sessions).getOrElse(Nil)
          val open = events.foldLeft(open0)((acc, c) =>
            mergeInsert(acc, c.ts.getTime, gapMs))
          val wm = state.getCurrentWatermarkMs()
          // final = nothing that can still arrive (ts ≥ watermark) could
          // extend the session: its whole [start-gap, end+gap] halo is
          // below the watermark
          val (expired, live) = open.partition(_.end + gapMs <= wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(OpenSet(live))
            state.setTimeoutTimestamp(live.map(_.end).min + gapMs)
          }
          expired.sortBy(_.start).iterator.map(o =>
            Session(user, new Timestamp(o.start), new Timestamp(o.end), o.n))
      }
  }
}
