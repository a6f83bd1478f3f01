package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Event-gap sessionization via `flatMapGroupsWithState` — the
  * canonical stream logic that windowed aggregation cannot express
  * (session boundaries depend on the DATA, not the clock grid).
  *
  * A session is a maximal run of a user's events with consecutive gaps
  * below `gapMs`. Sessions close two ways:
  *   - deterministically, when a later event arrives past the gap
  *     (the closed session is emitted with that micro-batch);
  *   - by event-time timeout once the watermark passes session end +
  *     gap (abandoned sessions don't hold state forever — state is
  *     O(active users), partitioned by key across executors).
  */
object Sessionize {

  case class Click(user: String, ts: Timestamp)
  case class Session(user: String, start: Timestamp, end: Timestamp,
      n_events: Long)

  /** Internal per-user state (public: Spark's encoder codegen requires
    * accessible accessors).
    */
  case class Open(start: Long, end: Long, n: Long)

  /** Completed sessions of a WATERMARKED streaming Dataset[Click]
    * (callers: `clicks.withWatermark("ts", ...)` first; required by
    * the event-time timeout).
    */
  def sessions(clicks: Dataset[Click], gapMs: Long)
      (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    clicks.groupByKey(_.user)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, events: Iterator[Click], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            val sorted = events.map(_.ts.getTime).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { t =>
              open match {
                case Some(o) if t - o.end <= gapMs =>
                  // Late (out-of-order) events may arrive with t < end —
                  // extend the span monotonically, never regress it.
                  open = Some(Open(math.min(o.start, t),
                    math.max(o.end, t), o.n + 1))
                case Some(o) =>
                  closed += Session(user, new Timestamp(o.start),
                    new Timestamp(o.end), o.n)
                  open = Some(Open(t, t, 1))
                case None =>
                  open = Some(Open(t, t, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp(o.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
