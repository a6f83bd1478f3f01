package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom keyed state via `mapGroupsWithState` — the escape hatch for
  * stream logic that windowed aggregation can't express (running
  * totals, sessionization, custom triggers).
  *
  * State per key is one tuple (count, sum) — O(#distinct keys) total,
  * partitioned by key across executors; that's the bounded-state shape
  * that scales to high-cardinality key spaces (and the reason to prefer
  * this over collecting per-key history).
  */
object RunningCounts {

  case class Event(key: String, value: Double)
  case class KeyTotal(key: String, events: Long, total: Double)

  /** Cumulative (count, sum) per key, emitted once per key per
    * micro-batch it appears in.
    */
  def perKey(events: Dataset[Event])(implicit spark: SparkSession): Dataset[KeyTotal] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .mapGroupsWithState[(Long, Double), KeyTotal](GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[Event], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          // Shuffle hands the group iterator over in arbitrary order;
          // fold in a fixed order so the double sum is bit-deterministic
          // across runs.
          val evs = batch.toSeq.sortBy(_.value)
          val next = (n0 + evs.size, evs.foldLeft(s0)(_ + _.value))
          state.update(next)
          KeyTotal(key, next._1, next._2)
      }
  }
}
