package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream face of [[graft.operators.Anomaly.rollingZ]]: score each
  * finalized (group, bucket, count) row against its group's trailing
  * `window` buckets as it arrives — live pipeline-telemetry alerting
  * over the same arithmetic the batch query backfills.
  *
  * Input is the FINALIZED bucket stream (e.g. the append-mode output
  * of [[EventStream.windowedCounts]] under a watermark), not raw
  * events: the hourly aggregation is the upstream operator's job, and
  * append mode guarantees each bucket arrives exactly once, in
  * event-time order per group — the order the batch window frame
  * assumes.
  *
  * State per group is a deque of at most `window - 1` (bucket, count)
  * longs — bounded regardless of stream length, partitioned by group
  * across executors. The z arithmetic mirrors the batch operator's
  * fixed-form expression step for step (integer sums, then the same
  * two divisions and sqrt), so a bucket scores bit-identically whether
  * it flowed through this operator or the batch query.
  */
object AnomalyStream {

  case class Bucket(grp: String, bucket_ts: java.sql.Timestamp, n: Long)
  case class Scored(grp: String, bucket_ts: java.sql.Timestamp, n: Long,
    mean_n: Double, z: Double)

  def scored(buckets: Dataset[Bucket], window: Int = 24)(
      implicit spark: SparkSession): Dataset[Scored] = {
    import spark.implicits._
    require(window >= 1, "window must be at least 1 bucket")
    buckets.groupByKey(_.grp)
      .flatMapGroupsWithState[Vector[(Long, Long)], Scored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[Bucket],
            state: GroupState[Vector[(Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Vector.empty)
          // shuffle hands the group's rows over in arbitrary order;
          // score in event-time order, the batch frame's order
          val out = batch.toSeq.sortBy(_.bucket_ts.getTime).map { b =>
            val frame = hist.takeRight(window - 1) :+ (b.bucket_ts.getTime, b.n)
            val cnt = frame.size.toLong
            val s = frame.iterator.map(_._2).sum
            val ss = frame.iterator.map(x => x._2 * x._2).sum
            val mean = s.toDouble / cnt
            val variance = (ss.toDouble - s.toDouble * s.toDouble / cnt) / cnt
            val z =
              if (variance > 0) (b.n.toDouble - mean) / math.sqrt(variance)
              else 0.0
            hist = (hist :+ ((b.bucket_ts.getTime, b.n))).takeRight(window - 1)
            Scored(grp, b.bucket_ts, b.n, mean, z)
          }
          state.update(hist)
          out.iterator
      }
  }
}
