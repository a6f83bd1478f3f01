package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each left row with the right rows whose
  * `rightTime` falls inside the left row's `[startCol, endCol]` window,
  * per key.
  *
  * Shape: NOT the naive `l JOIN r ON keys AND r.t BETWEEN l.s AND l.e`
  * — Catalyst executes that as an equi-join on the keys with the range
  * as a post-join filter, which degenerates when keys are few/hot (all
  * pairs per key materialize before filtering). Instead the left
  * interval EXPLODES into fixed-width time buckets and the join becomes
  * a pure equi-join on (keys, bucket) + exact-range filter: each right
  * row only ever meets the left rows whose window touches its bucket.
  * Fanout = interval/bucketWidth extra left rows (pick the bucket near
  * the typical window width); the join shuffles on (keys, bucket),
  * which also spreads a hot key across its time range — the shape that
  * holds at 100 TB.
  */
object RangeJoin {

  /** Inner range-join; output = left columns + right columns.
    *
    * @param keys        equi-key columns present on both sides
    * @param startCol    left window start (timestamp, inclusive)
    * @param endCol      left window end (timestamp, inclusive)
    * @param rightTime   right event-time column (timestamp)
    * @param bucket      bucket width as a Spark interval literal
    *                    granularity understood by date_trunc (e.g.
    *                    "hour", "day") — window and probe both truncate
    *                    to this unit
    */
  def joinRange(left: DataFrame, right: DataFrame, keys: Seq[String],
      startCol: String, endCol: String, rightTime: String,
      bucket: String = "hour"): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    // a malformed row with end < start matches nothing (naive-join
    // semantics) — unguarded, sequence() would throw and kill the job
    val lb = left.filter(col(startCol) <= col(endCol)).withColumn("__bucket",
      explode(sequence(
        date_trunc(bucket, col(startCol)),
        date_trunc(bucket, col(endCol)),
        expr(s"INTERVAL 1 $bucket"))))
    val rb = right.withColumn("__bucket", date_trunc(bucket, col(rightTime)))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(rightTime) >= col(startCol) && col(rightTime) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: pair each left `[lStart, lEnd]` window
    * with the right `[rStart, rEnd]` windows it intersects (closed
    * intervals: touching endpoints overlap), per key — the
    * interval×interval face of [[joinRange]]'s interval×point.
    *
    * Both sides explode into the fixed-width buckets their windows
    * touch and join as a pure equi-join on (keys, bucket). A pair
    * whose overlap spans b buckets would surface b times; instead of
    * a result-wide DISTINCT (a second corpus-scale shuffle, and one
    * that would need every output column in the key), the join keeps
    * ONLY the row where the bucket equals the truncated
    * `greatest(lStart, rStart)` — the overlap's FIRST bucket, which
    * both sides provably explode — so each overlapping pair emits
    * exactly once by construction. Same skew story as [[joinRange]]:
    * the shuffle key (keys, bucket) spreads a hot key across time.
    */
  def joinOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucket: String = "hour"): DataFrame = {
    require(keys.nonEmpty, "overlap join needs at least one key column")
    def explodeBuckets(df: DataFrame, s: String, e: String) =
      df.filter(col(s) <= col(e)).withColumn("__bucket",
        explode(sequence(
          date_trunc(bucket, col(s)),
          date_trunc(bucket, col(e)),
          expr(s"INTERVAL 1 $bucket"))))
    val lb = explodeBuckets(left, lStart, lEnd)
    val rb = explodeBuckets(right, rStart, rEnd)
    lb.join(rb, keys :+ "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        date_trunc(bucket, greatest(col(lStart), col(rStart))))
      .drop("__bucket")
  }
}
