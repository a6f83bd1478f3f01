package graft.diff

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sentinel for the Spark behavior `DataColDiff.skewResilient` exists
  * to work around: AQE's OptimizeSkewedJoin splits skewed partitions of
  * inner joins but NOT of full-outer joins. If a Spark upgrade makes
  * the full-outer case split too, this suite fails — the signal to
  * re-evaluate whether the resilient decomposition is still needed.
  *
  * The data is shaped to satisfy every known split precondition:
  * multi-partition map side (the split works at map-output granularity,
  * so single-split inputs can never split), a hot partition several
  * times the median in COMPRESSED shuffle bytes (full rows, not a
  * constant key column that RLE-compresses away), thresholds low
  * enough for the small test volume, and a pinned multi-partition
  * REDUCE side (skew is judged against the median reduce partition, so
  * at the session default — sized to data volume, 2 in the 4-cpu test
  * JVM — the hot partition would BE the median and never qualify).
  */
class AqeSkewSentinelSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def skewMarkers(joinType: String): Int = {
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      val s1 = spark.range(200000).repartition(8)
        .select(when(col("id") % 2 === 0, 42L).otherwise(col("id")).as("k"),
          md5(col("id").cast("string")).as("v1"))
      val s2 = spark.range(200000).repartition(8)
        .select(col("id").as("k"), md5((col("id") + 7).cast("string")).as("v2"))
      val j = s1.join(s2, Seq("k"), joinType)
      val it = j.toLocalIterator()
      while (it.hasNext) it.next()
      "skew=true".r.findAllIn(
        j.queryExecution.executedPlan.toString).length
    } finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("AQE splits the skewed inner join (split preconditions hold here)") {
    assert(skewMarkers("inner") > 0,
      "inner-join skew split stopped working — the sentinel's data no " +
        "longer satisfies the split preconditions; fix the sentinel")
  }

  test("AQE still cannot split a skewed FULL OUTER join") {
    assert(skewMarkers("full_outer") === 0,
      "Spark now skew-splits full-outer joins! Re-evaluate whether " +
        "DataColDiff.skewResilient is still needed (see its scaladoc)")
  }
}
