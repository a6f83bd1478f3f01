package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityCalibrationSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-checkable percentiles; singleton stratum reports 0") {
    val df = Seq(
      (1L, "a", 0.1), (2L, "a", 0.5), (3L, "a", 0.9), // 0, 0.5, 1
      (4L, "b", 0.7),                                 // singleton → 0
      (5L, "c", 0.3), (6L, "c", 0.3)                  // tie → id order
    ).toDF("doc_id", "source", "q")
    val got = QualityCalibration
      .percentileRank(df, "doc_id", "source", col("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0,
      4L -> 0.0, 5L -> 0.0, 6L -> 1.0))
  }

  test("a uniform pct cut keeps the same SHARE of every source") {
    // raw-score cuts keep wildly different shares per source when
    // distributions differ — the calibrated cut must not
    val docs = (0L until 300L).map { i =>
      val src = s"s${i % 3}"
      // source s2's scores sit far above s0's
      (i, src, (i % 100) / 100.0 + (i % 3) * 10)
    }.toDF("doc_id", "source", "q")
    val kept = QualityCalibration
      .percentileRank(docs, "doc_id", "source", col("q"))
      .filter(col("pct") >= 0.4)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.values.toSet.size === 1,
      s"calibrated cut must keep equal shares, got $kept")
  }
}
