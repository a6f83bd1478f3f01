package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("z-score flags a spike against the trailing window") {
    // hours 0..3 have 2 events each; hour 4 has 6 — a clear spike
    val rows = (0 to 3).flatMap(h => Seq(("a", ts(h, 1)), ("a", ts(h, 2)))) ++
      (1 to 6).map(m => ("a", ts(4, m)))
    val out = Anomaly.rollingZ(rows.toDF("grp_in", "ts"), "grp_in", "ts",
        window = 24)
      .orderBy("bucket_ts").collect()
    // constant prefix: variance 0 ⇒ z = 0
    (0 to 3).foreach { h =>
      assert(out(h).getLong(2) === 2L)
      assert(out(h).getDouble(4) === 0.0, s"hour $h should be calm")
    }
    // hour 4: n=6, trailing counts (2,2,2,2,6): mean 2.8, var 2.56, sd 1.6
    assert(out(4).getLong(2) === 6L)
    assert(math.abs(out(4).getDouble(3) - 2.8) < 1e-12)
    assert(math.abs(out(4).getDouble(4) - 2.0) < 1e-12) // (6-2.8)/1.6
  }

  test("groups are independent and the frame is ROWS over observed buckets") {
    // group b skips hour 1 entirely — hour 2's window spans the two
    // OBSERVED buckets (0 and 2), not a zero-filled hour 1
    val rows = Seq(("b", ts(0)), ("b", ts(2)), ("b", ts(2, 30)),
      ("c", ts(0)))
    val out = Anomaly.rollingZ(rows.toDF("g", "ts"), "g", "ts", window = 24)
      .orderBy("grp", "bucket_ts").collect()
    assert(out.length === 3)
    val h2 = out(1) // (b, hour 2): n=2, trailing (1,2): mean 1.5, var .25
    assert(h2.getLong(2) === 2L)
    assert(math.abs(h2.getDouble(3) - 1.5) < 1e-12)
    assert(math.abs(h2.getDouble(4) - 1.0) < 1e-12) // (2-1.5)/0.5
    assert(out(2).getDouble(4) === 0.0) // c's single bucket: var 0
  }

  test("dense variant: gaps become zero buckets and depress the mean") {
    // group d: burst at hour 0, silence for hours 1-3, burst at hour 4
    val rows = Seq(("d", ts(0, 1)), ("d", ts(0, 2)), ("d", ts(4, 1)),
      ("d", ts(4, 2)))
    val out = Anomaly.rollingZDense(rows.toDF("g", "ts"), "g", "ts",
        window = 24)
      .orderBy("bucket_ts").collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    // 5 rows now (sparse form would give 2); hour 4 sees counts
    // (2,0,0,0,2): mean 0.8 — the gap makes the burst anomalous
    assert(out.length === 5)
    assert(out.map(_._1).toSeq === Seq(2L, 0L, 0L, 0L, 2L))
    assert(math.abs(out(4)._2 - 0.8) < 1e-12)
    val sparse = Anomaly.rollingZ(rows.toDF("g", "ts"), "g", "ts")
      .collect()
    assert(sparse.length === 2)
    assert(sparse.forall(_.getDouble(4) === 0.0)) // constant 2s: calm
  }

  test("plan: events pre-aggregate before the group partitioning") {
    val plan = Anomaly.rollingZ(
        Seq(("a", ts(0))).toDF("g", "ts"), "g", "ts")
      .queryExecution.executedPlan.toString
    // partial aggregation must come below the exchange: raw events never
    // shuffle, only one row per (group, bucket) does
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }
}
