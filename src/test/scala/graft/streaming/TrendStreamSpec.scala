package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Trend-monitor streaming face (#28): running OLS moment state across
  * micro-batches must be BIT-equal to the batch operator over the
  * concatenation (exact BigInt mergeability), and the verdict face
  * must flip when a flat stream starts climbing.
  */
class TrendStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(rows: Seq[(String, Long, Double)]) =
    rows.toDF("g", "x", "y")

  test("running state == batch over concatenation, bit-equal") {
    val b1 = Seq(("a", 0L, 1.5), ("a", 1L, 2.25), ("b", 0L, 10.0))
    val b2 = Seq(("a", 2L, 3.0), ("b", 5L, 9.75))
    val b3 = Seq(("b", 10L, 9.5), ("c", 1L, 0.125))

    val stream = MemoryStream[(String, Long, Double)](spark)
    var running = Map.empty[String, TrendStream.GroupState]
    val q = TrendStream.monitor(stream.toDF().toDF("g", "x", "y"),
        "g", col("x"), col("y"), minAbsSlope = 0.0) { (_, _, r) =>
      running = r
    }.start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val want = TrendStream.state(frame(b1 ++ b2 ++ b3), "g",
      col("x"), col("y"))
    assert(running === want)
    // and the state's closed form matches the batch gate's rationals
    val gate = graft.operators.TrendFit.fit(frame(b1 ++ b2 ++ b3),
        Seq("g"), col("x"), col("y")).collect()
      .map(r => r.getString(0) ->
        (BigInt(r.getAs[String]("slope_num")),
          BigInt(r.getAs[String]("slope_den")))).toMap
    for ((g, st) <- running)
      assert((st.slopeNum, st.slopeDen) === gate(g), s"closed form at $g")
  }

  test("state.corr floor-quantizes to the batch gate's corr_q exactly") {
    val rows = Seq(
      ("a", 1L, 2.5), ("a", 2L, 4.5), ("a", 3L, 7.25), ("a", 4L, 8.0),
      ("b", 1L, 9.0), ("b", 2L, 5.0), ("b", 3L, 1.5),
      ("c", 5L, 1.0), ("c", 5L, 2.0)) // zero x variance -> undefined
    val st = TrendStream.state(frame(rows), "g", col("x"), col("y"))
    val gate = graft.operators.Correlate.pearson(frame(rows), Seq("g"),
        col("x"), col("y")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    for ((g, want) <- gate) {
      val got = st(g).corr.map(c => math.floor(c * 1000000.0).toLong)
      assert(got === want, s"corr at $g")
    }
    assert(st("c").corr.isEmpty)
  }

  test("verdict flips when a flat stream starts climbing") {
    val stream = MemoryStream[(String, Long, Double)](spark)
    var seen = Vector.empty[(Long, String)]
    val q = TrendStream.monitor(stream.toDF().toDF("g", "x", "y"),
        "g", col("x"), col("y"),
        minAbsSlope = 0.1 * graft.operators.TrendFit.Scale) {
      (id, vs, _) => seen :+= (id -> vs.find(_._1 == "m").get._3)
    }.start()
    try {
      // flat phase
      stream.addData(Seq(("m", 0L, 5.0), ("m", 1L, 5.0), ("m", 2L, 5.0)))
      q.processAllAvailable()
      // climb phase
      stream.addData(Seq(("m", 3L, 9.0), ("m", 4L, 13.0), ("m", 5L, 17.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._2) === Vector("FLAT", "TRENDING_UP"))
  }

  test("merge is associative and UNMEASURED surfaces single-x groups") {
    val s1 = TrendStream.state(frame(Seq(("a", 1L, 2.0))), "g",
      col("x"), col("y"))
    val s2 = TrendStream.state(frame(Seq(("a", 1L, 4.0))), "g",
      col("x"), col("y"))
    val s3 = TrendStream.state(frame(Seq(("a", 2L, 6.0))), "g",
      col("x"), col("y"))
    val ab_c = TrendStream.mergeStates(TrendStream.mergeStates(s1, s2), s3)
    val a_bc = TrendStream.mergeStates(s1, TrendStream.mergeStates(s2, s3))
    assert(ab_c === a_bc)
    // s1+s2 alone: both rows share x=1 → no measurable trend
    val v = TrendStream.verdicts(TrendStream.mergeStates(s1, s2), 0.0)
    assert(v === Seq(("a", None, "UNMEASURED")))
  }
}
