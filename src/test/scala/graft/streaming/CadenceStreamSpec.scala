package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Cadence-monitor streaming face (#29): running daily-count state
  * across micro-batches is exactly mergeable, the recomputed profile
  * is BIT-equal to the batch operator over the concatenation, and the
  * latest-day verdict flips when a day breaks its phase pattern.
  */
class CadenceStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long, i: Int): Timestamp =
    new Timestamp((day * 86400L + i * 60L) * 1000L)

  test("running state & profile == batch over concatenation") {
    val b1 = Seq(("a", ts(20000, 0)), ("a", ts(20000, 1)), ("b", ts(20001, 0)))
    val b2 = Seq(("a", ts(20007, 0)), ("a", ts(20000, 2)), ("b", ts(20008, 0)))
    val b3 = Seq(("a", ts(20014, 0)), ("b", ts(20015, 0)), ("b", ts(20015, 1)))

    val stream = MemoryStream[(String, Timestamp)](spark)
    var running: CadenceStream.CadenceState = Map.empty
    val q = CadenceStream.monitor(stream.toDF().toDF("g", "ts"),
        "g", col("ts"), period = 7, loPpm = 500000L, hiPpm = 2000000L) {
      (_, _, r) => running = r
    }.start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val all = (b1 ++ b2 ++ b3).toDF("g", "ts")
    val wantState = CadenceStream.state(all, "g", col("ts"))
    assert(running === wantState)

    val got = CadenceStream.profile(spark, running, period = 7)
      .orderBy("grp", "phase").collect().map(_.toSeq)
    val want = graft.operators.Seasonality
      .profile(all, Seq("g"), col("ts"), period = 7)
      .withColumnRenamed("g", "grp")
      .orderBy("grp", "phase").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("ewmaQ over folded state == batch Ewma gate, bit-equal") {
    val rows = Seq.fill(3)(("a", ts(100, 0))) ++
      Seq.fill(2)(("a", ts(99, 0))) ++ Seq.fill(4)(("a", ts(97, 0))) ++
      Seq(("b", ts(50, 0)))
    // fold in two arbitrary batches
    val st = CadenceStream.mergeStates(
      CadenceStream.state(rows.take(4).toDF("g", "ts"), "g", col("ts")),
      CadenceStream.state(rows.drop(4).toDF("g", "ts"), "g", col("ts")))
    val got = CadenceStream.ewmaQ(st)
    val want = graft.operators.Ewma.dailyHalfLife(
        rows.toDF("g", "ts"), Seq("g"), col("ts"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("merge is associative and order-independent") {
    val s = Seq(
      Map(("a", 1L) -> 2L, ("b", 3L) -> 1L),
      Map(("a", 1L) -> 5L),
      Map(("c", 9L) -> 4L, ("a", 2L) -> 1L))
    val m = CadenceStream.mergeStates _
    assert(m(m(s(0), s(1)), s(2)) === m(s(0), m(s(1), s(2))))
    assert(m(s(0), s(1)) === m(s(1), s(0)))
  }

  test("latest-day verdict flips QUIET -> SPIKE on a burst day") {
    val stream = MemoryStream[(String, Timestamp)](spark)
    var seen = Vector.empty[String]
    val q = CadenceStream.monitor(stream.toDF().toDF("g", "ts"),
        "g", col("ts"), period = 7, loPpm = 500000L, hiPpm = 2000000L) {
      (_, vs, _) => seen :+= vs.find(_._1 == "m").get._5
    }.start()
    try {
      // two quiet weeks: 2 events every monday-phase day
      stream.addData(Seq(("m", ts(21000, 0)), ("m", ts(21000, 1)),
        ("m", ts(21007, 0)), ("m", ts(21007, 1))))
      q.processAllAvailable()
      // burst: 10 events on the next same-phase day
      stream.addData((0 until 10).map(i => ("m", ts(21014, i))))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen === Vector("QUIET", "SPIKE"))
  }
}
