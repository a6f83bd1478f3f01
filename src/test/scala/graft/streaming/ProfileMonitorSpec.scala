package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class ProfileMonitorSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("running state after N micro-batches == profile of concatenation") {
    val b1 = Seq((1L, Some("a")), (2L, Some("b")))
    val b2 = Seq((3L, None), (4L, Some("b")))
    val b3 = Seq((5L, Some("z")))
    val stream = MemoryStream[(Long, Option[String])](spark)
    var finalState = Map.empty[String, ProfileMonitor.ColState]
    val q = ProfileMonitor.monitor(
        stream.toDF().toDF("id", "s"),
        baseline = Map.empty, k = 8) { (_, _, run) => finalState = run }
      .start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val want = ProfileMonitor.profileState(
      (b1 ++ b2 ++ b3).toDF("id", "s"), k = 8)
    assert(finalState === want)
  }

  test("bottom-k merge is lossless: merged == sketch of the union") {
    val a = ProfileMonitor.profileState(
      (1 to 30).map(i => Tuple1(s"v$i")).toDF("x"), k = 8)
    val b = ProfileMonitor.profileState(
      (20 to 50).map(i => Tuple1(s"v$i")).toDF("x"), k = 8)
    val merged = ProfileMonitor.mergeStates(a, b, k = 8)
    val whole = ProfileMonitor.profileState(
      ((1 to 30) ++ (20 to 50)).map(i => Tuple1(s"v$i")).toDF("x"), k = 8)
    assert(merged("x").bottom === whole("x").bottom)
    assert(merged("x").estDistinct(8) === whole("x").estDistinct(8))
    assert(merged("x").nRows === 61L) // counts add (rows, not distincts)
  }

  test("drift verdicts: null-rate, distinct blow-up, range escape, ADDED") {
    // range values zero-padded so the LEXICOGRAPHIC comparison the
    // profile uses (string-typed, like the diff core) orders like the
    // numbers do
    val baseline = ProfileMonitor.profileState(
      (1 to 100).map(i => (s"k${i % 10}", Some("m"), f"${i % 50}%04d"))
        .toDF("stable", "nully", "range"), k = 8)
    // nully: 30% nulls now (baseline 0%); range: values escape
    // ["0000", "0049"]; stable: same shape
    val runningDf = (1 to 100).map(i => (s"k${i % 10}",
        if (i % 3 == 0) None else Some("m"), f"${1000 + i}%04d"))
      .toDF("stable", "nully", "range")
    val running = ProfileMonitor.profileState(runningDf, k = 8) +
      ("fresh" -> ProfileMonitor.ColState(1, 0, Some("x"), Some("x"),
        Vector(1L)))
    val flags = ProfileMonitor.drift(running, baseline, k = 8).toMap
    assert(flags("stable") === "NODIFF")
    assert(flags("nully") === "DRIFT")
    assert(flags("range") === "DRIFT")
    assert(flags("fresh") === "ADDED")
  }

  test("distinct-estimate ratio trips DRIFT when cardinality explodes") {
    val baseline = ProfileMonitor.profileState(
      (1 to 200).map(i => Tuple1(s"v${i % 5}")).toDF("x"), k = 8)
    // 200 distincts vs 5: estimate ratio far beyond 2.0; range kept
    // inside the baseline's lexicographic [v0, v4] span so only the
    // cardinality moves
    val running = ProfileMonitor.profileState(
      (1 to 200).map(i => Tuple1(f"v0_$i%03d")).toDF("x"), k = 8)
    val flags = ProfileMonitor.drift(running, baseline, k = 8).toMap
    assert(flags("x") === "DRIFT")
  }
}
