package graft.streaming

import graft.SparkTestSession
import graft.operators.Quality._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming faces added with the heavy-hitters / data-quality
  * families: the quality monitor's incremental ≡ recompute identity
  * and the windowed MG candidate tracker's cross-batch guarantee.
  */
class MonitorStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("quality monitor: running counters == batch check of the concatenation") {
    val b1 = Seq((Some(1L), Some("a-1"), 5.0), (Some(2L), Some("a-2"), 15.0))
    val b2 = Seq((None, Some("zzz"), 3.0), (Some(4L), None, -2.0))
    val b3 = Seq((Some(5L), Some("a-9"), 7.0))
    val rules = Seq(
      NotNull("nn", "id"),
      InRange("r", "v", "0", "10"),
      Matches("m", "label", "^a-"))
    val parent = Seq(1L, 2L, 5L).toDF("pk")
    val fks = Seq(QualityMonitor.StaticFk("fk", "id", parent, "p", "pk"))

    val stream = MemoryStream[(Option[Long], Option[String], Double)](spark)
    var running = Map.empty[String, QualityMonitor.RuleState]
    var batches = 0L
    val q = QualityMonitor.monitor(
        stream.toDF().toDF("id", "label", "v"), "t", rules, fks) {
      (_, run) => running = run; batches += 1 }
      .start()
    try {
      Seq(b1, b2, b3).foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()

    assert(batches == 3L)
    val want = QualityMonitor.batchState(
      (b1 ++ b2 ++ b3).toDF("id", "label", "v"), "t", rules, fks)
    assert(running === want)
    // and the counts themselves are the hand-derivable ones
    assert(running("nn") === QualityMonitor.RuleState(1L, 5L))
    assert(running("r") === QualityMonitor.RuleState(2L, 5L)) // 15.0, -2.0
    assert(running("m") === QualityMonitor.RuleState(1L, 5L)) // zzz
    assert(running("fk") === QualityMonitor.RuleState(1L, 5L)) // id=4
  }

  test("quality monitor rejects Unique (not additive across batches)") {
    intercept[IllegalArgumentException] {
      QualityMonitor.batchState(Seq((1L, "x")).toDF("id", "s"), "t",
        Seq(Unique("u", Seq("id"))))
    }
  }

  test("quantile stream: windowed sketch == batch sketch; quantiles agree") {
    import graft.operators.LogQuantile
    val w1 = (1 to 40).map(i => (ts("2024-01-01 10:10:00"), "g", i * 7 / 100.0))
    val w1b = (1 to 25).map(i => (ts("2024-01-01 10:45:00"), "g", i * 31 / 100.0))
    val w2 = (1 to 10).map(i => (ts("2024-01-01 11:20:00"), "g", i / 100.0))

    val stream = MemoryStream[(Timestamp, String, Double)](spark)
    val q = QuantileStream.windowedSketch(
        stream.toDF().toDF("ts", "g", "v"), "ts", "g", "v", "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("qsk").start()
    try {
      stream.addData(w1)
      q.processAllAvailable()
      stream.addData(w1b ++ w2) // second batch extends window 10:00
      q.processAllAvailable()

      // materialize the emitted frame (as a stored sketch table would
      // be) — also sidesteps self-join reference dedup over the
      // memory-sink view inside quantilesFromSketch
      val streamed = spark.table("qsk")
        .collect().map(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[String]("grp"), r.getAs[Long]("bucket"),
          r.getAs[Long]("cnt"))).toSeq
      def skOf(win: String) = streamed.filter(_._1 == ts(win))
        .map(r => (r._2, r._3, r._4)).toDF("grp", "bucket", "cnt")
      // window 10:00 accumulated across two micro-batches == batch sketch
      val batch10 = LogQuantile.sketch(
        (w1 ++ w1b).map(r => (r._2, r._3)).toDF("g", "v"), "g", "v")
      assert(skOf("2024-01-01 10:00:00").collect().toSet ===
        batch10.collect().toSet)
      // quantiles extracted from the STREAMED bucket frame equal the
      // batch operator end-to-end
      val gotQ = LogQuantile.quantilesFromSketch(skOf("2024-01-01 10:00:00"))
        .collect().map(r => r.getAs[String]("p") -> r.getAs[Double]("q")).toMap
      val wantQ = LogQuantile.quantiles(
          (w1 ++ w1b).map(r => (r._2, r._3)).toDF("g", "v"), "g", "v")
        .collect().map(r => r.getAs[String]("p") -> r.getAs[Double]("q")).toMap
      assert(gotQ === wantQ)
      // window 11:00 is independent state
      assert(skOf("2024-01-01 11:00:00").collect().toSet ===
        LogQuantile.sketch(w2.map(r => (r._2, r._3)).toDF("g", "v"),
          "g", "v").collect().toSet)
    } finally q.stop()
  }

  test("heavy-hitter stream: cross-batch MG state keeps the deficit guarantee per window") {
    // window 10:00 gets two micro-batches (forces a state-store merge);
    // k=3 over 6 distinct items forces evictions
    val w1b1 = Seq.fill(6)("hot") ++ Seq("t1", "t2", "t3")
    val w1b2 = Seq.fill(5)("hot") ++ Seq("warm", "warm", "warm", "t4", "t5")
    val w2 = Seq("only", "only", "t6")
    def at(h: String, items: Seq[String]) = items.map(i => (ts(h), i))

    val stream = MemoryStream[(Timestamp, String)](spark)
    val q = HeavyHitterStream.candidates(
        stream.toDF().toDF("ts", "item"), "ts", "item",
        k = 3, windowDur = "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hhstream").start()
    try {
      stream.addData(at("2024-01-01 10:05:00", w1b1))
      q.processAllAvailable()
      stream.addData(at("2024-01-01 10:40:00", w1b2) ++
        at("2024-01-01 11:10:00", w2))
      q.processAllAvailable()

      val out = spark.table("hhstream").collect()
        .groupBy(_.getAs[Timestamp]("window_start"))
        .map { case (w, rows) => w.toString.take(13) ->
          rows.map(r => r.getAs[String]("item") ->
            r.getAs[Long]("lower_bound")).toMap }
      val w1 = out("2024-01-01 10")
      val truth = (w1b1 ++ w1b2).groupBy(identity).view.mapValues(_.size.toLong)
      val n = (w1b1 ++ w1b2).size.toLong
      // ≤ k candidates; no overcounts; every item with share > 1/(k+1)
      // survives the cross-batch merges — "hot" (11/19) must be there
      assert(w1.size <= 3)
      assert(w1.forall { case (i, lb) => lb >= 1 && lb <= truth(i) })
      assert(truth.forall { case (i, c) =>
        (c - w1.getOrElse(i, 0L)) * 4 <= n })
      assert(w1.contains("hot"))
      // the 11:00 window is independent state: 3 items, exact counts
      assert(out("2024-01-01 11") === Map("only" -> 2L, "t6" -> 1L))
    } finally q.stop()
  }
}
