package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // u1 completes the whole funnel in order; u2 clicks BEFORE its first
  // view (doesn't advance); u3 views only; u4 never views (but exists);
  // u5 clicks at exactly its first-view instant (strictly-after ⇒ no).
  private val events = Seq(
    ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
    ("u2", "click", 5L), ("u2", "view", 10L), ("u2", "purchase", 15L),
    ("u3", "view", 10L),
    ("u4", "error", 10L),
    ("u5", "view", 10L), ("u5", "click", 10L))
    .toDF("user_id", "event_type", "ts")

  private def run() =
    Funnel.stages(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("stage counts honor order and strict inequality") {
    val rows = run()
    // 4 of 5 users view; only u1 clicks after its first view; only u1
    // purchases after that click
    assert(rows.toSeq === Seq(
      (1, "view", 4L, 4.0 / 5.0),
      (2, "click", 1L, 1.0 / 4.0),
      (3, "purchase", 1L, 1.0 / 1.0)))
  }

  test("an empty stage yields conv 0.0 downstream, not a crash") {
    val rows = Funnel.stages(events, "user_id", "event_type", "ts",
        Seq("signup", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (1, "signup", 0L, 0.0),
      (2, "purchase", 0L, 0.0)))
  }

  test("an entirely empty event stream yields all-zero stages") {
    val empty = events.filter(col("ts") < 0L)
    val rows = Funnel.stages(empty, "user_id", "event_type", "ts",
        Seq("view", "click")).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq((1, 0L, 0.0), (2, 0L, 0.0)))
  }

  test("step names containing quotes and backslashes survive the unpivot") {
    val tricky = Seq("it's a view", """a\b""", """trailing\""")
    tricky.foreach { name =>
      val ev = Seq(("u1", name, 1L)).toDF("user_id", "event_type", "ts")
      val rows = Funnel.stages(ev, "user_id", "event_type", "ts",
        Seq(name)).collect()
      assert(rows.length === 1 && rows(0).getString(1) === name,
        s"step name '$name'")
      assert(rows(0).getLong(2) === 1L, s"step name '$name'")
    }
  }

  test("plan shuffles the events relation exactly once") {
    val plan = Funnel.stages(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"chained windows + rollup must reuse ONE exchange, got $exchanges:\n$plan")
  }
}
