package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class TemporalJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join: latest right row at-or-before each left time, per key") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "l1"),
      ("u1", ts("2024-01-01 12:00:00"), "l2"),
      ("u2", ts("2024-01-01 09:00:00"), "l3"), // before any u2 right row
      ("u3", ts("2024-01-01 10:00:00"), "l4")  // no u3 right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1.0),
      ("u1", ts("2024-01-01 12:00:00"), 2.0), // EQUAL time → matches (≤)
      ("u2", ts("2024-01-01 11:00:00"), 3.0)
    ).toDF("k", "rt", "v")

    val got = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_rt", "asof_v")
      .collect()
      .map(r => (r.getString(0),
        Option(r.getTimestamp(1)).map(_.toString),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq(
      ("l1", Some("2024-01-01 09:30:00.0"), Some(1.0)),
      ("l2", Some("2024-01-01 12:00:00.0"), Some(2.0)),
      ("l3", None, None),
      ("l4", None, None)))
  }

  test("forward as-of join: earliest right row at-or-after, per key") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "l1"), // next = 10:30 (not 12:00)
      ("u1", ts("2024-01-01 12:00:00"), "l2"), // EQUAL time → matches (≥)
      ("u1", ts("2024-01-01 13:00:00"), "l3"), // after all u1 right rows
      ("u2", ts("2024-01-01 09:00:00"), "l4")  // no u2 right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      ("u1", ts("2024-01-01 10:30:00"), 1.0),
      ("u1", ts("2024-01-01 12:00:00"), 2.0)
    ).toDF("k", "rt", "v")

    val got = AsOfJoin.joinAsOfForward(left, right, Seq("k"), "t", "rt",
        Seq("v"))
      .orderBy("tag")
      .select("tag", "next_rt", "next_v")
      .collect()
      .map(r => (r.getString(0),
        Option(r.getTimestamp(1)).map(_.toString),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq(
      ("l1", Some("2024-01-01 10:30:00.0"), Some(1.0)),
      ("l2", Some("2024-01-01 12:00:00.0"), Some(2.0)),
      ("l3", None, None),
      ("l4", None, None)))
  }

  test("forward as-of join == naive earliest-at-or-after on real events") {
    val ev = graft.queries.Tables.load(spark, "/root/testdata/sf0.001",
      "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pv"))
    import java.time.LocalDateTime
    val got = AsOfJoin.joinAsOfForward(clicks, pur, Seq("user_id"),
        "ts", "ts", Seq("pv"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getAs[LocalDateTime](3)), if (r.isNullAt(4)) None
          else Some(r.getDouble(4)))).toMap
    val purRows = pur.collect()
      .map(r => (r.getLong(0), r.getAs[LocalDateTime](1), r.getDouble(2)))
    val want = clicks.collect().map { c =>
      val ct = c.getAs[LocalDateTime](2)
      val cand = purRows.filter(p => p._1 == c.getLong(1) &&
        !p._2.isBefore(ct))
      c.getLong(0) -> (if (cand.isEmpty) (None, None)
        else { val b = cand.minBy(_._2)(Ordering.fromLessThan[LocalDateTime](
          _.isBefore(_)))
          (Some(b._2), Some(b._3)) })
    }.toMap
    assert(got === want)
  }

  test("as-of join: null keys never match (SQL equality semantics)") {
    val left = Seq((Option.empty[String], ts("2024-01-01 10:00:00"), "l"))
      .toDF("k", "t", "tag")
    val right = Seq((Option.empty[String], ts("2024-01-01 09:00:00"), 9.0))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("asof_v").collect()
    assert(got.length === 1 && got.head.isNullAt(0))
  }

  test("as-of join plan: ONE exchange total (union, not theta-join fanout)") {
    val left = Seq(("u1", ts("2024-01-01 10:00:00"), "l1")).toDF("k", "t", "tag")
    val right = Seq(("u1", ts("2024-01-01 09:30:00"), 1.0)).toDF("k", "rt", "v")
    val plan = AsOfJoin.joinAsOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("range join matches the naive theta-join formulation on real events") {
    val ev = graft.queries.Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val bucketed = RangeJoin
      .joinRange(purchases, clicks, Seq("user_id"), "w_start", "p_ts", "c_ts")
      .groupBy("p_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = purchases.join(clicks,
        purchases("user_id") === clicks("user_id") &&
          col("c_ts") >= col("w_start") && col("c_ts") <= col("p_ts"))
      .groupBy("p_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed.nonEmpty)
    assert(bucketed === naive)
  }

  test("range join windows spanning multiple buckets keep all matches") {
    val left = Seq(("k", ts("2024-01-01 09:10:00"), ts("2024-01-01 12:50:00")))
      .toDF("k", "s", "e")
    val right = Seq(
      ("k", ts("2024-01-01 09:05:00")), // before window
      ("k", ts("2024-01-01 09:10:00")), // on start boundary
      ("k", ts("2024-01-01 11:00:00")), // mid
      ("k", ts("2024-01-01 12:50:00")), // on end boundary
      ("k", ts("2024-01-01 13:05:00"))  // after window
    ).toDF("k", "rt")
    val got = RangeJoin.joinRange(left, right, Seq("k"), "s", "e", "rt")
      .select("rt").collect().map(_.getTimestamp(0).toString).sorted
    assert(got.toSeq === Seq("2024-01-01 09:10:00.0",
      "2024-01-01 11:00:00.0", "2024-01-01 12:50:00.0"))
  }
}
