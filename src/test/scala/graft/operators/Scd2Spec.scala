package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val day0 = Seq(
    (1L, "alice", "US"),
    (2L, "bob", "DE"),
    (3L, "carol", "FR")).toDF("id", "name", "country")

  private val day1 = Seq(
    (1L, "alice", "US"),  // unchanged
    (2L, "bob", "CH"),    // changed attr
    (4L, "dave", "JP"))   // new key; 3 deleted
    .toDF("id", "name", "country")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toSeq

  test("one apply covers all four outcomes") {
    val h1 = Scd2.apply(Scd2.initHistory(day0, 0L), day1, Seq("id"), 100L)
    assert(rows(h1) === Seq(
      (1L, "alice", "US", 0L, None),        // unchanged, still open
      (2L, "bob", "DE", 0L, Some(100L)),    // closed at change
      (2L, "bob", "CH", 100L, None),        // new version
      (3L, "carol", "FR", 0L, Some(100L)),  // deleted → closed
      (4L, "dave", "JP", 100L, None)))      // insert
  }

  test("chained applies keep exactly one open row per live key and never touch closed rows") {
    val day2 = Seq(
      (2L, "bob", "DE"),   // reverts — new version, not a reopen
      (4L, "dave", "JP")).toDF("id", "name", "country")
    val h1 = Scd2.apply(Scd2.initHistory(day0, 0L), day1, Seq("id"), 100L)
    val h2 = Scd2.apply(h1, day2, Seq("id"), 200L)

    val open = h2.filter(col("valid_to").isNull)
    assert(open.groupBy("id").count().filter(col("count") > 1).count() === 0)
    assert(rows(open.withColumn("valid_to", lit(null).cast("bigint")))
      .map(_._1).sorted === Seq(2L, 4L))

    // rows closed by apply #1 are byte-identical in h2 (alice was open
    // through day1 and closes at 200 when day2 drops her)
    assert(rows(h2.filter(col("valid_to") === 100L)) === Seq(
      (2L, "bob", "DE", 0L, Some(100L)),
      (3L, "carol", "FR", 0L, Some(100L))))
    assert(rows(h2.filter(col("valid_to") === 200L)) === Seq(
      (1L, "alice", "US", 0L, Some(200L)),
      (2L, "bob", "CH", 100L, Some(200L))))

    // bob's history: DE[0,100) CH[100,200) DE[200,∞) — a revert is a
    // fresh version, intervals contiguous
    val bob = rows(h2.filter(col("id") === 2L))
    assert(bob === Seq(
      (2L, "bob", "DE", 0L, Some(100L)),
      (2L, "bob", "CH", 100L, Some(200L)),
      (2L, "bob", "DE", 200L, None)))
  }

  test("null keys match null-safely instead of churning every batch") {
    val h0 = Scd2.initHistory(
      Seq((Option.empty[java.lang.Long], "n", "XX")).toDF("id", "name", "country")
        .withColumn("id", col("id").cast("bigint")), 0L)
    val snap = Seq((Option.empty[java.lang.Long], "n", "XX")).toDF("id", "name", "country")
      .withColumn("id", col("id").cast("bigint"))
    val h1 = Scd2.apply(h0, snap, Seq("id"), 50L)
    assert(h1.count() === 1)
    assert(h1.filter(col("valid_to").isNull).count() === 1)
  }

  test("applyDelta: unmentioned keys stay open; tombstones close; equal upserts are no-ops") {
    val delta = Seq(
      (2L, "bob", "CH", false),   // changed upsert → version
      (3L, "carol", "FR", true),  // tombstone → close
      (1L, "alice", "US", false)) // equal upsert → no-op
      .toDF("id", "name", "country", "is_delete")
    val h1 = Scd2.applyDelta(Scd2.initHistory(day0, 0L), delta, Seq("id"),
      100L, Some("is_delete"))
    assert(rows(h1) === Seq(
      (1L, "alice", "US", 0L, None),
      (2L, "bob", "DE", 0L, Some(100L)),
      (2L, "bob", "CH", 100L, None),
      (3L, "carol", "FR", 0L, Some(100L))))

    // redelivering the same feed is idempotent for upserts; the
    // already-closed tombstone key has no open row so nothing happens
    val h2 = Scd2.applyDelta(h1, delta, Seq("id"), 200L, Some("is_delete"))
    assert(rows(h2) === Seq(
      (1L, "alice", "US", 0L, None),
      (2L, "bob", "DE", 0L, Some(100L)),
      (2L, "bob", "CH", 100L, None),
      (3L, "carol", "FR", 0L, Some(100L))))
  }

  test("applyDelta: tombstone for an unknown key emits nothing; delete+reinsert reopens") {
    val h1 = Scd2.applyDelta(Scd2.initHistory(day0, 0L),
      Seq((9L, "ghost", "XX", true)).toDF("id", "name", "country", "is_delete"),
      Seq("id"), 100L, Some("is_delete"))
    assert(h1.count() === 3)

    val h2 = Scd2.applyDelta(h1,
      Seq((3L, "carol", "FR", true)).toDF("id", "name", "country", "is_delete"),
      Seq("id"), 200L, Some("is_delete"))
    val h3 = Scd2.applyDelta(h2,
      Seq((3L, "carol", "FR", false)).toDF("id", "name", "country", "is_delete"),
      Seq("id"), 300L, Some("is_delete"))
    assert(rows(h3.filter(col("id") === 3L)) === Seq(
      (3L, "carol", "FR", 0L, Some(200L)),
      (3L, "carol", "FR", 300L, None)))
  }

  test("empty snapshot closes everything; empty history inserts everything") {
    val empty = day0.limit(0)
    val closedAll = Scd2.apply(Scd2.initHistory(day0, 0L), empty, Seq("id"), 9L)
    assert(closedAll.filter(col("valid_to").isNull).count() === 0)
    assert(closedAll.count() === 3)

    val inserted = Scd2.apply(Scd2.initHistory(empty, 0L), day1, Seq("id"), 9L)
    assert(rows(inserted).map(r => (r._1, r._4, r._5)) ===
      Seq((1L, 9L, None), (2L, 9L, None), (4L, 9L, None)))
  }

  test("asOf reconstructs any instant; boundary is inclusive-from, exclusive-to") {
    val applied = Scd2.apply(Scd2.initHistory(day0, 0L), day1, Seq("id"), 100L)
    def snap(ts: Long) = Scd2.asOf(applied, ts).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    // before the batch: the original table, exactly
    assert(snap(0L) === Seq((1L, "US"), (2L, "DE"), (3L, "FR")))
    assert(snap(99L) === Seq((1L, "US"), (2L, "DE"), (3L, "FR")))
    // at the batch instant (valid_to is exclusive, valid_from inclusive)
    assert(snap(100L) === Seq((1L, "US"), (2L, "CH"), (4L, "JP")))
    assert(snap(100L) === snap(5000L)) // open rows extend forever
    // asOf ≡ currentOf at any instant past the last batch
    assert(snap(5000L) ===
      Scd2.currentOf(applied).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq)
  }
}
