package graft.operators

import graft.SparkTestSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("dirtied roster resolves every record to its true source") {
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val out = graft.queries.Relational.erMatch(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === cust.count())
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) - 10000000L,
        s"d_id ${r.getLong(0)} matched ${r.getLong(1)}")
      assert(r.getInt(2) <= 2)
    }
  }

  test("equal-distance candidates break ties toward the smaller id") {
    val dirty = Seq((100L, "abcd", 1)).toDF("id", "txt", "blk")
    val clean = Seq((7L, "abcX", 1), (3L, "abXd", 1), (9L, "zzzz", 1))
      .toDF("rid", "rtxt", "blk")
    val out = RecordLinkage.resolve(dirty, clean, Seq("blk"),
        "id", "txt", "rid", "rtxt").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L)   // dist 1 twice: min rid wins
    assert(out.head.getInt(2) === 1)
    assert(out.head.getLong(3) === 2L)   // candidate 9 is over threshold
  }

  test("records with no in-threshold candidate produce no row") {
    val dirty = Seq((1L, "aaaa", 1), (2L, "bbbb", 2)).toDF("id", "txt", "blk")
    val clean = Seq((10L, "aaab", 1), (20L, "zzzz", 2)).toDF("rid", "rtxt", "blk")
    val out = RecordLinkage.resolve(dirty, clean, Seq("blk"),
        "id", "txt", "rid", "rtxt").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("maxBlockSize drops oversized blocks and leaves the rest intact") {
    // block 1: 50 near-identical reference rows (the pathological
    // "default value" block); block 2: a well-behaved pair
    val clean = ((1 to 50).map(i => (i.toLong, "hotblock", 1)) :+
      (100L, "cool", 2)).toDF("rid", "rtxt", "blk")
    val dirty = Seq((1000L, "hotblocK", 1), (2000L, "coXl", 2))
      .toDF("id", "txt", "blk")
    def run(cap: Option[Long]) =
      RecordLinkage.resolve(dirty, clean, Seq("blk"), "id", "txt",
          "rid", "rtxt", RecordLinkage.Config(threshold = 2, maxBlockSize = cap))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncapped = run(None)
    assert(uncapped === Map(1000L -> 1L, 2000L -> 100L))
    val capped = run(Some(10))
    assert(capped === Map(2000L -> 100L)) // hot block gone, cool intact
    assert(run(Some(1000)) === uncapped)  // non-binding cap is identity
  }

  test("candidates lists exactly the in-threshold pairs") {
    val dirty = Seq((1L, "abc", 1)).toDF("id", "txt", "blk")
    val clean = Seq((10L, "abd", 1), (11L, "abc", 1), (12L, "xyz", 1),
      (13L, "abc", 2)).toDF("rid", "rtxt", "blk")
    val got = RecordLinkage.candidates(dirty, clean, Seq("blk"),
        "id", "txt", "rid", "rtxt", RecordLinkage.Config(threshold = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 12 is over threshold; 13 is in another block despite equal text
    assert(got === Set((1L, 10L, 1), (1L, 11L, 0)))
  }
}
