package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SortedNeighborhoodSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("globalRank equals the single-window global sort rank") {
    val df = (0L until 500L).map(i => (i, s"k${(i * 37) % 500}%03d"))
      .toDF("id", "k")
    val got = SortedNeighborhood
      .globalRank(df, Seq(col("k"), col("id")))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = df
      .withColumn("rank",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long")
          - 1L)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === want)
  }

  test("a record with a corrupted blocking key is invisible to equality " +
      "blocking but resolved by the window") {
    val right = Seq(
      (1L, "Entity#001", "north"), (2L, "Entity#002", "north"),
      (3L, "Entity#003", "south"), (4L, "Entity#004", "south"))
      .toDF("rid", "rname", "region")
    // the typo hits the BLOCKING column (region), not the name tail
    val left = Seq((101L, "Entity#0O3", "oops"))
      .toDF("lid", "lname", "region")

    val blocked = RecordLinkage.resolve(left, right, Seq("region"),
      "lid", "lname", "rid", "rname", RecordLinkage.Config(threshold = 2))
    assert(blocked.count() === 0, "equality blocking was supposed to miss")

    val windowed = SortedNeighborhood.resolve(left, right,
      "lid", "lname", expr("right(lname, 3)"),
      "rid", "rname", expr("right(rname, 3)"),
      SortedNeighborhood.Config(window = 3, threshold = 2))
    spark.catalog.clearCache()
    val rows = windowed.collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(1) === 3L, "must match Entity#003")
    assert(rows.head.getInt(2) === 1, "edit distance of the O/0 typo")
  }

  test("window semantics: a pair w-1 apart is compared, w apart is not") {
    // sort keys place the left probe at rank 0 and rights at 1,2,3...;
    // texts identical so any compared pair matches at distance 0
    val left = Seq((100L, "same", "a")).toDF("lid", "ltxt", "k")
    val right = (1L to 5L).map(i => (i, "same", s"b$i"))
      .toDF("rid", "rtxt", "k")
    val out = SortedNeighborhood.resolve(left, right,
        "lid", "ltxt", col("k"), "rid", "rtxt", col("k"),
        SortedNeighborhood.Config(window = 3, threshold = 0))
      .collect()
    spark.catalog.clearCache()
    assert(out.length === 1)
    // ranks: left=0, rights 1..5 → window 3 compares ranks 1 and 2 only
    assert(out.head.getLong(3) === 2L,
      s"exactly rights at rank distance 1 and 2, got n_cand=${out.head.getLong(3)}")
    assert(out.head.getLong(1) === 1L, "argmin tie-break by id")
  }
}
