package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GroupedNtileSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def cleanup(): Unit = spark.catalog.clearCache()

  test("buckets equal the single-window formulation on skewed groups") {
    // one dominant group (the real-corpus language skew), two small
    val rows = (0L until 900L).map(i => ("en", i * 7 % 991, i)) ++
      (0L until 60L).map(i => ("de", i * 13 % 97, i + 1000L)) ++
      (0L until 7L).map(i => ("fr", i, i + 2000L))
    val df = rows.toDF("lang", "score", "id")
    val got = GroupedNtile.bucketPlan(df, "lang", Seq(col("score")), "id", 3)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("lang").orderBy(col("score"), col("id"))
    val want = df
      .withColumn("lr", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy("lang")))
      .select(col("id"), expr("(lr * 3) div n").as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    cleanup()
  }

  test("bucket sizes differ by at most one within each group") {
    val df = (0L until 1001L).map(i => ("g", i * 31 % 4099, i))
      .toDF("g", "s", "id")
    val sizes = GroupedNtile.bucketPlan(df, "g", Seq(col("s")), "id", 4)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, sizes)
    cleanup()
  }

  test("frozen boundaries label the reference exactly like the rank plan") {
    val rows = (0L until 900L).map(i => ("en", i * 7 % 991, i)) ++
      (0L until 60L).map(i => ("de", i * 13 % 97, i + 1000L)) ++
      (0L until 7L).map(i => ("fr", i, i + 2000L))
    val df = rows.toDF("lang", "score", "id")
    val want = GroupedNtile.bucketPlan(df, "lang", Seq(col("score")), "id", 3)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val cuts = GroupedNtile.boundaries(df, "lang", col("score"), "id", 3)
    val got = GroupedNtile
      .applyBoundaries(df, cuts, "lang", col("score"), "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === want)
    cleanup()
  }

  test("boundaries label NEW rows; an unseen group gets bucket 0") {
    val ref = (0L until 90L).map(i => ("en", i, i)).toDF("lang", "score", "id")
    val cuts = GroupedNtile.boundaries(ref, "lang", col("score"), "id", 3)
    // cuts at score 30 and 60: below → 0, inside → 1, top / beyond → 2
    val fresh = Seq(("en", 5L, 900L), ("en", 45L, 901L), ("en", 200L, 902L),
      ("zz", 1L, 903L)).toDF("lang", "score", "id")
    val got = GroupedNtile
      .applyBoundaries(fresh, cuts, "lang", col("score"), "id")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got === Map(900L -> 0L, 901L -> 1L, 902L -> 2L, 903L -> 0L))
    cleanup()
  }

  test("a group smaller than n uses only the leading buckets") {
    val df = Seq(("g", 5L, 1L), ("g", 3L, 2L)).toDF("g", "s", "id")
    val got = GroupedNtile.bucketPlan(df, "g", Seq(col("s")), "id", 3)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    // 2 rows, 3 buckets: (0*3) div 2 = 0, (1*3) div 2 = 1 — bucket 2 empty
    assert(got === Map(2L -> 0L, 1L -> 1L))
    cleanup()
  }
}
