package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native membership counter must equal
  * `size(filter(arr, x -> x.isin(set...)))` — including duplicates
  * (each occurrence counts), null elements (never match), empty arrays,
  * and a null array (null in, null out).
  */
class CountInSetSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val set = Seq("the", "a", "of")

  test("hand cases incl. duplicates, nulls, misses") {
    val rows = Seq(
      Seq("the", "cat", "the", "a"), // duplicates each count: 3
      Seq("x", "y"),
      Seq.empty[String],
      Seq("of"),
      null
    ).toDF("arr")
      .select(
        CountInSet(col("arr"), set).as("fast"),
        size(filter(col("arr"), x => x.isin(set: _*))).as("ref"))
      .collect()
    val want = Seq(3, 0, 0, 1, null)
    rows.zip(want).foreach { case (r, w) =>
      if (w == null) { assert(r.isNullAt(0)); assert(r.isNullAt(1)) }
      else { assert(r.getInt(0) === w); assert(r.getInt(1) === w) }
    }
  }

  test("null elements never match, like the HOF's dropped null predicate") {
    val r = Seq(1).toDF("i")
      .select(CountInSet(
        array(lit("the"), lit(null).cast("string"), lit("a")), set).as("c"))
      .collect()(0)
    assert(r.getInt(0) === 2)
  }

  test("equals the HOF form on 300 random token arrays") {
    val rnd = new scala.util.Random(5) // fixed seed: reproducible
    val vocab = Seq("the", "a", "of", "and", "cat", "dog", "", "thé")
    val arrs = Seq.fill(300)(Seq.fill(rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.length))))
    arrs.toDF("arr")
      .select(
        CountInSet(col("arr"), set).as("fast"),
        size(filter(col("arr"), x => x.isin(set: _*))).as("ref"))
      .collect()
      .foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }
}
