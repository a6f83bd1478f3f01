package graft.expressions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CharEntropySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def entropyOf(s: String): (Long, Double, Long) = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(CharEntropy(col("t")).as("e")).head().getSeq[Double](0)
    (r(0).toLong, r(1), r(2).toLong)
  }

  test("closed-form entropies") {
    assert(entropyOf("") === ((0L, 0.0, 0L)))
    val (n1, h1, d1) = entropyOf("aaaa") // single symbol: H = 0
    assert(n1 === 4L && h1 == 0.0 && d1 === 1L) // == : accept ±0.0
    val (n, h, d) = entropyOf("ab")
    assert(n === 2L && d === 2L)
    assert(math.abs(h - StrictMath.log(2.0)) < 1e-15) // two equiprobable
    // fold order: distinct code points ascending, acc -= p*ln(p)
    val (_, h2, _) = entropyOf("aab")
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    val expect = 0.0 - p1 * StrictMath.log(p1) - p2 * StrictMath.log(p2)
    assert(h2 === expect)
  }

  test("counts code points, not UTF-16 units") {
    val (n, _, d) = entropyOf("a😀a") // a, emoji, a
    assert(n === 3L && d === 2L)
  }

  test("low for runs, high for diverse text — the screen works") {
    val (_, hRun, _) = entropyOf("zzzzzzzzzzzzzzzzzzzz")
    val (_, hText, _) = entropyOf("the quick brown fox jumps")
    val (_, hBlob, _) = entropyOf("8f4aC2qLw9xKvB3tYp7dRn5mJh1g")
    assert(hRun < 0.1 && hText > 2.0 && hBlob > hText)
  }

  test("stays a pure projection inside codegen, null text safe") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(CharEntropy(coalesce(col("text"), lit(""))).as("e"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(out.count() > 0) // executes through the codegen path
  }
}
