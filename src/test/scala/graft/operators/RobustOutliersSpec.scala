package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RobustOutliersSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact median/MAD and outlier count, k=3") {
    // g: values 1..7 plus a wild 1000.
    // n=8, rn=ceil(0.5*8)=4 -> med = 4th smallest = 4.0
    // devs sorted: 0,1,1,2,2,3,3,996 -> mad = 4th smallest = 2.0
    // threshold 3*2=6: only |1000-4|=996 exceeds -> n_out=1
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0))
      .map(("g", _)).toDF("grp", "v")
    val r = RobustOutliers.summary(df, "grp", "v").collect().head
    assert(r.getString(0) === "g")
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 4.0)
    assert(r.getDouble(3) === 2.0)
    assert(r.getLong(4) === 1L)
  }

  test("mean/sigma would mask what MAD catches") {
    // two huge values drag the mean ~250 and sigma ~430: a z-score
    // screen at 3 sigma flags NOTHING. med/mad still flags both.
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0, 1000.0)
    val df = vals.map(("g", _)).toDF("grp", "v")
    val r = RobustOutliers.summary(df, "grp", "v").collect().head
    assert(r.getLong(4) === 2L)
    val mean = vals.sum / vals.size
    val sigma = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum
      / vals.size)
    assert(!vals.exists(v => math.abs(v - mean) > 3 * sigma),
      "premise: the z-score screen is blind here")
  }

  test("nulls excluded; groups independent") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(5.0))).toDF("grp", "v")
    val got = RobustOutliers.summary(df, "grp", "v").orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // a: n=2 (null dropped), med = ceil(0.5*2)=1st smallest = 1.0
    assert(got.toSeq === Seq(("a", 2L, 1.0), ("b", 1L, 5.0)))
  }

  test("all-identical group: mad=0, no outliers") {
    val df = Seq.fill(5)(("g", 2.0)).toDF("grp", "v")
    val r = RobustOutliers.summary(df, "grp", "v").collect().head
    assert(r.getDouble(3) === 0.0 && r.getLong(4) === 0L)
  }

  test("one exchange: both rank passes and the rollup share the key") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    val plan = RobustOutliers.summary(df, "grp", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"windows and rollup must reuse one grp partitioning:\n$plan")
  }

  test("spread form is bit-identical to the windowed form") {
    // deterministic pseudo-random shapes: ties, negatives, spikes,
    // single-value groups, a group of one row
    val lcg = Iterator.iterate(99991L)(x => (x * 48271) % 2147483647)
      .drop(1).take(600).toSeq
    val rows = lcg.zipWithIndex.map { case (x, i) =>
      val g = s"g${x % 7}"
      val v = (x % 23) match {
        case 0 => 1e5 + i           // spikes
        case t if t < 5 => 4.0      // heavy ties
        case t => (t - 11).toDouble // negatives and positives
      }
      (g, v)
    } :+ ("lonely", 42.0)
    val df = rows.toDF("grp", "v").repartition(7)
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4))).toSeq
    assert(norm(RobustOutliers.summarySpread(df, "grp", "v", nSub = 4))
      === norm(RobustOutliers.summary(df, "grp", "v")))
  }

  test("spread form: no single-partition pass anywhere") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("h", 3.0)).toDF("grp", "v")
    val plan = RobustOutliers.summarySpread(df, "grp", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"every stage must stay group- or (group, sub)-keyed:\n$plan")
  }
}
