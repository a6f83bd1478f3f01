package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EquiDepthSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vals: Seq[Double], k: Int, nSub: Int = 8) =
    EquiDepth.histogram(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
      "v", "id", k, nSub)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  /** flat reference: bucket of global rank i (0-based) = (i*k) div n */
  private def reference(vals: Seq[Double], k: Int) = {
    val sorted = vals.sorted.zipWithIndex
    sorted.groupBy { case (_, i) => i.toLong * k / vals.size }
      .toSeq.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.size.toLong, g.map(_._1).min, g.map(_._1).max) }
  }

  test("equal counts and tight ranges on a shuffled uniform run") {
    val vals = (0 until 100).map(i => ((i * 37) % 100).toDouble)
    val got = run(vals, 10)
    assert(got.toSeq === reference(vals, 10))
    assert(got.forall(_._2 == 10L))
    assert(got.map(_._1).toSeq === (0L until 10L))
  }

  test("non-divisible n: bucket sizes differ by at most one") {
    val vals = (0 until 103).map(i => math.sin(i) * 50)
    val got = run(vals, 10)
    assert(got.toSeq === reference(vals, 10))
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    assert(got.map(_._2).sum === 103L)
  }

  test("heavy ties split across buckets but boundaries stay exact") {
    val vals = Seq.fill(30)(5.0) ++ Seq.fill(10)(1.0) ++ Seq.fill(10)(9.0)
    val got = run(vals, 5)
    assert(got.toSeq === reference(vals, 5))
  }

  test("constant column degenerates to bucket-per-rank-slice") {
    val vals = Seq.fill(20)(7.0)
    val got = run(vals, 4)
    assert(got.toSeq === reference(vals, 4))
    assert(got.forall { case (_, n, lo, hi) => n == 5L && lo == 7.0 && hi == 7.0 })
  }

  test("nulls excluded; skewed sub-bucket distribution still exact") {
    val df = (Seq.fill(50)(Some(1e-9)) ++ (1 to 9).map(i => Some(i.toDouble))
        ++ Seq(None)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = EquiDepth.histogram(df, "v", "id", 4, nSub = 4)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sum === 59L)
  }

  test("single-partition work only on the sub-bucket count frame") {
    val df = (0 until 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val plan = EquiDepth.histogram(df, "v", "id", 10)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    def nodeDepth(l: String): Int =
      l.indexWhere(c => !" :+-*(0123456789)".contains(c))
    // every exchange that is not sub-keyed (the distributed window /
    // offset pre-aggregate) must consume an aggregated frame, never
    // raw rows — whether it kept the constant hash key or folded to
    // an explicit SinglePartition
    val tiny = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange SinglePartition") => i
      case (l, i) if "Exchange hashpartitioning\\(([^)]*)\\)".r
        .findFirstMatchIn(l).exists(!_.group(1).contains("sub#")) => i
    }
    tiny.foreach { i =>
      val d = nodeDepth(lines(i))
      val subtree = lines.drop(i + 1).takeWhile(nodeDepth(_) > d)
      val firstAgg = subtree.indexWhere(_.contains("HashAggregate"))
      val firstScan = subtree.indexWhere(l =>
        l.contains("LocalTableScan") || l.contains("Scan "))
      assert(firstAgg >= 0 && (firstScan < 0 || firstAgg < firstScan),
        s"an exchange single-partitions raw rows:\n$plan")
    }
    // extent and offsets ride broadcasts
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"extent/offsets must broadcast:\n$plan")
  }
}
