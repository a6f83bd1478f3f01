package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SymDeleteJoin.writeIndex]]/[[SymDeleteJoin.resolveIndexed]]: the
  * persisted variant index returns IDENTICAL matches to the direct
  * join, and the recurring-probe contract holds — the bucketed index
  * scan feeds its join without a shuffle above it.
  */
class SymDeleteIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("indexed probe == direct resolve; index scan never re-shuffles") {
    import spark.implicits._
    val clean = Seq((1L, "alpha"), (2L, "alphq"), (3L, "beta"),
      (4L, "gamma"), (5L, "gamm")).toDF("rid", "rname")
    val probe = Seq((10L, "alpha"), (11L, "alph"), (12L, "gamma"),
      (13L, "delta")).toDF("lid", "lname")
    SymDeleteJoin.writeIndex(clean, "rid", "rname", d = 1,
      "graft_symdel_idx", numBuckets = 4)
    try {
      val got = SymDeleteJoin.resolveIndexed(spark, "graft_symdel_idx",
        probe, "lid", "lname", d = 1)
      val want = SymDeleteJoin.resolve(probe, clean,
        "lid", "lname", "rid", "rname", d = 1)
      assert(got.collect().map(_.toSeq).toSet ===
        want.collect().map(_.toSeq).toSet)

      // plan contract: the bucketed scan's ancestors up to its first
      // join contain no hash-repartition Exchange (the
      // IncrementalDedupSpec walk — depth from the tree markers)
      val plan = got.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      def depth(l: String): Int = {
        val i = l.indexOf("+- "); val j = l.indexOf(":- ")
        if (i < 0 && j < 0) 0
        else if (i < 0) j else if (j < 0) i else math.min(i, j)
      }
      val scans = lines.zipWithIndex
        .filter(_._1.contains("graft_symdel_idx")).filter(_._1.contains("Scan"))
      assert(scans.nonEmpty, s"expected a bucketed index scan:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan must read bucketed:\n$plan")
      scans.foreach { case (_, si) =>
        var d0 = depth(lines(si))
        var i = si - 1
        var metJoin = false
        while (i >= 0 && !metJoin) {
          val ld = depth(lines(i))
          if (ld >= 0 && ld < d0) {
            d0 = ld
            if (lines(i).contains("Join")) metJoin = true
            else assert(!lines(i).contains("Exchange hashpartitioning"),
              s"bucketed index scan re-shuffles before its join:\n$plan")
          }
          i -= 1
        }
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_symdel_idx")
    }
  }
}
