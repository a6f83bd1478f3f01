package graft.tables

import graft.SparkTestSession
import graft.tables.TxLog.{AddFile, ColStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `between` desugars to recognized >=/<= conjuncts — pruning applies. */
class StatsPredicateBetweenCheck extends AnyFunSuite {
  SparkTestSession.spark
  private val files = Seq(
    AddFile("a", 1L, Map("k" -> ColStats("long", "0", "99"))),
    AddFile("b", 1L, Map("k" -> ColStats("long", "200", "299"))))
  test("between prunes through its desugared conjuncts") {
    assert(StatsPredicate.prune(files, col("k").between(210, 250))
      .map(_.path) === Seq("b"))
    assert(StatsPredicate.prune(files, col("k").between(50, 250))
      .map(_.path) === Seq("a", "b"))
  }
}
