package graft.tables

import graft.SparkTestSession
import graft.tables.TxLog.{AddFile, ColStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[StatsPredicate]]: conservative manifest pruning for arbitrary
  * predicates — recognized conjuncts prune exactly, everything else
  * prunes nothing, and type mismatches never prune.
  */
class StatsPredicateSpec extends AnyFunSuite {

  SparkTestSession.spark // Column ASTs need no session, but be uniform

  private def f(name: String, stats: (String, ColStats)*): AddFile =
    AddFile(name, 10L, stats.toMap)

  private val files = Seq(
    f("a", "k" -> ColStats("long", "0", "99"),
      "s" -> ColStats("string", "aa", "mm")),
    f("b", "k" -> ColStats("long", "100", "199"),
      "s" -> ColStats("string", "mn", "zz")),
    f("c", "k" -> ColStats("long", "200", "299"),
      "v" -> ColStats("double", "1.5", "2.5")))

  private def names(cond: org.apache.spark.sql.Column): Seq[String] =
    StatsPredicate.prune(files, cond).map(_.path)

  test("recognized comparisons prune by range, both operand orders") {
    assert(names(col("k") === 150L) === Seq("b"))
    assert(names(lit(150L) === col("k")) === Seq("b"))
    // strict bounds are treated as inclusive (conservatism is free),
    // so the boundary file b [100,199] survives k > 199
    assert(names(col("k") > 199L) === Seq("b", "c"))
    assert(names(col("k") > 200L) === Seq("c"))
    assert(names(col("k") >= 199L) === Seq("b", "c"))
    assert(names(col("k") < 100) === Seq("a", "b")) // inclusive boundary
    assert(names(col("k") < 99) === Seq("a"))
    assert(names(lit(99) > col("k")) === Seq("a"))
    assert(names(col("s") >= "x") === Seq("b", "c")) // c has no s stats
  }

  test("conjunctions intersect; unrecognized conjuncts prune nothing") {
    assert(names(col("k") > 50L && col("k") < 250L) ===
      Seq("a", "b", "c"))
    assert(names(col("k") > 150L && col("k") < 180L) === Seq("b"))
    // the OR side contributes nothing, the simple side still prunes
    assert(names((col("s") === "q" || col("v") > 9.0d) &&
      col("k") >= 200L) === Seq("c"))
    // a UDF-ish expression alone: everything survives
    assert(names(length(col("s")) > 1) === Seq("a", "b", "c"))
  }

  test("type mismatches and strict-bound edges stay conservative") {
    // double literal against a long zone map: no pruning from it
    assert(names(col("k") > 1e9) === Seq("a", "b", "c"))
    // strict bounds treated as inclusive: boundary file kept
    assert(names(col("k") > 99L) === Seq("a", "b", "c"))
    // null literal: no pruning
    assert(names(col("k") === lit(null)) === Seq("a", "b", "c"))
    // NaN: never prunes doubles
    assert(names(col("v") === Double.NaN) === Seq("a", "b", "c"))
  }
}
