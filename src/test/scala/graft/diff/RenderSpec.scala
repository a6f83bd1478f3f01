package graft.diff

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RenderSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val result: DiffResult = {
    val s1 = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "u", "v")
    val s2 = Seq((1L, "a", "x"), (2L, "B", "y"), (4L, "d", "w"))
      .toDF("id", "u", "v")
    DataColDiff.computeDataframeDiff(s1, s2, Seq("id"))
      .fold(mm => sys.error(mm.message), identity)
  }

  test("psql table renders the stats frame in the reference's tabulate style") {
    val table = Render.psqlTable(result.stats)
    val lines = table.linesIterator.toSeq
    // +---+---+ borders, | col | val | rows, aligned widths
    assert(lines.head.matches("\\+-+\\+-+\\+"), lines.head)
    assert(lines(1).contains("col_name") && lines(1).contains("mismatch_cnt"))
    assert(lines.count(_.startsWith("+")) === 3) // top, header sep, bottom
    assert(table.contains("| u"), s"expected the differing column row:\n$table")
    val widths = lines.map(_.length).distinct
    assert(widths.size === 1, s"ragged table:\n$table")
  }

  test("summary reports the same numbers the reference logs") {
    val s = Render.summary(result.counts)
    assert(s.contains("only in S1      : 1")) // id=3
    assert(s.contains("only in S2      : 1")) // id=4
    assert(s.contains("no diff    : 1"))      // id=1
    assert(s.contains("col diffs  : 1"))      // id=2 (u: b vs B)
    assert(s.contains("Total (outer join)   : 4"))
    assert(Render.report(result).contains("mismatch_cnt"))
  }

  test("diffAsJson renders CompColArr as parseable JSON (reference README usage)") {
    val row = Render.diffAsJson(result.diff)
      .filter($"id_s1" === 2L).select(DataColDiff.CompColArr)
      .head.getString(0)
    assert(row.contains("\"col_name\":\"u\""), row)
    assert(row.contains("\"s1_value\":\"b\"") && row.contains("\"s2_value\":\"B\""), row)
  }
}
