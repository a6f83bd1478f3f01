package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch contract (deterministic cases): exactness in the
  * collision-free regime, bounded cell table, zero-for-absent probes,
  * config validation. The randomized one-sided-error and mergeability
  * invariants live in [[CountMinProps]].
  */
class CountMinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def items(xs: Seq[String]): DataFrame = xs.toDF("item")

  private def estMap(stream: Seq[String], probes: Seq[String],
      cfg: CountMin.Config): Map[String, Long] = {
    val sk = CountMin.cells(items(stream), "item", cfg)
    CountMin.estimates(sk, items(probes.distinct), "item", cfg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wide sketch over few items is exact") {
    val stream = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma")
    val est = estMap(stream, Seq("alpha", "beta", "gamma"),
      CountMin.Config(depth = 4, width = 4096))
    assert(est === Map("alpha" -> 1L, "beta" -> 2L, "gamma" -> 3L))
  }

  test("absent probes estimate 0 against a wide sketch") {
    val est = estMap(Seq("alpha", "beta"), Seq("nothere"),
      CountMin.Config(depth = 4, width = 4096))
    assert(est === Map("nothere" -> 0L))
  }

  test("cell table is bounded by depth x width and sums to depth x N") {
    val cfg = CountMin.Config(depth = 3, width = 8)
    val stream = (1 to 100).map(i => s"tok${i % 13}")
    val cells = CountMin.cells(items(stream), "item", cfg).collect()
    assert(cells.length <= cfg.depth * cfg.width)
    assert(cells.map(_.getLong(2)).sum === cfg.depth.toLong * stream.size)
    // every depth row accounts for the full stream
    cells.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum === stream.size.toLong)
    }
  }

  test("config rejects non-power-of-two widths and zero depth") {
    intercept[IllegalArgumentException](CountMin.Config(depth = 0))
    intercept[IllegalArgumentException](CountMin.Config(width = 100))
    intercept[IllegalArgumentException](CountMin.Config(width = 1))
  }
}
