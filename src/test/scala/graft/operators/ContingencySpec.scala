package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ContingencySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-checkable 2x2 table; independent columns contribute 0") {
    // perfectly independent: every (a, b) cell = 25 of 100
    val ind = (0 until 100).map(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val flat = Contingency.table(ind, "x", "y").collect()
    spark.catalog.clearCache()
    assert(flat.length === 4)
    flat.foreach { r =>
      assert(r.getLong(2) === 25L)
      assert(r.getDouble(3) === 25.0)
      assert(r.getDouble(4) === 0.0)
    }

    // perfectly dependent: a0→b0 (30), a1→b1 (70); off-diagonal absent
    val dep = ((0 until 30).map(_ => ("a0", "b0")) ++
      (0 until 70).map(_ => ("a1", "b1"))).toDF("x", "y")
    val cells = Contingency.table(dep, "x", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    spark.catalog.clearCache()
    // e(a0,b0) = 30*30/100 = 9; contrib = (30*100-900)^2/(900*100)=49
    assert(cells(("a0", "b0")) === ((30L, 9.0, 49.0)))
    assert(cells(("a1", "b1")) === ((70L, 49.0, 9.0)))
  }
}
