package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOrderSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def input(n: Int) =
    (0 until n).map(i => (i.toLong, i % 3)).toDF("id", "band")

  test("two-level scan equals the global row_number definition") {
    val df = input(500)
    val got = CorpusOrder.orderPlan(df, "id", col("band"), nSub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // naive driver-side reference: sort by (stage, h, id) globally
    val h = got.map(_._1).map { id =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"order:$id".getBytes("UTF-8"))
      id -> java.lang.Long.parseLong(
        md5.take(4).map(b => f"$b%02x").mkString, 16)
    }.toMap
    val expect = got.sortBy { case (id, st, _) => (st, h(id), id) }
      .zipWithIndex.map { case ((id, st, _), i) => (id, st, i.toLong) }
    assert(got.sortBy(_._3).toSeq === expect.toSeq)
  }

  test("positions are contiguous [0, N) and stages are ordered blocks") {
    val rows = CorpusOrder.orderPlan(input(300), "id", col("band"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._2)
    assert(rows.map(_._2).toSeq === (0L until 300L))
    // stage sequence must be non-decreasing along pos
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
  }

  test("assignment is partitioning-invariant") {
    val a = CorpusOrder.orderPlan(input(200), "id", col("band"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = CorpusOrder.orderPlan(input(200).repartition(13), "id",
      col("band")).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b)
  }

  test("corpus crosses one hash exchange; bucket frame broadcasts") {
    val plan = CorpusOrder.orderPlan(input(50), "id", col("band"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"bucket offsets must broadcast:\n$plan")
    val bigExchanges = "Exchange hashpartitioning\\(stage[^)]*, sub"
      .r.findAllIn(plan).length
    assert(bigExchanges >= 1, s"expected the (stage, sub) exchange:\n$plan")
  }

  test("nSub must be a power of two") {
    intercept[IllegalArgumentException] {
      CorpusOrder.orderPlan(input(5), "id", col("band"), nSub = 100)
    }
  }
}
