package graft.operators

import graft.SparkTestSession
import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class EwmaSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Long): Timestamp = new Timestamp(day * 86400000L)

  test("ewma_q == exact dyadic replay") {
    // a: 3 events on day 100, 2 on 99, 4 on 97; b: 1 on day 50
    val rows =
      Seq.fill(3)(("a", ts(100))) ++ Seq.fill(2)(("a", ts(99))) ++
        Seq.fill(4)(("a", ts(97))) ++ Seq(("b", ts(50)))
    val got = Ewma.dailyHalfLife(rows.toDF("event_type", "ts"),
        Seq("event_type"), col("ts"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a at day 100: 3 + 2/2 + 4/8 = 4.5 -> 4.5 * 2^20
    val wantA = (BigInt(3) * (BigInt(1) << 60) + BigInt(2) * (BigInt(1) << 59)
      + BigInt(4) * (BigInt(1) << 57)) / (BigInt(1) << 40)
    assert(got(0) === (("a", 100L, wantA.toLong)))
    assert(got(0)._3 === (4.5 * (1L << 20)).toLong)
    // b: a single day -> weight 1 exactly
    assert(got(1) === (("b", 50L, 1L << 20)))
  }

  test("days beyond the horizon truncate to zero contribution") {
    val rows = Seq(("a", ts(100)), ("a", ts(100 - Ewma.HorizonDays)),
      ("a", ts(100 - Ewma.HorizonDays + 1)))
    val r = Ewma.dailyHalfLife(rows.toDF("event_type", "ts"),
      Seq("event_type"), col("ts")).collect().head
    // day 41 (horizon edge, weight 2^-59) contributes 2^(60-59)=2 at
    // scale 2^60 -> 0 after div 2^40; day 40 is filtered entirely
    assert(r.getLong(2) === (1L << 20))
  }

  test("deterministic across repartitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(_ =>
      ("g" + rnd.nextInt(3), ts(80 + rnd.nextInt(40))))
    def run(p: Int) = Ewma.dailyHalfLife(
        rows.toDF("event_type", "ts").repartition(p),
        Seq("event_type"), col("ts"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(run(1) === run(17))
  }
}
