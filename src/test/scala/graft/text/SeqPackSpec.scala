package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeqPackSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], seqLen: Long, width: Long = 3) =
    SeqPack.packPlan(rows.toDF("id", "tok"), "id", "tok", seqLen, width)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("offsets are the exclusive prefix sum in id order, across buckets") {
    // width 3 → buckets {0,1,2}, {3,4}: the hierarchical path is live.
    val got = pack(Seq((0L, 10L), (1L, 5L), (2L, 7L), (3L, 2L), (4L, 6L)), 8)
    assert(got.map(_._3).toSeq === Seq(0L, 10L, 15L, 22L, 24L))
    // pack spans: doc0 [0,9]→packs 0-1, doc1 [10,14]→1, doc2 [15,21]→1-2,
    // doc3 [22,23]→2, doc4 [24,29]→3
    assert(got.map(g => (g._4, g._5)).toSeq ===
      Seq((0L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (3L, 3L)))
  }

  test("hierarchical result == flat single-window result on sparse ids") {
    // non-contiguous ids, empty buckets in between
    val rows = Seq(7L -> 4L, 23L -> 9L, 24L -> 1L, 100L -> 13L, 999L -> 2L)
    val got = pack(rows, 5, width = 10)
    var off = 0L
    val want = rows.sortBy(_._1).map { case (id, t) =>
      val s = off; off += t
      (id, t, s, s / 5, (s + math.max(t, 1) - 1) / 5)
    }
    assert(got.toSeq === want)
  }

  test("empty documents occupy no tokens but get a pack") {
    val got = pack(Seq((1L, 3L), (2L, 0L), (3L, 4L)), 4)
    assert(got.map(_._3).toSeq === Seq(0L, 3L, 3L))
    assert(got(1)._4 === 0L && got(1)._5 === 0L) // empty doc sits at off 3
  }

  test("packStats: every pack but the last is exactly full") {
    val docs = (0L until 40L).map(i => (i, (i % 7) + 1L)) // 155 tokens
    val packed = SeqPack.packPlan(docs.toDF("id", "tok"), "id", "tok", 50, 8)
    val stats = SeqPack.packStats(packed, 50)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(stats.dropRight(1).forall(_._3 == 50L))
    assert(stats.last._3 === 5L) // 155 - 3*50
    assert(stats.map(_._2).sum === 40L)
  }

  test("packStats omits interiors of a spanning doc; tail pack capped") {
    // doc0: 120 tokens at seqLen 50 → spans packs 0,1,2; doc1 starts in
    // pack 2 and pushes the stream to 130 (tail pack 2 fill = 30)
    val packed = SeqPack.packPlan(
      Seq((0L, 120L), (1L, 10L)).toDF("id", "tok"), "id", "tok", 50, 8)
    val stats = SeqPack.packStats(packed, 50)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pack 1 (pure interior of doc0, exactly full) is absent by contract
    assert(stats.toSeq === Seq((0L, 1L, 50L), (2L, 1L, 30L)))
  }

  test("guards reject nonpositive seqLen / bucketWidth") {
    val df = Seq((1L, 1L)).toDF("id", "tok")
    intercept[IllegalArgumentException](SeqPack.packPlan(df, "id", "tok", 0))
    intercept[IllegalArgumentException](
      SeqPack.packPlan(df, "id", "tok", 8, 0))
  }
}
