package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level duplicate-span detection on hand-built corpora where
  * the maximal shared runs are known exactly.
  */
class DupSpansSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def spansOf(docs: Seq[(Long, String)], k: Int = 3,
      minDf: Long = 2): Set[(Long, Long, Long, Long)] =
    DupSpans.spans(docs.toDF("doc_id", "text"), "doc_id", "text", k, minDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("a single shared run yields one maximal span per doc") {
    // docs share exactly "a b c d e f" (6 tokens); k=3 marks positions
    // covering the full run and nothing else
    val spans = spansOf(Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e f z"))
    assert(spans === Set(
      (1L, 1L, 6L, 6L), // run at doc start
      (2L, 3L, 8L, 6L))) // run offset by the x y prefix
  }

  test("disjoint shared runs stay separate spans; gaps split islands") {
    // doc 1 shares "a b c" with doc 2 and "x y z" with doc 3, separated
    // by unshared middles — two spans, not one
    val spans = spansOf(Seq(
      1L -> "a b c m1 m2 m3 x y z",
      2L -> "a b c n1 n2",
      3L -> "q1 q2 x y z"))
    assert(spans.filter(_._1 == 1L) ===
      Set((1L, 1L, 3L, 3L), (1L, 7L, 9L, 3L)))
  }

  test("runs shared with DIFFERENT partners merge into one span") {
    // doc 1's first half matches doc 2, second half matches doc 3, and
    // the halves overlap by k-1 tokens — every window is shared, so the
    // whole run is one maximal span (suffix-array merge semantics)
    val spans = spansOf(Seq(
      1L -> "p q r s t u",
      2L -> "p q r s c1 c2",
      3L -> "d1 d2 r s t u"))
    assert(spans.filter(_._1 == 1L) === Set((1L, 1L, 6L, 6L)))
  }

  test("no shared k-gram, no spans; docs shorter than k are safe") {
    val spans = spansOf(Seq(
      1L -> "a b c d",
      2L -> "e f g h",
      3L -> "x y")) // 2 tokens < k=3: zero postings, no error
    assert(spans.isEmpty)
  }

  test("null text yields no postings and no error") {
    val spans = DupSpans.spans(
        Seq((1L, "a b c d"), (2L, "a b c d"), (3L, null))
          .toDF("doc_id", "text"),
        "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSet
    assert(spans === Set(1L, 2L)) // the null doc simply contributes nothing
  }

  test("minDf above the actual sharing suppresses the span") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b c e")
    assert(spansOf(docs, minDf = 2).nonEmpty)
    assert(spansOf(docs, minDf = 3).isEmpty) // shared by only 2 docs
  }

  test("excise removes exactly the shared spans, keeps order, keeps all docs") {
    val out = DupSpans.excise(Seq(
        1L -> "u1 a b c d e u2 u3",   // shares "a b c d e" with doc 2
        2L -> "a b c d e",            // fully covered → empty text
        3L -> "x y z w v").toDF("doc_id", "text"),  // untouched
        "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) === (("u1 u2 u3", 5L)))
    assert(out(2L) === (("", 5L))) // present with empty text, not dropped
    assert(out(3L) === (("x y z w v", 0L)))
  }

  test("excise on null text returns an empty row, zero removed") {
    val out = DupSpans.excise(
        Seq((1L, null), (2L, "a b c"), (3L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) === (("", 0L)))
    assert(out(2L) === (("", 3L)))
  }

  test("within-doc repetition alone is NOT a cross-doc span") {
    // "a b c" appears twice inside doc 1 but in no other doc: df counts
    // DISTINCT docs, so nothing is marked
    val spans = spansOf(Seq(
      1L -> "a b c u v a b c",
      2L -> "m n o p q"))
    assert(spans.isEmpty)
  }
}
