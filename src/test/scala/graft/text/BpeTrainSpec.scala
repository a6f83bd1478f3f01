package graft.text

import graft.SparkTestSession
import graft.expressions.ApplyMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer: the native greedy merge pass against a naive reference,
  * and the full trainer against a clean-room sequential BPE
  * implementation (same tokenizer, same tie-breaks).
  */
class BpeTrainSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // --- naive reference: greedy left-to-right merge over symbol lists

  private def naiveMerge(seq: String, l: String, r: String): String = {
    val syms = seq.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.mkString(" ")
  }

  /** Clean-room sequential word-internal BPE over a (word -> count)
    * table: per round count adjacent pairs weighted by word count, pick
    * (total desc, pair asc), merge greedily in every word.
    */
  private def naiveBpe(wordCounts: Map[String, Long],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var seqs = wordCounts.map { case (w, c) => w.map(_.toString).mkString(" ") -> c }
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[String, Long]
      for ((seq, c) <- seqs) {
        val syms = seq.split(" ", -1)
        for (i <- 0 until syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        }
      }
      val (pair, total) = pairCounts.toSeq
        .sortBy { case (p, t) => (-t, p) }.head
      val Array(l, rt) = pair.split(" ", 2)
      rules += ((r, l, rt, total))
      seqs = seqs.map { case (s, c) => naiveMerge(s, l, rt) -> c }
        .groupMapReduce(_._1)(_._2)(_ + _) // merged seqs could collide
    }
    rules.result()
  }

  test("ApplyMerge: greedy left-to-right, no overlap, hand cases") {
    val cases = Seq(
      ("a a a", "a", "a", "aa a"), // overlap skipped: textbook greedy
      ("a a a a", "a", "a", "aa aa"),
      ("b a a a", "a", "a", "b aa a"),
      ("l o w", "l", "o", "lo w"),
      ("x", "a", "b", "x"),
      ("", "a", "b", ""),
      ("a b a b", "a", "b", "ab ab"),
      ("ab b", "a", "b", "ab b"), // whole-symbol match only
      ("a ba", "a", "b", "a ba"))
    cases.foreach { case (in, l, r, want) =>
      val got = Seq(in).toDF("s")
        .select(ApplyMerge(col("s"), l, r)).collect()(0).getString(0)
      assert(got === want, s"'$in' merge ($l,$r)")
      assert(naiveMerge(in, l, r) === want, s"naive disagrees on '$in'")
    }
  }

  test("ApplyMerge equals the naive pass on 500 random sequences") {
    val rnd = new scala.util.Random(23) // fixed seed: reproducible
    val syms = Seq("a", "b", "ab", "c")
    (1 to 500).foreach { _ =>
      val seq = Seq.fill(rnd.nextInt(10))(syms(rnd.nextInt(syms.length)))
        .mkString(" ")
      val l = syms(rnd.nextInt(syms.length))
      val r = syms(rnd.nextInt(syms.length))
      val got = Seq(seq).toDF("s")
        .select(ApplyMerge(col("s"), l, r)).collect()(0).getString(0)
      assert(got === naiveMerge(seq, l, r), s"'$seq' merge ($l,$r)")
    }
  }

  test("merges equals sequential BPE on the classic corpus") {
    // Sennrich-style toy corpus: 'lo' then 'low' should emerge early
    val docs = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "low lower newest").toDF("text")
    val expect = {
      val toks = docs.collect().flatMap(_.getString(0).split(" "))
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
      naiveBpe(toks, 6)
    }
    val got = BpeTrain.merges(docs, "text", numMerges = 6, maxVocab = 256)
      .collect().map(r =>
        (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expect)
    spark.catalog.clearCache()
  }

  test("merges equals sequential BPE on 6 random corpora") {
    val rnd = new scala.util.Random(31) // fixed seed: reproducible
    (1 to 6).foreach { _ =>
      // words long enough that 4 rounds cannot starve; alphabet of 2
      // maximizes pair collisions and tie-breaks
      val vocabWords = Seq.fill(3 + rnd.nextInt(4))(
        Seq.fill(5 + rnd.nextInt(4))("ab" (rnd.nextInt(2))).mkString)
      val docs = Seq.fill(8)(
        Seq.fill(1 + rnd.nextInt(5))(
          vocabWords(rnd.nextInt(vocabWords.length))).mkString(" "))
        .toDF("text")
      val toks = docs.collect().flatMap(_.getString(0).split(" "))
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
      val expect = naiveBpe(toks, 4)
      val got = BpeTrain.merges(docs, "text", 4, 64).collect().map(r =>
        (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
      spark.catalog.clearCache()
      assert(got.toSeq === expect, s"corpus: $vocabWords")
    }
  }

  test("merges is partitioning-invariant") {
    val docs = Seq("aaa aab aaa", "aab aab baa", "aaa baa").toDF("text")
    val one = BpeTrain.merges(docs.coalesce(1), "text", 4, 64).collect().toSeq
    spark.catalog.clearCache()
    val many = BpeTrain.merges(docs.repartition(7), "text", 4, 64).collect().toSeq
    spark.catalog.clearCache()
    assert(one === many)
  }

  test("starved corpus fails loudly, not short") {
    val docs = Seq("a b c d").toDF("text") // all 1-char words: zero pairs
    val e = intercept[IllegalArgumentException] {
      BpeTrain.merges(docs, "text", 2, 64).collect()
    }
    assert(e.getMessage.contains("starved"))
    spark.catalog.clearCache()
  }

  test("segment applies the learned table, '|' blocks cross-token merges") {
    val docs = Seq((1L, "low lower"), (2L, "low")).toDF("doc_id", "text")
    val seg = BpeTrain.segment(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w")))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(seg(0) === "low | low e r")
    assert(seg(1) === "low")
  }
}
