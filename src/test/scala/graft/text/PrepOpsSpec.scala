package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination / PII scrub / chunking unit tests on hand-built
  * fixtures (the driver oracle at sf0.01 covers the real corpus).
  */
class PrepOpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- decontam

  test("decontam: counts DISTINCT shared 3-grams, flags at the threshold") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // eval grams: {alpha beta gamma, beta gamma delta}
    val train = Seq(
      // shares both eval grams, one of them REPEATED — still counts 2
      (1L, "alpha beta gamma delta x alpha beta gamma"),
      // shares exactly one gram
      (2L, "zz alpha beta gamma yy"),
      // same words, different order — no shared 3-gram → absent
      (3L, "gamma beta alpha delta omega")).toDF("doc_id", "text")
    val out = Decontam.overlap(train, eval, "doc_id", "text",
        n = 3, minSharedGrams = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getLong(1) === 2 && out(0).getInt(2) === 1)
    assert(out(1).getLong(1) === 1 && out(1).getInt(2) === 0)
  }

  test("decontam: clean corpus against empty-overlap eval returns no rows") {
    val eval = Seq((9L, "qq ww ee rr")).toDF("doc_id", "text")
    val train = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    assert(Decontam.overlap(train, eval, "doc_id", "text").count() === 0)
  }

  test("bloom decontam: identical output to the broadcast path") {
    // a corpus large enough that the bloom actually rejects most grams
    val eval = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "one two three four five")).toDF("doc_id", "text")
    val train = (1L to 60L).map { i =>
      val filler = (0 until 10).map(j => s"w${i}x$j").mkString(" ")
      val planted =
        if (i % 7 == 0) " alpha beta gamma" // 1 shared gram
        else if (i % 11 == 0) " one two three four" // 2 shared grams
        else ""
      (i, filler + planted)
    }.toDF("doc_id", "text")
    val exact = Decontam.overlap(train, eval, "doc_id", "text",
      n = 3, minSharedGrams = 2).orderBy("doc_id").collect().toSeq
    val bloom = Decontam.overlapBloom(train, eval, "doc_id", "text",
      n = 3, minSharedGrams = 2).orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // the comparison must not be vacuous
  }

  test("bloom decontam: might_contain prefilter sits in the plan") {
    val eval = Seq((9L, "aa bb cc dd")).toDF("doc_id", "text")
    val train = Seq((1L, "aa bb cc xx yy zz")).toDF("doc_id", "text")
    val plan = Decontam.overlapBloom(train, eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"corpus postings must pass the codegen'd Bloom probe pre-join:\n$plan")
  }

  // ------------------------------------------------------------------ pii

  test("pii scrub: replaces emails, ips, phones; counts each type") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org and carol@web.io now"),
      (2L, "from 192.168.0.17 to 10.0.255.3 call +1-555-0199"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = PiiScrub.redact(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 2) // emails
    assert(out(0).getString(4) === "mail <EMAIL> and <EMAIL> now")
    assert(out(1).getLong(2) === 2) // ips
    assert(out(1).getLong(3) === 1) // phones
    assert(out(1).getString(4) === "from <IP> to <IP> call <PHONE>")
    assert(out(2).getLong(1) === 0 && out(2).getLong(2) === 0 &&
      out(2).getLong(3) === 0)
    assert(out(2).getString(4) === "nothing sensitive here")
  }

  test("pii scrub: ip pass does not eat email domains") {
    val df = Seq((1L, "x user@host42.example.com y")).toDF("doc_id", "text")
    val r = PiiScrub.redact(df, "doc_id", "text").head()
    assert(r.getLong(1) === 1 && r.getLong(2) === 0)
    assert(r.getString(4) === "x <EMAIL> y")
  }

  // --------------------------------------------------------------- chunks

  test("chunker: overlapping windows cover every token, exact chunk count") {
    // 10 tokens, chunkSize 4, stride 3 → 1 + ceil(6/3) = 3 chunks
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Chunker.chunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    // chunks: [t0..t3], [t3..t6], [t6..t9] — 4 tokens each
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L))
    // hash of the known middle chunk text
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("t3 t4 t5 t6".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1).getString(3) === md)
  }

  test("chunker: short and exact-fit documents give one chunk") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Chunker.chunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 4L))
  }

  test("chunker: last partial window keeps the tail tokens") {
    // 6 tokens, size 4, stride 3 → chunks [t0..t3], [t3..t5] (3 tokens)
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val out = Chunker.chunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.length === 2)
    assert(out(1).getLong(2) === 3L)
  }
}
