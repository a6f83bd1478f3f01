package graft.text

import graft.SparkTestSession
import graft.tables.{CowTable, TxLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Bm25Table]]: the transactional table-backed BM25 index —
  * exactly-once folds (the catalog form's double-count gap), fold ≡
  * index-the-union, and crash healing via per-table stamps.
  */
class Bm25TableSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_bmt_").toFile
    try f(d.getAbsolutePath) finally rmrf(d)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  private def docs(ids: Range): DataFrame =
    ids.map(i => (i.toLong,
        s"alpha beta w$i x${i % 7} y${i % 3} " +
          (if (i % 2 == 0) "gamma gamma" else "delta")))
      .toDF("doc_id", "text")

  private val qt = Seq((0L, "gamma"), (0L, "delta"), (1L, "alpha"),
    (1L, "x3")).toDF("q_id", "term")

  private def served(root: String): Set[(Long, Int, Long, Double)] =
    Bm25Table.topDocs(spark, root, qt, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("fold-then-serve == index-the-union; replayed fold no-ops " +
      "instead of double-counting df/dl/stats") {
    withDir { dir =>
      val root = s"$dir/idx"
      Bm25Table.create(spark, root, docs(0 until 40), "doc_id", "text")
      val wave = docs(40 until 60)
      Bm25Table.fold(spark, root, wave, "doc_id", "text",
        txn = Some(TxLog.Txn("kw", 0L)))
      val clean = served(root)
      // union reference: the plain in-memory scorer over all 60 docs
      val ref = Bm25.topDocs(docs(0 until 60), "doc_id", "text", qt, 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(clean === ref, "fold-then-serve must equal index-the-union")

      // the REPLAY: same batch, same stamp — every table must no-op
      val dfBefore = CowTable.read(spark, s"$root/df")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val statsBefore = CowTable.read(spark, s"$root/stats").collect()(0)
      Bm25Table.fold(spark, root, wave, "doc_id", "text",
        txn = Some(TxLog.Txn("kw", 0L)))
      assert(CowTable.read(spark, s"$root/df")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        dfBefore, "replay double-counted df")
      assert(CowTable.read(spark, s"$root/stats").collect()(0).toSeq ===
        statsBefore.toSeq, "replay double-counted corpus stats")
      assert(served(root) === clean)
    }
  }

  test("crash healing: a fold whose prefix already applied completes " +
      "the remaining tables, never re-applies the prefix") {
    withDir { dir =>
      val root = s"$dir/idx2"
      Bm25Table.create(spark, root, docs(0 until 40), "doc_id", "text")
      val wave = docs(40 until 60)
      // simulate the crash window: the df merge (the fold's FIRST
      // table) landed under the stamp, then the process died
      val pdt = wave.select(col("doc_id"),
          explode(TextFeatures.words(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val deltaDf = pdt.groupBy("term").agg(count(lit(1)).as("df"))
      val b0 = deltaDf.agg(min("term"), max("term")).collect()(0)
      val curDf = CowTable.readOverlapping(spark, s"$root/df", "term",
          b0.getString(0), b0.getString(1))
        .join(deltaDf.select("term"), Seq("term"), "left_semi")
      CowTable.merge(spark, s"$root/df",
        curDf.select(col("term"), col("df")).unionByName(deltaDf)
          .groupBy("term").agg(sum("df").as("df")),
        Seq("term"), checkUniqueKeys = false,
        txn = Some(TxLog.Txn("kw", 0L)))
      // the recovery replay: df no-ops, stats/postings apply
      Bm25Table.fold(spark, root, wave, "doc_id", "text",
        txn = Some(TxLog.Txn("kw", 0L)))
      // healed index ≡ a clean one-shot index over the union
      val ref = Bm25.topDocs(docs(0 until 60), "doc_id", "text", qt, 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(served(root) === ref)
      // and the postings hold each (doc, term) exactly once
      assert(CowTable.read(spark, s"$root/postings")
        .groupBy("doc_id", "term").count()
        .filter(col("count") > 1).count() === 0L)
    }
  }

  test("delete-then-serve == index-the-remainder (exact integer " +
      "inverse); zero-df terms leave; replayed decrements no-op") {
    withDir { dir =>
      val root = s"$dir/idxd"
      Bm25Table.create(spark, root, docs(0 until 60), "doc_id", "text")
      // docs 0..9 carry unique w<i> terms; deleting them must remove
      // those terms from df entirely and shift every shared-term score
      val dead = docs(0 until 10)
      Bm25Table.delete(spark, root, dead, "doc_id", "text",
        txn = Some(TxLog.Txn("kwdel", 0L)))
      val ref = Bm25.topDocs(docs(10 until 60), "doc_id", "text", qt, 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(served(root) === ref,
        "delete-then-serve must equal index-the-remainder")
      // unique terms of the deleted docs left the df table
      assert(CowTable.read(spark, s"$root/df")
        .filter(col("term") === "w3").count() === 0L)
      // stats decremented exactly
      val st = CowTable.read(spark, s"$root/stats").collect()(0)
      assert(st.getLong(1) === 50L)
      // a REPLAYED delete: postings step no-ops naturally (no rows),
      // df/stats no-op on the stamp — nothing decrements twice
      Bm25Table.delete(spark, root, dead, "doc_id", "text",
        txn = Some(TxLog.Txn("kwdel", 0L)))
      assert(CowTable.read(spark, s"$root/stats").collect()(0)
        .getLong(1) === 50L)
      assert(served(root) === ref)
    }
  }

  test("serving plans the postings scan off the term zone maps") {
    withDir { dir =>
      val root = s"$dir/idx3"
      Bm25Table.create(spark, root, docs(0 until 200), "doc_id", "text",
        postingFiles = 8)
      val snap = TxLog.snapshot(spark, s"$root/postings")
      assert(snap.files.size >= 8)
      // a rare term living in one cluster range: the pruned read plans
      // a strict subset of the files
      val terms = Seq("x3")
      val covering = snap.files.count(
        _.stats.get("term").forall(s => terms.exists(s.mayContain)))
      assert(covering < snap.files.size,
        s"term clustering earned no pruning ($covering of " +
          s"${snap.files.size})")
    }
  }

  test("LSM delta df mode (round 16): folds append, deletes append " +
      "negatives, serving aggregates, compactDf folds back to one " +
      "row per term — all identical to the merge mode") {
    withDir { dir =>
      val (m, d) = (s"$dir/m", s"$dir/d")
      Seq(m, d).foreach(r =>
        Bm25Table.create(spark, r, docs(0 until 40), "doc_id", "text"))
      // two folds + a delete, replayed once each (exactly-once holds
      // for stamped appends like stamped merges)
      Seq(0, 1).foreach { b =>
        val wave = docs(40 + b * 10 until 50 + b * 10)
        Bm25Table.fold(spark, m, wave, "doc_id", "text",
          txn = Some(TxLog.Txn("kw", b.toLong)))
        Bm25Table.fold(spark, d, wave, "doc_id", "text",
          txn = Some(TxLog.Txn("kw", b.toLong)), dfDelta = true)
        Bm25Table.fold(spark, d, wave, "doc_id", "text",
          txn = Some(TxLog.Txn("kw", b.toLong)), dfDelta = true) // replay
      }
      val dels = docs(10 until 20)
      Bm25Table.delete(spark, m, dels, "doc_id", "text",
        txn = Some(TxLog.Txn("kwdel", 0L)))
      Bm25Table.delete(spark, d, dels, "doc_id", "text",
        txn = Some(TxLog.Txn("kwdel", 0L)), dfDelta = true)
      // the delta table holds ACCUMULATED rows (several per hot term)
      assert(CowTable.read(spark, s"$d/df").groupBy("term").count()
        .filter(col("count") > 1L).count() > 0L,
        "delta mode should have accumulated per-term rows")
      // ...yet serves exactly what the merge mode serves
      assert(served(d) === served(m))
      // a fully-deleted doc's unique term w15 sums to zero: filtered
      assert(Bm25Table.topDocs(spark, d,
        Seq((9L, "w15")).toDF("q_id", "term"), 3).count() === 0L)
      // compaction folds back to one row per term, zero-sums gone,
      // and serving is unchanged
      Bm25Table.compactDf(spark, d)
      val dfRows = CowTable.read(spark, s"$d/df")
      assert(dfRows.groupBy("term").count()
        .filter(col("count") > 1L).count() === 0L)
      assert(dfRows.filter(col("df") <= 0L).count() === 0L)
      assert(served(d) === served(m))
    }
  }
}
