package graft.similarity

import graft.SparkTestSession
import graft.tables.{CowTable, TxLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[IvfPqTable]]: the transactional table-backed IVFADC index —
  * exactly-once ingest (the catalog form's at-least-once gap),
  * served ≡ catalog-served results, and time-traveled serving.
  */
class IvfPqTableSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private val cfg = IvfPq.Config(cells = 4,
    pq = ProductQuant.Config(m = 2, codeK = 4, screenK = 10))

  private def vecs(ids: Range): DataFrame =
    ids.map(i => (i.toLong,
        Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat)))
      .toDF("vec_id", "embedding")

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivft_").toFile
    try f(d.getAbsolutePath) finally rmrf(d)
  }
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  test("txn-stamped appends: a replayed batch cannot duplicate rows") {
    withDir { dir =>
      val idx = s"$dir/idx"
      val model = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      val wave = vecs(60 until 90)
      IvfPqTable.append(spark, idx, wave, "vec_id", "embedding", dim,
        model, cfg, txn = Some(TxLog.Txn("ann", 0L)))
      val v = TxLog.latestVersion(spark, idx)
      // the retry: same batch, same stamp — must no-op entirely
      IvfPqTable.append(spark, idx, wave, "vec_id", "embedding", dim,
        model, cfg, txn = Some(TxLog.Txn("ann", 0L)))
      assert(TxLog.latestVersion(spark, idx) === v)
      assert(CowTable.read(spark, idx).count() === 90L)
      // a duplicate would displace a real k-th neighbor: top-k ids
      // stay distinct
      val got = IvfPqTable.topK(spark, idx, vecs(0 until 3),
        "vec_id", "embedding", dim, 5, cfg, Some(model))
      val perQ = got.groupBy("q_id")
        .agg(count(lit(1)).as("n"), countDistinct("n_id").as("d"))
        .collect()
      assert(perQ.forall(r => r.getLong(1) === r.getLong(2)))
    }
  }

  test("table-served == catalog-served; time travel serves the past") {
    withDir { dir =>
      val idx = s"$dir/idx2"
      spark.sql("DROP TABLE IF EXISTS ivft_cat")
      spark.sql("DROP TABLE IF EXISTS ivft_cat_model")
      val loc = new org.apache.hadoop.fs.Path(
        s"${spark.conf.get("spark.sql.warehouse.dir")}/ivft_cat")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
      val all = vecs(0 until 90)
      val model = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      IvfPqTable.append(spark, idx, vecs(60 until 90), "vec_id",
        "embedding", dim, model, cfg)
      // catalog form coded with the SAME frozen model over the union
      IvfPq.code(all, "vec_id", "embedding", dim, model, cfg)
        .write.partitionBy("cell").mode("overwrite").saveAsTable("ivft_cat")
      val q = vecs(0 until 3)
      val fromTable = IvfPqTable.topK(spark, idx, q, "vec_id",
        "embedding", dim, 5, cfg, Some(model)).collect().toSeq
      val fromCat = IvfPq.topKIndexed(spark, "ivft_cat", q, "vec_id",
        "embedding", dim, 5, cfg, Some(model)).collect().toSeq
      assert(fromTable.toSet === fromCat.toSet)
      // asOf v1 = the seed-only index: results exclude the wave
      val past = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, Some(model), asOfVersion = Some(1L))
        .select("n_id").collect().map(_.getLong(0))
      assert(past.forall(_ < 60L))
    }
  }

  test("delete removes vectors for good: never a neighbor again, " +
      "time travel still serves them, replay no-ops") {
    withDir { dir =>
      val idx = s"$dir/idxdel"
      val model = IvfPqTable.create(spark, idx, vecs(0 until 90),
        "vec_id", "embedding", dim, cfg)
      val q = vecs(0 until 5)
      val before = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, Some(model))
      // each query's own vector is its nearest neighbor — delete the
      // query ids and they must vanish from everyone's results
      val vBefore = TxLog.latestVersion(spark, idx)
      IvfPqTable.delete(spark, idx, (0L until 5L))
      val after = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, Some(model))
      assert(after.filter(col("n_id") < 5L).count() === 0L,
        "a deleted vector surfaced as a neighbor")
      assert(after.groupBy("q_id").count().collect()
        .forall(_.getLong(1) === 5L), "k results still served per query")
      // ≡ code-the-remainder with the same frozen model
      spark.sql("DROP TABLE IF EXISTS ivft_del_cat")
      val wloc = new org.apache.hadoop.fs.Path(
        s"${spark.conf.get("spark.sql.warehouse.dir")}/ivft_del_cat")
      val wfs = wloc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (wfs.exists(wloc)) { wfs.delete(wloc, true); () }
      IvfPq.code(vecs(5 until 90), "vec_id", "embedding", dim, model, cfg)
        .write.partitionBy("cell").mode("overwrite")
        .saveAsTable("ivft_del_cat")
      val refCat = IvfPq.topKIndexed(spark, "ivft_del_cat", q, "vec_id",
        "embedding", dim, 5, cfg, Some(model)).collect().toSet
      assert(after.collect().toSet === refCat)
      // time travel below the delete: the audit face still sees them
      assert(IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, Some(model), asOfVersion = Some(vBefore))
        .collect().toSet === before.collect().toSet)
      // replay: no rows match, no commit
      val v = TxLog.latestVersion(spark, idx)
      IvfPqTable.delete(spark, idx, (0L until 5L))
      assert(TxLog.latestVersion(spark, idx) === v)
    }
  }

  test("legacy flat _model migrates on retrain: the epoch-1 fallback " +
      "and the time-traveled serve both survive the upgrade") {
    withDir { dir =>
      val idx = s"$dir/idxleg"
      val m1 = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      // simulate a pre-versioning index: flatten _model/v1 into _model
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v1 = new org.apache.hadoop.fs.Path(s"$idx/_model/v1")
      fs.listStatus(v1).foreach { st =>
        fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
          s"$idx/_model/" + st.getPath.getName)); ()
      }
      fs.delete(v1, true)
      // legacy read path works...
      val q = vecs(0 until 3)
      val legacyServe = IvfPqTable.topK(spark, idx, q, "vec_id",
        "embedding", dim, 5, cfg).collect().toSet
      assert(legacyServe === IvfPqTable.topK(spark, idx, q, "vec_id",
        "embedding", dim, 5, cfg, Some(m1)).collect().toSet)
      val vBefore = TxLog.latestVersion(spark, idx)
      // ...and a retrain MIGRATES the flat files into v1 before
      // writing its own epoch (writing beside them would corrupt the
      // fallback with parquet files at two directory depths)
      IvfPqTable.retrain(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg.copy(cells = 5))
      assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/_model"))
        .exists(_.isFile), "flat legacy files must have migrated")
      // time travel below the retrain serves with the MIGRATED books
      assert(IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, asOfVersion = Some(vBefore)).collect().toSet ===
        legacyServe)
    }
  }

  test("retrain versions the model: time travel across the retrain " +
      "boundary decodes with the OLD books; a lost epoch fails loudly") {
    withDir { dir =>
      val idx = s"$dir/idx3"
      val q = vecs(0 until 3)
      val m1 = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      IvfPqTable.append(spark, idx, vecs(60 until 90), "vec_id",
        "embedding", dim, m1, cfg)
      val vBefore = TxLog.latestVersion(spark, idx)
      // pre-retrain answer under the epoch-1 model, pinned
      val before = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg).collect().toSet

      val m2 = IvfPqTable.retrain(spark, idx, vecs(0 until 90),
        "vec_id", "embedding", dim,
        cfg.copy(cells = 5)) // genuinely different books
      val vAfter = TxLog.latestVersion(spark, idx)
      assert(IvfPqTable.modelEpoch(spark, idx) === vAfter)
      assert(IvfPqTable.modelEpoch(spark, idx, Some(vBefore)) === 1L)

      // time travel BELOW the retrain: epoch-1 model resolves — the
      // served result is bit-identical to the pre-retrain serve (the
      // single-mutable-_model bug decoded these codes with m2's books)
      val past = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, asOfVersion = Some(vBefore)).collect().toSet
      assert(past === before)

      // head serves the retrained index under m2's books, ≡ explicit
      val head = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg).collect().toSet
      val headExplicit = IvfPqTable.topK(spark, idx, q, "vec_id",
        "embedding", dim, 5, cfg, Some(m2)).collect().toSet
      assert(head === headExplicit)

      // crash window: a retrain commit whose epoch dir is gone must
      // fail LOUDLY at resolve, never decode with another epoch
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_model/v$vAfter"),
        true)
      val e = intercept[RuntimeException] {
        IvfPqTable.readModel(spark, idx)
      }
      assert(e.getMessage.contains("no model for epoch"), e.getMessage)
    }
  }

  test("epoch validation: an append holding pre-retrain books fails " +
      "loudly BEFORE writing anything") {
    withDir { dir =>
      val idx = s"$dir/idxep"
      val m1 = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      // a model and its reopened epoch hash EQUAL (parquet round-trip)
      assert(IvfPq.modelHash(m1) ===
        IvfPq.modelHash(IvfPqTable.readModel(spark, idx)))
      val m2 = IvfPqTable.retrain(spark, idx, vecs(0 until 90),
        "vec_id", "embedding", dim, cfg)
      val vHead = TxLog.latestVersion(spark, idx)
      // the ingest stream still holds m1 — its append must be refused
      val e = intercept[IllegalArgumentException] {
        IvfPqTable.append(spark, idx, vecs(90 until 100), "vec_id",
          "embedding", dim, m1, cfg)
      }
      assert(e.getMessage.contains("NOT the epoch in force"), e.getMessage)
      assert(TxLog.latestVersion(spark, idx) === vHead, "nothing committed")
      // the retrain-returned model appends and serves fine
      IvfPqTable.append(spark, idx, vecs(90 until 100), "vec_id",
        "embedding", dim, m2, cfg)
      val got = IvfPqTable.topK(spark, idx, vecs(0 until 2), "vec_id",
        "embedding", dim, 5, cfg)
      assert(got.count() === 10L)
    }
  }

  test("epoch race: an old-epoch append landing ABOVE a retrain fails " +
      "the head serve loudly; time travel below the retrain still works") {
    withDir { dir =>
      val idx = s"$dir/idxrace"
      val m1 = IvfPqTable.create(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      val q = vecs(0 until 2)
      val vSeed = TxLog.latestVersion(spark, idx)
      IvfPqTable.retrain(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      // forge the race window: exactly the commit a concurrent ingest
      // stream would publish — rows coded under m1, stamped epoch 1,
      // landing after the retrain (append() validated BEFORE the
      // retrain won the version CAS)
      CowTable.append(spark, idx,
        IvfPq.code(vecs(90 until 95), "vec_id", "embedding", dim, m1, cfg),
        meta = Some(Map(IvfPqTable.EpochMetaKey -> "1")))
      val e = intercept[RuntimeException] {
        IvfPqTable.topK(spark, idx, q, "vec_id", "embedding", dim, 5, cfg)
      }
      assert(e.getMessage.contains("coded under model epoch"), e.getMessage)
      // the audit face below the retrain is untouched by the bad append
      val past = IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg, asOfVersion = Some(vSeed))
      assert(past.count() === 10L)
      // heal path: retrain re-codes everything and the head serves again
      IvfPqTable.retrain(spark, idx, vecs(0 until 60),
        "vec_id", "embedding", dim, cfg)
      assert(IvfPqTable.topK(spark, idx, q, "vec_id", "embedding",
        dim, 5, cfg).count() === 10L)
    }
  }
}
