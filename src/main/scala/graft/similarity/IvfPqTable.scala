package graft.similarity

import graft.tables.{CowTable, TxLog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVFADC index backed by a transactional [[CowTable]] — the
  * exactly-once form of [[IvfPq.writeIndex]]'s plain catalog table,
  * closing the documented at-least-once hole of
  * [[graft.streaming.AnnIngestStream]]: index appends are Txn-stamped
  * per ingest batch, so a sink retry or checkpoint replay no-ops
  * instead of duplicating coded rows (a duplicate displaces a real
  * k-th neighbor). The index inherits the whole table surface for
  * free — time travel (serve yesterday's index), DESCRIBE HISTORY of
  * every ingest batch, restore, vacuum, provenance.
  *
  * Layout: hive-partitioned by `cell` with `cell` zone maps, so
  * serving reads ONLY the probed cells' files — the same
  * partition-pruned scan the catalog form gets, planned off the
  * manifest (one file-list filter per probed cell; nProbe × queries
  * distinct cells, a handful). The frozen codebooks ride INSIDE the
  * table root as a `_model` parquet (vacuum walks `data/` only and
  * never touches it); retrain = rewrite `_model` + [[CowTable.optimize]]
  * to re-code, both auditable commits.
  */
object IvfPqTable {

  /** Train on `vectors` (the seed epoch), create the table-backed
    * index, and pin the model under `<path>/_model`. Returns the
    * frozen model for subsequent [[append]]s.
    */
  def create(spark: SparkSession, path: String, vectors: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      cfg: IvfPq.Config = IvfPq.Config()): IvfPq.Model = {
    val prep = IvfPq.prepare(vectors, idCol, vecCol, cfg).persist()
    val model = IvfPq.fitModel(prep, dim, cfg)
    CowTable.create(spark, path, IvfPq.coded(prep, model, dim, cfg),
      Seq("cell"), partitionBy = Seq("cell"))
    prep.unpersist(blocking = false)
    writeModel(spark, path, model)
    model
  }

  /** Code a new batch with the frozen model and append it atomically;
    * `txn` makes the ingest exactly-once (the [[CowTable.append]]
    * stamp contract).
    */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String, dim: Int, model: IvfPq.Model,
      cfg: IvfPq.Config = IvfPq.Config(),
      txn: Option[TxLog.Txn] = None): Unit =
    CowTable.append(spark, path,
      IvfPq.code(batch, idCol, vecCol, dim, model, cfg), txn = txn)

  /** Serve a query batch: probes from the (re)read model, then a scan
    * of ONLY the probed cells' files — one manifest-pruned read per
    * probed cell (each file carries exact point `cell` bounds, so a
    * file joins exactly one cell's read). `asOfVersion` serves a
    * TIME-TRAVELED index — yesterday's neighbors, for free.
    */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      cfg: IvfPq.Config = IvfPq.Config(),
      model: Option[IvfPq.Model] = None,
      asOfVersion: Option[Long] = None): DataFrame = {
    require(cfg.pq.screenK >= k, "screenK must be >= k")
    val m = model.getOrElse(readModel(spark, path))
    val probeSet = IvfPq.probes(
      IvfPq.prepare(queries, idCol, vecCol, cfg), m, dim, cfg).persist()
    val cells = probeSet.select("cell").distinct().collect()
      .map(_.getLong(0)).sorted
    // empty query batch → empty probe set → no cells to read
    val codedDocs =
      if (cells.isEmpty) CowTable.read(spark, path, asOfVersion).limit(0)
      else cells.map(c => CowTable.readOverlapping(spark, path,
          "cell", c.toString, c.toString, asOfVersion))
        .reduce(_ unionByName _)
    IvfPq.search(codedDocs, probeSet, k, cfg)
  }

  /** Reopen the pinned model (doubles round-trip parquet exactly —
    * the [[IvfPq.readModel]] bit-reproducibility contract).
    */
  def readModel(spark: SparkSession, path: String): IvfPq.Model = {
    val rows = spark.read.parquet(s"$path/_model")
      .select("part", "cid", "cv").collect()
      .map(r => (r.getInt(0), KMeans.Centroid(r.getLong(1),
        r.getSeq[Double](2).toArray,
        KMeans.leftFoldSq(r.getSeq[Double](2).toArray))))
    val coarse = rows.filter(_._1 == -1).map(_._2).sortBy(_.cid).toSeq
    val books = rows.filter(_._1 >= 0).groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).sortBy(_.cid).toSeq)
    IvfPq.Model(coarse, books)
  }

  private def writeModel(spark: SparkSession, path: String,
      model: IvfPq.Model): Unit = {
    import spark.implicits._
    (model.coarse.map(c => (-1, c.cid, c.cv.toSeq)) ++
      model.books.zipWithIndex.flatMap { case (cents, s) =>
        cents.map(c => (s, c.cid, c.cv.toSeq))
      }).toDF("part", "cid", "cv")
      .write.mode("overwrite").parquet(s"$path/_model")
  }
}
