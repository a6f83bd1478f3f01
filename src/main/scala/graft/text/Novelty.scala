package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document NOVELTY under a corpus order: the fraction of a
  * document's distinct shingles whose FIRST occurrence in the corpus is
  * this document. The marginal-contribution signal dedup scores miss:
  * a document can clear every near-dup gate yet add almost nothing new
  * (its shingles all appeared, scattered, across earlier documents —
  * the recombined-aggregator case), and conversely a late crawl of a
  * mostly-duplicated site still gets credit for its genuinely new
  * sections. Curation uses it to rank sources by marginal value and to
  * cut ingestion once novelty-per-document collapses.
  *
  * Exact, not sketched: first ownership is `min(order)` per shingle —
  * a map-side-combinable aggregate over the hashed postings (the
  * inverted index [[graft.dedup.NgramJaccard]] self-joins, but folded
  * once, never paired). Cost is O(postings) + one postings-keyed join
  * back; no stage depends on group sizes or document frequencies, so
  * boilerplate shingles cost their posting count and nothing more —
  * the shape survives 100 TB where the pairwise index would fan out.
  *
  * The order column must be a total order (ties would make "first"
  * ambiguous across runs); ingest ids are the natural choice. The
  * 60-bit md5 shingle keys share [[graft.dedup.NgramJaccard]]'s
  * collision posture (and the oracle hashes identically).
  */
object Novelty {

  /** (doc_id, n_shingles, n_new, novelty) for every input row —
    * documents shorter than `shingleSize` tokens score (0, 0, 0.0).
    * `novelty = n_new / n_shingles` is one IEEE division.
    *
    * `orderCol` defaults to the id itself; pass e.g. a crawl timestamp
    * disambiguated by id (`struct(ts, id)` won't fold into `min` here —
    * re-key to a single orderable column) to score a different order.
    */
  def noveltyPlan(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, orderCol: Option[Column] = None): DataFrame = {
    val ord = orderCol.getOrElse(col(idCol))
    // persisted: the postings feed the first-owner aggregate AND the
    // join back (the NgramJaccard note); released with the query.
    val posts = docs
      .select(col(idCol).as("doc_id"), ord.as("_ord"),
        explode(textShingles(col(textCol), shingleSize)).as("sh0"))
      .select(col("doc_id"), col("_ord"), md5PrefixLong(col("sh0"), 15).as("sh"))
      .persist()
    val first = posts.groupBy("sh").agg(min("_ord").as("_first"))
    val perDoc = posts.join(first, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_ord") === col("_first"), 1L).otherwise(0L))
          .as("n_new"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_new").cast("double") / col("n_shingles"), lit(0.0d))
          .as("novelty"))
  }

  /** The standing first-seen index `(sh, first_ord)`: one row per
    * distinct corpus shingle with the earliest order value that
    * carries it — the persisted artifact a recurring ingest screens
    * against (the [[graft.text.Bm25]] standing-table discipline).
    */
  def index(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, orderCol: Option[Column] = None): DataFrame = {
    val ord = orderCol.getOrElse(col(idCol))
    docs
      .select(ord.as("_ord"),
        explode(textShingles(col(textCol), shingleSize)).as("sh0"))
      .select(md5PrefixLong(col("sh0"), 15).as("sh"), col("_ord"))
      .groupBy("sh").agg(min("_ord").as("first_ord"))
  }

  /** Score a batch of NEW documents against a frozen [[index]]: a
    * shingle is novel iff absent from the index. Each batch doc is
    * scored INDEPENDENTLY against the frozen index — two batch docs
    * sharing an unseen shingle both count it novel, where
    * [[noveltyPlan]] over the union would credit only the earlier one.
    * The exact correspondence (spec-pinned): screening documents one
    * at a time in corpus order, folding each into the index via
    * [[appendToIndex]] before the next, reproduces [[noveltyPlan]]
    * row-for-row — the screen is the streaming limit of the batch
    * operator. The batch side shuffles by shingle key; the index side
    * is the standing aggregate — at scale, read back bucketed by `sh`
    * so the join co-locates.
    */
  def screenAgainst(idx: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3): DataFrame = {
    val posts = batch
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), shingleSize)).as("sh0"))
      .select(col("doc_id"), md5PrefixLong(col("sh0"), 15).as("sh"))
    val perDoc = posts.join(idx.select(col("sh"), lit(1).as("_hit")),
        Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_new"))
    batch.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_new").cast("double") / col("n_shingles"), lit(0.0d))
          .as("novelty"))
  }

  /** Fold a batch into the standing index without re-scanning the
    * corpus: min-merge of the old rows with the batch's own first-seen
    * aggregate — exact for any order values (min is the merge), so
    * `appendToIndex(index(a), b) ≡ index(a ∪ b)` row-for-row
    * (spec-pinned). Callers overwriting a persisted index must
    * lineage-cut first (the Bm25.appendToIndex discipline).
    */
  def appendToIndex(idx: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3,
      orderCol: Option[Column] = None): DataFrame =
    idx.unionByName(index(batch, idCol, textCol, shingleSize, orderCol))
      .groupBy("sh").agg(min("first_ord").as("first_ord"))

  /** Persist the standing index bucketed by `sh`
    * ([[graft.sources.Bucketing]]): a recurring [[screenAgainst]] then
    * joins the index WITHOUT re-shuffling it — only the (small) batch
    * side exchanges. The write pays the one shuffle, amortized over
    * every nightly screen (the IncrementalDedup / Bm25 discipline).
    */
  def writeIndex(idx: DataFrame, table: String, numBuckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(idx, table, "sh", numBuckets)

  def readIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = spark.table(table)

  /** Fold a batch into the PERSISTED index in place: min-merge against
    * a `localCheckpoint`'d snapshot (lineage cut so the overwrite may
    * read its own previous generation — the Scd2Stream discipline),
    * rewritten with the standing bucket spec. Maintained table ≡
    * rebuild (the [[appendToIndex]] spec), amortized at batch scale.
    */
  def appendIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, orderCol: Option[Column] = None,
      numBuckets: Int = 32): Unit =
    writeIndex(
      appendToIndex(spark.table(table).localCheckpoint(true), batch,
        idCol, textCol, shingleSize, orderCol),
      table, numBuckets)
}
