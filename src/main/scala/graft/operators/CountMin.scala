package graft.operators

import graft.text.TextFeatures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): a depth×width
  * counter grid answering point frequency queries with one-sided error
  * (estimate ≥ true count, over by at most εN with high probability) in
  * CONSTANT memory — the frequency complement of the HLL cardinality
  * registers ([[HllSketch]]) and the Misra-Gries heavy-hitter screen
  * ([[HeavyHitters]]): MG answers "which items are heavy", CMS answers
  * "how often does THIS item occur" for arbitrary probes, without
  * storing any item.
  *
  * Spark-first shape: the sketch IS a (row, bucket) → count aggregation.
  * Each occurrence contributes `depth` cells, and partial (map-side)
  * aggregation collapses every partition's contribution to ≤ depth×width
  * cells before the exchange — the shuffle carries bounded state per
  * partition no matter the corpus size, exactly like the HLL register
  * build. The materialized cell table is ≤ depth×width rows total, so
  * probing BROADCASTS it: estimates cost the probe side one explode and
  * one broadcast join, never a corpus rescan.
  *
  * Mergeability falls out of the representation: two corpora's (or a
  * stream's per-batch) cell tables merge by cell-wise SUM — the
  * `q_agg_upsert` pattern applies verbatim, so a standing sketch table
  * folds in delta batches without rescanning history.
  *
  * Hashing is md5-prefix based ([[TextFeatures.md5PrefixLong]]) with the
  * depth index salted into the input (`"r:item"`), so every cell — and
  * therefore every estimate — is bit-reproducible by the DuckDB oracle.
  */
object CountMin {

  /** `width` must be a power of two: the bucket is a bitmask of the
    * 48-bit md5 prefix, and a mask keeps the hash→bucket map exactly
    * reproducible in integer SQL (a modulo would too, but the mask
    * makes the uniformity of the low bits explicit).
    */
  case class Config(depth: Int = 4, width: Int = 256) {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
  }

  /** The (r, bucket) explode of one item occurrence: `depth` rows.
    * Shared with the streaming face
    * ([[graft.streaming.CmsStream]]) — same keys, so streaming cells
    * merge with (and verify against) batch cells.
    */
  private[graft] def cellKeys(itemCol: String, cfg: Config) =
    explode(array((0 until cfg.depth).map { r =>
      struct(lit(r).as("r"),
        TextFeatures.md5PrefixLong(
            concat(lit(s"$r:"), col(itemCol)), 12)
          .bitwiseAND(lit((cfg.width - 1).toLong)).as("bucket"))
    }: _*))

  /** Sketch cells (r, bucket, cnt) over the item occurrences (non-
    * distinct — multiplicity is the point). At most depth×width rows.
    */
  def cells(items: DataFrame, itemCol: String, cfg: Config = Config()): DataFrame =
    items.select(cellKeys(itemCol, cfg).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (any frame with `itemCol`): every
    * probe row gains `est_cnt` = min over the depth rows of its cell
    * counts. Probes absent from the sketch estimate as collisions
    * dictate (≥ 0), never null — every (r, bucket) a probe hashes to
    * exists only if something counted there, so missing cells read 0.
    */
  def estimates(sketchCells: DataFrame, probes: DataFrame, itemCol: String,
      cfg: Config = Config()): DataFrame = {
    val passThrough = probes.columns.map(col).toSeq
    probes.select(passThrough :+ cellKeys(itemCol, cfg).as("rb"): _*)
      .join(broadcast(sketchCells),
        col("rb.r") === col("r") && col("rb.bucket") === col("bucket"),
        "left")
      .groupBy(passThrough: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
