package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension, type 2) snapshot apply: fold a new
  * full snapshot of a keyed table into a versioned history, producing
  * one row per (key, version) with `[valid_from, valid_to)` interval
  * columns — the production consumer of the diff concept the reference
  * computes (reference find_datacol_diff.py classifies rows into
  * NODIFF / changed / S1_ONLY / S2_ONLY; SCD2 is what a warehouse DOES
  * with that classification).
  *
  * Semantics per key at batch time `batchTs`:
  *   - unchanged (current attrs null-safe-equal to snapshot): current
  *     row passes through open;
  *   - changed: current row closes (`valid_to = batchTs`) and a new
  *     open row is inserted with the snapshot's attrs;
  *   - absent from snapshot (deleted): current row closes;
  *   - new key: one open row inserted.
  * Rows already closed (`valid_to` non-null) pass through UNTOUCHED and
  * never enter the join.
  *
  * Scale shape: only the CURRENT slice of the history (one row per live
  * key — the same cardinality as the snapshot) shuffles for the
  * full-outer equi-join; the closed majority of a years-deep history is
  * a filter + union branch with no exchange. With the history stored
  * partitioned on `valid_to IS NULL` (or the current slice maintained
  * as its own table) the apply touches O(|snapshot|) rows regardless of
  * history depth. The per-key outcome is ONE `filter(array(...))`
  * expression (the diff core's technique, [[graft.diff.DataColDiff]]):
  * no second pass, no re-join, no window.
  *
  * Keys compare null-safely (`<=>`) so a null-keyed current row matches
  * a null-keyed snapshot row instead of silently closing + reinserting
  * every batch.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  /** One-version-per-row open history from a plain keyed table: every
    * row open since `asOf`.
    */
  def initHistory(snapshot: DataFrame, asOf: Long): DataFrame =
    snapshot
      .withColumn(ValidFrom, lit(asOf))
      .withColumn(ValidTo, lit(null).cast("bigint"))

  /** Apply `snapshot` to `history` (in [[initHistory]]'s shape: data
    * columns + `valid_from`/`valid_to` bigints, open rows having null
    * `valid_to`) at `batchTs`. `keys` identify rows; all remaining data
    * columns are compared attributes. Output has the input history's
    * schema.
    */
  def apply(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
      batchTs: Long): DataFrame =
    applyInternal(history, snapshot, keys, batchTs,
      tombstoneCol = None, snapshotMode = true)

  /** CDC-delta variant — the incoming frame is a CHANGE feed, not a
    * full snapshot: keys absent from the delta stay OPEN (a snapshot
    * apply would close them), rows flagged true in `tombstoneCol` are
    * deletes (their attr values are ignored), everything else is an
    * upsert with [[apply]]'s semantics. This is the per-micro-batch
    * form a streaming pipeline maintains
    * ([[graft.streaming.Scd2Stream]]); an upsert whose attrs equal the
    * open row is a no-op, so redelivered CDC rows don't churn versions.
    */
  def applyDelta(history: DataFrame, delta: DataFrame, keys: Seq[String],
      batchTs: Long, tombstoneCol: Option[String] = None): DataFrame =
    applyInternal(history, delta, keys, batchTs,
      tombstoneCol, snapshotMode = false)

  private def applyInternal(history: DataFrame, incoming: DataFrame,
      keys: Seq[String], batchTs: Long, tombstoneCol: Option[String],
      snapshotMode: Boolean): DataFrame = {
    val attrs = history.columns.toSeq
      .filterNot(keys.contains).filterNot(Seq(ValidFrom, ValidTo).contains)
    require((keys ++ attrs).forall(incoming.columns.contains),
      s"incoming frame must carry ${keys ++ attrs}")

    val closed = history.filter(col(ValidTo).isNotNull)
    val current = history.filter(col(ValidTo).isNull)

    val dataCols = keys ++ attrs
    // Presence markers distinguish "side absent" from legitimately-null
    // key columns after the full outer join (diff-core technique).
    val c = current.select(
      dataCols.map(n => col(n).as(s"c_$n")) ++
        Seq(col(ValidFrom).as("c_vf"), lit(1).as("c_m")): _*)
    val s = incoming.select(
      dataCols.map(n => col(n).as(s"s_$n")) ++
        Seq(lit(1).as("s_m"),
          tombstoneCol.map(t => coalesce(col(t), lit(false)))
            .getOrElse(lit(false)).as("s_del")): _*)

    val joined = c.join(s,
      keys.map(k => col(s"c_$k") <=> col(s"s_$k")).reduce(_ && _),
      "full_outer")

    val cPresent = col("c_m").isNotNull
    val sPresent = col("s_m").isNotNull
    val del = col("s_del") === true
    val same = attrs.map(a => col(s"c_$a") <=> col(s"s_$a"))
      .reduceOption(_ && _).getOrElse(lit(true))

    def row(side: String, vf: Column, vt: Column, emit: Column): Column =
      struct(
        dataCols.map(n => col(s"${side}_$n").as(n)) ++
          Seq(vf.as(ValidFrom), vt.as(ValidTo), emit.as("emit")): _*)

    // Current row survives open unless this apply closes it: an equal
    // upsert keeps it; a differing upsert or a tombstone (or, in
    // snapshot mode, absence from the snapshot) closes it.
    val closeIt =
      if (snapshotMode) !sPresent || del || !same
      else sPresent && (del || !same)
    val keepOrClose = row("c", col("c_vf"),
      when(closeIt, lit(batchTs)).otherwise(lit(null).cast("bigint")),
      cPresent)
    // Incoming row: inserted open when new or changed, never for deletes.
    val insert = row("s", lit(batchTs), lit(null).cast("bigint"),
      sPresent && !del && (!cPresent || !same))

    val out = joined
      .select(inline(filter(array(keepOrClose, insert), _.getField("emit"))))
      .drop("emit")

    closed.select(out.columns.map(col): _*).unionByName(out)
  }

  /** Current (open) slice of a history. */
  def currentOf(history: DataFrame): DataFrame =
    history.filter(col(ValidTo).isNull).drop(ValidTo)

  /** Time travel: the table as of `ts` — rows whose validity interval
    * covers the instant (`valid_from <= ts < valid_to`, open rows
    * unbounded). Reading as-of any instant BEFORE a batch reproduces
    * the pre-batch table exactly — applies never destroy state, they
    * close intervals — which is the identity the `scd2_asof` oracle
    * checks (as-of 0 after an apply ≡ the original snapshot). On a
    * history partitioned/z-ordered by the interval columns the filter
    * prunes to the covering slices at 100 TB.
    */
  def asOf(history: DataFrame, ts: Long): DataFrame =
    history.filter(col(ValidFrom) <= ts &&
        (col(ValidTo).isNull || col(ValidTo) > ts))
      .drop(ValidFrom, ValidTo)
}
