package graft.tables

import graft.tables.TxLog.AddFile
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Conservative manifest-level pruning for arbitrary predicates — what
  * lets [[CowTable.deleteWhere]]/[[CowTable.updateWhere]] plan a
  * narrow range delete over O(matching files) instead of probing the
  * whole table (at ~1e5 files a full probe is a full-table job even
  * with parquet pushdown doing the row-group work).
  *
  * The range extraction ([[ColumnBridge.simpleRanges]]) recognizes
  * top-level conjunctions of simple comparisons `col <op> literal`
  * (either operand order); everything else — ORs, expressions, UDFs —
  * contributes NO pruning. Each recognized range then acts only when
  * the literal's runtime type matches the recorded stats kind family
  * (cross-type comparison semantics belong to Spark, not here).
  *
  * Soundness: a file is dropped only when a recognized conjunct can
  * never be TRUE for any of its rows; SQL comparisons with NULL are
  * never TRUE, so null slices never rescue a pruned file (an all-null
  * file records "opaque" stats and is never pruned at all), and the
  * delete/update semantics gate on the predicate being TRUE, so "no
  * TRUE row" exactly means "nothing to rewrite". Strict bounds are
  * treated as inclusive — pruning may only widen.
  */
object StatsPredicate {

  /** Files of `files` that MAY hold a row where `cond` is TRUE.
    * `phys` translates the predicate's LOGICAL column names to the
    * physical names manifest stats are keyed by (column mapping —
    * identity by default). A renamed-but-not-rewritten stats key
    * simply stops matching and the file never prunes: conservative.
    */
  def prune(files: Seq[AddFile], cond: Column,
      phys: String => String = identity): Seq[AddFile] = {
    val ranges = ColumnBridge.simpleRanges(cond)
    if (ranges.isEmpty) files
    else files.filter { f =>
      ranges.forall { case (name, lo, hi) =>
        f.stats.get(phys(name)).forall(s => overlaps(s, lo, hi))
      }
    }
  }

  /** [[prune]]'s conservative-EXCLUSIVE twin for layout REWRITES
    * ([[CowTable.optimizeMatching]]): a file joins the scope only when
    * a recognized conjunct's stat POSITIVELY overlaps — stats-less and
    * opaque files, which a read must include or miss rows, are
    * excluded here because rewriting them is pure waste (a
    * maintenance pass would re-rewrite them once per hot range,
    * forever). An unanalyzable predicate still selects everything —
    * that is the whole-table optimize, asked for explicitly.
    */
  def pruneForRewrite(files: Seq[AddFile], cond: Column,
      phys: String => String = identity): Seq[AddFile] = {
    val ranges = ColumnBridge.simpleRanges(cond)
    if (ranges.isEmpty) files
    else files.filter { f =>
      ranges.forall { case (name, lo, hi) =>
        f.stats.get(phys(name)).exists(s =>
          s.kind != "opaque" && overlaps(s, lo, hi))
      }
    }
  }

  private def overlaps(s: TxLog.ColStats, lo: Option[Any],
      hi: Option[Any]): Boolean = s.kind match {
    case "long" =>
      def asL(v: Any): Option[Long] = v match {
        case i: Int => Some(i.toLong)
        case l: Long => Some(l)
        case sh: Short => Some(sh.toLong)
        case b: Byte => Some(b.toLong)
        case _ => None
      }
      val (l, h) = (lo.map(asL), hi.map(asL))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) true
      else l.flatten.forall(_ <= s.max.toLong) &&
        h.flatten.forall(_ >= s.min.toLong)
    case "double" =>
      def asD(v: Any): Option[Double] = v match {
        case d: Double => Some(d)
        case f: Float => Some(f.toDouble)
        case _ => None
      }
      val (l, h) = (lo.map(asD), hi.map(asD))
      val (mn, mx) = (s.min.toDouble, s.max.toDouble)
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty) ||
        mn.isNaN || mx.isNaN) true
      else l.flatten.forall(v => v.isNaN || v <= mx) &&
        h.flatten.forall(v => v.isNaN || v >= mn)
    case "string" =>
      // UTF-8 byte order — the same total order Spark's min/max used
      // (ColStats' own comparison rule)
      def asS(v: Any): Option[String] = v match {
        case str: String => Some(str)
        case _ => None
      }
      val (l, h) = (lo.map(asS), hi.map(asS))
      if (l.exists(_.isEmpty) || h.exists(_.isEmpty)) true
      else l.flatten.forall(v => TxLog.utf8Compare(v, s.max) <= 0) &&
        h.flatten.forall(v => TxLog.utf8Compare(s.min, v) <= 0)
    case _ => true
  }
}
