package graft.diff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Input standardization for the diff operator.
  *
  * Behavior matched from the reference's `initialise_and_standardise_df`
  * (reference: find_datacol_diff.py:19-56):
  *   - case-insensitive schema comparison (`:32-33`),
  *   - null → "" on string columns (`fillna("")`, `:39-40`),
  *   - per-source column suffixing `_s1` / `_s2` (`:42-44`).
  *
  * Deviations (documented per SURVEY.md §7.4):
  *   - SYMMETRIC schema check (the reference only tests s1−s2,
  *     find_datacol_diff.py:34 — extra s2 columns silently ride along);
  *     we report both directions.
  *   - column names are normalized to lower case ONCE here, so nothing
  *     downstream depends on `spark.sql.caseSensitive=false`.
  *   - rename is a single `select` projection, not an O(columns) chain of
  *     `withColumnRenamed` plan nodes (reference loops, `:42-44`).
  *   - errors are returned as `Left(SchemaMismatch)` instead of the
  *     reference's `None` + downstream `sys.exit(1)`
  *     (find_datacol_diff.py:55-56,76-79,157-160).
  */
object Standardize {

  val S1Suffix = "_s1"
  val S2Suffix = "_s2"

  /** Validate the two schemas line up (case-insensitively), then return
    * both frames with lower-cased, suffixed column names and string-nulls
    * blanked.
    *
    * `lenient = true` reproduces the reference's asymmetric check
    * (find_datacol_diff.py:34 tests only s1−s2): extra s2 columns are
    * accepted — and DROPPED here (the reference lets them ride along
    * into the join but they never reach the diff array, which is built
    * from s1's columns; projecting them away is the observable-
    * equivalent, deterministic form). Missing s2 columns still fail in
    * both modes.
    */
  def standardize(s1: DataFrame, s2: DataFrame, lenient: Boolean = false)
      : Either[SchemaMismatch, (DataFrame, DataFrame)] = {
    val c1 = s1.schema.names.map(_.toLowerCase).toSet
    val c2 = s2.schema.names.map(_.toLowerCase).toSet
    // columns of ONE input that collapse to the same lower-cased name
    // (`Id` and `id`) are ambiguous under case-insensitive matching —
    // surface them instead of failing later with an opaque
    // AMBIGUOUS_REFERENCE deep in the plan
    val dupWithin =
      s1.schema.names.groupBy(_.toLowerCase).filter(_._2.length > 1).keySet ++
        s2.schema.names.groupBy(_.toLowerCase).filter(_._2.length > 1).keySet
    // shared columns must agree on TYPE: the diff would otherwise either
    // fail at analysis (incomparable types) or silently coerce and mask
    // real differences (1 vs "01" comparing equal)
    val t1 = s1.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val t2 = s2.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val typeMismatches = (c1 intersect c2).toSeq.sorted.flatMap { n =>
      if (t1(n) != t2(n)) Some(s"$n: ${t1(n).sql} vs ${t2(n).sql}") else None
    }
    if (dupWithin.nonEmpty)
      Left(SchemaMismatch(Set.empty, Set.empty, Nil, dupWithin))
    else if ((c1 diff c2).nonEmpty || (!lenient && (c2 diff c1).nonEmpty))
      Left(SchemaMismatch(c1 diff c2, c2 diff c1, typeMismatches))
    else if (typeMismatches.nonEmpty)
      Left(SchemaMismatch(Set.empty, Set.empty, typeMismatches))
    else {
      val s2kept =
        if (c2 == c1) s2
        else s2.select(s2.schema.names.filter(n => c1(n.toLowerCase))
          .map(n => s2(quoted(n))).toIndexedSeq: _*)
      Right((prepare(s1, S1Suffix), prepare(s2kept, S2Suffix)))
    }
  }

  /** Backtick-quote a name (escaping embedded backticks) so dotted
    * column names ("a.b") resolve literally instead of being parsed as
    * struct-field access — needed for Dataset.col AND na.fill.
    */
  private[diff] def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** Lower-case + suffix every column in one projection; blank string
    * nulls (reference fillna("") semantics: NULL and "" compare equal on
    * string columns). Non-string columns are left as-is — the diff core
    * uses null-safe equality so they need no sentinel.
    */
  def prepare(df: DataFrame, suffix: String): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(f => quoted(f.name))
    val filled =
      if (stringCols.isEmpty) df else df.na.fill("", stringCols)
    filled.select(filled.schema.names.map { n =>
      filled(quoted(n)).as(n.toLowerCase + suffix)
    }.toIndexedSeq: _*)
  }
}
