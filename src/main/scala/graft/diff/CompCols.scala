package graft.diff

import org.apache.spark.sql.DataFrame

/** Key / comparison-column derivation.
  *
  * Mirrors the reference's `gen_comp_col` (find_datacol_diff.py:59-80):
  * from the ORIGINAL s1 schema and the primary-key list it derives the
  * suffixed key column names and the set of non-key ("comparison")
  * columns. Pure driver computation — no jobs.
  */
object CompCols {

  case class Derived(
      s1Keys: Seq[String],
      s2Keys: Seq[String],
      compCols: Seq[String])

  /** @param src original (pre-standardize) source frame — the reference
    *            derives comp columns from s1 (find_dataframe_diff.py:20)
    * @param pks primary-key column names (composite supported,
    *            find_datacol_diff.py:96)
    */
  def derive(src: DataFrame, pks: Seq[String]): Derived = {
    val pkLower = pks.map(_.toLowerCase)
    val allLower = src.schema.names.map(_.toLowerCase).toSeq
    require(pkLower.forall(allLower.contains),
      s"primary keys ${pkLower.diff(allLower).mkString(",")} not in schema")
    Derived(
      s1Keys = pkLower.map(_ + Standardize.S1Suffix),
      s2Keys = pkLower.map(_ + Standardize.S2Suffix),
      // preserve schema order for deterministic CompColArr ordering
      compCols = allLower.filterNot(pkLower.contains))
  }
}
