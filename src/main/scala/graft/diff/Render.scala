package graft.diff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.to_json

/** Display affordances matching the reference's user-facing surface.
  *
  * The reference pretty-prints the per-column mismatch table with
  * `tabulate(..., tablefmt='psql')` (reference find_datacol_diff.py:156)
  * and logs the source/flag counts (`:141-144`); its README demonstrates
  * rendering `CompColArr` with `to_json` (reference README.md:45).
  * These are driver-side cosmetics over tiny frames — the stats frame is
  * O(#columns) rows — so a collect() here is legitimate.
  */
object Render {

  /** psql-style table of any (small!) DataFrame — the `tabulate`
    * equivalent. Caller is responsible for only passing bounded frames
    * (stats, flag counts); `maxRows` is a hard safety cap.
    */
  def psqlTable(df: DataFrame, maxRows: Int = 1000): String = {
    val header = df.columns.toSeq
    val rows = df.limit(maxRows).collect()
      .map(_.toSeq.map(v => if (v == null) "" else v.toString))
    val widths = header.indices.map { i =>
      (header(i).length +: rows.map(_(i).length)).max
    }
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(vals: Seq[String]) =
      vals.lazyZip(widths).map((v, w) => v.padTo(w, ' '))
        .mkString("| ", " | ", " |")
    (Seq(sep, line(header), sep) ++ rows.map(r => line(r.toSeq)) :+ sep)
      .mkString("\n")
  }

  /** Human-readable run summary — the counts the reference logs via four
    * count() jobs plus two source counts (find_datacol_diff.py:136-144);
    * here they come from the already-computed [[FlagCounts]].
    */
  def summary(counts: FlagCounts): String =
    s"""Rows only in S1      : ${counts.s1Only}
       |Rows only in S2      : ${counts.s2Only}
       |Rows with no diff    : ${counts.noDiff}
       |Rows with col diffs  : ${counts.diff}
       |Total (outer join)   : ${counts.total}""".stripMargin

  /** Full report: summary + psql-style per-column mismatch table. */
  def report(result: DiffResult): String =
    summary(result.counts) + "\n" + psqlTable(result.stats)

  /** The diff frame with `CompColArr` rendered as a JSON string — the
    * README-documented visualization (reference README.md:45; the
    * rendering is the bare array `[{"col_name":...}]`, so no struct
    * wrapper). Stays a lazy plan; nothing is collected.
    */
  def diffAsJson(diff: DataFrame): DataFrame =
    diff.withColumn(DataColDiff.CompColArr,
      to_json(diff(DataColDiff.CompColArr)))
}
