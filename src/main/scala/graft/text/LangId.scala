package graft.text

import graft.text.TextFeatures._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stopword-profile language identification.
  *
  * The classic cheap heuristic: score each candidate language by the
  * fraction of tokens found in a tiny per-language function-word
  * lexicon; predict the argmax (ties broken by language code, `und`
  * when nothing matches). Per-row projection — zero shuffle.
  *
  * Lexicons deliberately overlap (es/fr share `la`,`de`) so the
  * tie-break path is exercised; swap in real profiles per deployment.
  */
object LangId {

  /** Candidate languages in tie-break (alphabetical) order. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Native one-loop membership count ([[graft.expressions.CountInSet]]
    * — the HOF `size(filter(w, isin))` evaluates interpreted, and this
    * runs once PER LANGUAGE per document); equivalence spec'd, and the
    * langid oracle re-proves it per round.
    */
  def score(w: Column, lexicon: Seq[String]): Column =
    graft.expressions.CountInSet(w, lexicon).cast("double") / size(w)

  /** (id, lang_pred, lang_score) per document. */
  def predict(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val scores = Lexicons.map { case (lang, lex) => lang -> score(w, lex) }
    val best = greatest(scores.map(_._2): _*)
    // first-match-wins over the alphabetically ordered languages = the
    // deterministic tie-break; exactly mirrored by the oracle's CASE
    val pred = scores.foldRight(lit("und")) { case ((lang, s), other) =>
      when(best > 0 && s === best, lit(lang)).otherwise(other)
    }
    docs.select(col(idCol).as("doc_id"),
      pred.as("lang_pred"), best.as("lang_score"))
  }
}
