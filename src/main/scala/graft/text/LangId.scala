package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Lightweight language identification: stopword-profile scoring plus a
  * CJK character-ratio signal (part of the text-analysis surface a
  * training-data pipeline runs before filtering/routing documents).
  *
  * Heuristic by design — a full n-gram model is a data artifact, not
  * engine code; the engine contract is a deterministic `text -> code`
  * scorer cheap enough to run in the scan projection of a 100 TB corpus
  * (one tokenization + set lookups per row). Returns "und" when no
  * profile clears the confidence floor.
  *
  * NOTE: the driver's `documents.lang` column is NOT ground truth for
  * this function — that corpus uses one shared vocabulary for all lang
  * labels (verified) — so ACCURACY is pinned by real-language fixtures
  * in LangIdSpec. REPRODUCIBILITY is additionally pinned by the
  * d22_lang_id oracle row, whose DuckDB SQL mirrors this exact scoring
  * (profile lists generated from [[Profiles]], same 0.08 floor, same
  * alphabetical tie-break).
  */
object LangId {

  /** Common-stopword profiles (public knowledge, top function words). */
  val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "to", "in", "is", "that", "it",
      "you", "for", "on", "with", "as", "are"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "se",
      "no", "las", "por", "con", "una", "es"),
    "de" -> Set("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "zu", "den", "von", "sie", "im", "auf", "es"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "une", "est",
      "que", "dans", "pour", "qui", "au", "pas"))

  private val MinScore = 0.08 // at least ~1 stopword per 12 tokens

  def isCjk(c: Char): Boolean =
    Character.UnicodeScript.of(c) match {
      case Character.UnicodeScript.HAN | Character.UnicodeScript.HIRAGANA |
          Character.UnicodeScript.KATAKANA | Character.UnicodeScript.HANGUL => true
      case _ => false
    }

  /** Deterministic language guess: "zh" for CJK-dominant text, else the
    * best stopword profile above the floor, else "und".
    */
  def langId(text: String): String = {
    if (text == null || text.isBlank) return "und"
    val letters = text.count(!_.isWhitespace)
    if (letters > 0 && text.count(isCjk).toDouble / letters >= 0.3) return "zh"
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val scored = Profiles.toSeq.map { case (lang, stop) =>
      (lang, toks.count(stop.contains).toDouble / toks.length)
    }
    // Deterministic tie-break: higher score first, then language code.
    val (best, score) = scored.minBy { case (l, sc) => (-sc, l) }
    if (score >= MinScore) best else "und"
  }

  /** Column form (UDF: per-row set lookups, no library). */
  val langIdCol: Column => Column = {
    val f = udf((s: String) => langId(s))
    c => f(c)
  }
}
