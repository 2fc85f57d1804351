package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Heuristic language identification (scalar UDF surface, SURVEY.md §2B):
  * scores character-bigram profiles against tiny per-language models.
  * Genuinely needs imperative code (profile lookup), so it is the one
  * operator implemented as a Scala UDF rather than built-ins — with the
  * usual caveat that a UDF is an optimization barrier: apply it AFTER
  * filters/pruning, never in a join key.
  *
  * Profiles are the highest-frequency character bigrams of each language
  * (public linguistic data, e.g. Wikipedia frequency tables).
  */
object LangId {

  /** Visible inside the library so the DuckDB oracle SQL is GENERATED from
    * the same profiles the UDF scores against — they cannot drift. */
  private[graft] val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
      "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar"),
    "de" -> Set("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge",
      "un", "st", "be", "ic", "sc", "da", "au", "di", "he", "an"),
    "es" -> Set("de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "re",
      "er", "as", "on", "st", "ad", "al", "or", "ta", "co", "ci"),
    "fr" -> Set("es", "le", "de", "en", "re", "nt", "on", "er", "te", "el",
      "an", "ai", "ne", "et", "la", "it", "me", "ou", "em", "ie"))

  /** Score = fraction of the text's bigrams found in each profile; returns
    * the best-scoring language, or "und" for texts with no bigrams. */
  def detect(text: String): String = {
    if (text == null) return "und"
    val cleaned = text.toLowerCase.filter(c => c.isLetter || c == ' ')
    val bigrams = cleaned.split(" ").filter(_.length >= 2)
      .flatMap(w => w.sliding(2)).toSeq
    if (bigrams.isEmpty) return "und"
    val best = profiles.map { case (lang, prof) =>
      lang -> bigrams.count(prof.contains).toDouble / bigrams.size
    }.maxBy { case (lang, score) => (score, lang) } // deterministic tie-break
    if (best._2 == 0.0) "und" else best._1
  }

  val langIdUdf: UserDefinedFunction = udf(detect _)
}
