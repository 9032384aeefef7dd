package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language identification via a marker-token / character-class heuristic —
  * a pure Catalyst expression (codegen'd, no UDF): score each candidate
  * language by counting its marker function-words among the tokens, plus a
  * CJK character-range check; highest score wins, ties broken by a fixed
  * language order. Designed for the coarse routing step of a training-data
  * pipeline (cheap first pass before any model-based classifier). */
object LangId {

  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por", "con"))

  private def score(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isin(markers(lang): _*)))

  /** Predicted language of a text column: 'zh' if CJK characters present,
    * else the marker-score argmax over en/de/fr/es, else 'und'. */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "[^\\p{L}]+")
    val scored = Seq("en", "de", "fr", "es").map(l => struct(score(toks, l).as("s"), lit(l).as("l")))
    val best = greatest(scored: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(best.getField("s") > 0, best.getField("l"))
      .otherwise("und")
  }
}
