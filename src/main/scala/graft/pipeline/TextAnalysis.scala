package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure built-in
  * (codegen'd) column expressions — one narrow scan pass, no shuffles, no
  * UDFs — so a 100 TB corpus is a single map stage.
  *
  * Every metric has an exact ANSI-SQL twin (see SparkEntry.oracleSql): the
  * definitions below are deliberately expressible in both dialects.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Punctuation characters (fixed set, both dialects). */
  val PunctClass = "[.,;:!?]"
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit(_)): _*)))

  /** Quality heuristics: mean word length, stopword ratio, punct density.
    * Ratios guarded against empty docs; rounded to 6 places so the DuckDB
    * twin hashes identically. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_chars_m", length(t))
      .withColumn("mean_word_len", round(
        when(nTok === 0, 0.0)
          .otherwise(length(regexp_replace(trim(t), "\\s+", "")).cast("double") / nTok), 6))
      .withColumn("stopword_ratio", round(
        when(nTok === 0, 0.0)
          .otherwise(stopwordCount(t).cast("double") / nTok), 6))
      .withColumn("punct_ratio", round(
        when(length(t) === 0, 0.0)
          .otherwise(punctCount(t).cast("double") / length(t)), 6))
  }

  /** Marker-stopword language ID. Deterministic CASE-chain argmax
    * (ties resolve in chain order), identically expressible in SQL. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "et", "les", "dans"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))

  def langGuess(text: Column): Column = {
    val s = LangMarkers.map { case (l, m) => l -> langScore(text, m) }.toMap
    when(s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("de") && s("es") >= s("fr"), "es")
      .when(s("de") >= s("fr"), "de")
      .otherwise("fr")
  }

  /** BPE-ish subword token estimate: counts GPT-2-style pretokenizer
    * matches (contractions, space-prefixed word/number runs, punctuation
    * runs). A deterministic proxy for LLM token budgeting at corpus scale;
    * the same pattern evaluates identically in DuckDB's regexp engine. */
  val BpeTokenRe = "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
  def bpeTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeTokenRe)), lit(0)).cast("bigint")

  /** Content fingerprint: 64-bit prefix of md5 (hex) — exact-dup grouping
    * key that any engine reproduces. (A rolling Karp-Rabin variant powers
    * shingling in [[Dedup]]; md5 is the cross-engine canonical form.) */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)
}
