package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators over a document table — the corpus-prep
  * stage of a training-data pipeline. Everything is a narrow projection
  * (no shuffle at all): at 100TB these run at scan speed with the text
  * column pruned straight off parquet.
  */
object TextAnalysis {

  /** Token counts: total, distinct, chars. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      size(distinctTokens(col(textCol))).cast("long").as("n_distinct"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Heuristic quality score: length band + type-token ratio + stopword
    * ratio + punctuation/uppercase ratios. Deterministic rationals so an
    * external oracle reproduces it bit-for-bit.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = size(tokens(t)).cast("double")
    val nDis = size(distinctTokens(t)).cast("double")
    val nChar = length(t).cast("double")
    val punct = (nChar - length(regexp_replace(t, "[.!?,;:]", ""))).cast("double")
    val upper = (nChar - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
    val stop = markerCount(tokens(t), Stopwords).cast("double")
    val ttr = nDis / nTok
    val score = ttr * lit(0.5) +
      (lit(1.0) - stop / nTok) * lit(0.3) +
      (lit(1.0) - punct / nChar) * lit(0.1) +
      (lit(1.0) - upper / nChar) * lit(0.1)
    docs.select(
      col(idCol).as("doc_id"),
      round(ttr, 6).as("type_token_ratio"),
      round(stop / nTok, 6).as("stopword_ratio"),
      round(punct / nChar, 6).as("punct_ratio"),
      round(score, 6).as("quality"))
  }

  val Stopwords: Seq[String] = Seq("a", "the", "of", "and", "to", "in")

  /** Marker-word language ID: score each candidate language by marker
    * hits, pick argmax with deterministic alphabetical tiebreak. (An
    * n-gram character model is the production variant; marker scoring is
    * the same shuffle-free shape.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // struct(score, negIdx) max ==> highest score, earliest (alphabetical)
    // language on ties.
    val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        markerCount(toks, markers).as("score"),
        lit(-i).as("ni"),
        lit(lang).as("lang"))
    }
    docs.select(
      col(idCol).as("doc_id"),
      greatest(scored: _*).getField("lang").as("lang_pred"),
      greatest(scored: _*).getField("score").cast("long").as("marker_hits"))
  }

  /** Canonical-text fingerprint (md5 of normalized form). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("fp"),
      length(normalizeText(col(textCol))).cast("long").as("n_norm_chars"))

  /** BPE-ish subword token counting: greedy regex chunking — letter
    * runs capped at 4 chars, single digits, single punctuation — as a
    * cheap deterministic proxy for a byte-pair tokenizer's token count
    * (a real BPE vocab is a lookup table; the greedy-longest-chunk scan
    * is the same cost shape). Narrow projection, scan speed at 100 TB;
    * counts are engine-portable (same greedy semantics in any
    * POSIX-style regex engine, oracle included).
    */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("n_subwords"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
}
