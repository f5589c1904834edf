package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation over `documents`.
 * All pure `functions._` chains (whole-stage codegen; no UDFs), each with an
 * exact DuckDB oracle — narrow, shuffle-free projections that scale linearly.
 */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (deterministic, self-contained). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private def stopwordHits(lang: String): Column = {
    val set = stopwords(lang)
    size(filter(toks(col("text")), t => t.isInCollection(set)))
  }

  /** Language-ID: argmax of stopword hits; ties broken by fixed lang order;
    * all-zero → "und" (undetermined). */
  def langId(documents: DataFrame): DataFrame = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scored = documents.select(
      (col("doc_id") +: langs.map(l => stopwordHits(l).as(s"hits_$l"))): _*)
    val best = langs.foldLeft((lit("und"), lit(0))) { case ((bestLang, bestHits), l) =>
      val hits = col(s"hits_$l")
      (when(hits > bestHits, lit(l)).otherwise(bestLang),
        when(hits > bestHits, hits).otherwise(bestHits))
    }
    scored.select(col("doc_id"), best._1.as("lang_guess"), best._2.as("hits"))
  }

  /** Quality score from exact-integer features → ratios of ints (identical
    * float64 in any engine): token count, mean token length, stopword ratio,
    * long-token ratio. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t)
    val allStop = stopwords.values.flatten.toSeq.distinct
    val nStop = size(filter(t, x => x.isInCollection(allStop)))
    val nLong = size(filter(t, x => length(x) >= 8))
    documents.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (length(col("text")).cast("double") / nTok.cast("double")).as("mean_token_len"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (nLong.cast("double") / nTok.cast("double")).as("long_token_ratio"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (runs of lowercase letters or digits). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(toks(col("text"))).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("re_tokens"),
      length(col("text")).as("chars"))

  /** Canonical document fingerprint: md5 of the sorted distinct token set —
    * invariant under token order (near-dup canary). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(toks(col("text")))), " ")).as("fingerprint"))
}
