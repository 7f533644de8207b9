package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder-prompt first-class extras): token stats, quality scoring,
  * language-ID heuristic, document fingerprinting. All but the fingerprint
  * are pure column expressions (whole-stage codegen, no UDFs) with exact
  * DuckDB oracle equivalents.
  */
object TextOps {

  /** Whitespace tokens (the corpus is single-space separated; a BPE-ish
    * fallback regex splitter is exposed separately). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-word regex tokenizer: word pieces, numbers, punctuation —
    * GPT-2-style coarse pre-tokenization (public pattern). */
  def bpeishTokens(text: Column): Column =
    // Scala regexp: letters+, digits+, or single non-space symbol
    expr(raw"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")

  /** Per-doc token statistics (doc_id, n_tokens, n_distinct_tokens, n_chars). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      length(col("text")).as("n_chars"))

  val stopwords: Seq[String] = Seq("the", "a")

  private def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Deterministic quality score in [0,1]: length component + lexical
    * diversity + (1 - stopword ratio). Rounded to 4dp for cross-engine float
    * comparison. Formula is the contract; mirrored verbatim in the oracle SQL. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)) / nTok
    val stopRatio = stopwordCount(col("text")) / nTok
    docs.select(
      col("doc_id"),
      round(
        least(nTok / lit(100.0), lit(1.0)) * lit(0.4)
          + distinctRatio * lit(0.3)
          + (lit(1.0) - stopRatio) * lit(0.3), 4).as("quality"))
  }

  /** Language-ID heuristic (n-gram/stopword profile — real corpora would use
    * char-trigram profiles; the deterministic contract here is
    * stopword-density based and mirrored in the oracle SQL): docs whose
    * English-stopword density ≥ 3% → 'en', else 'und'. */
  def langId(docs: DataFrame): DataFrame = {
    val ratio = stopwordCount(col("text")) / size(tokens(col("text"))).cast("double")
    docs.select(col("doc_id"),
      when(ratio >= 0.03, lit("en")).otherwise(lit("und")).as("lang_pred"))
  }

  /** 64-bit rolling polynomial fingerprint (base 131, natural Long overflow)
    * — deterministic content hash for change-detection/dedup prefiltering.
    * Uses the native codegen'd Catalyst expression
    * [[graft.functions.Fingerprint64]] (whole-stage codegen, no object-mode
    * island); [[fingerprintTyped]] is the mapPartitions formulation kept for
    * cross-checking. Not SQL-oracle-checkable (custom hash) — covered by the
    * scalar parity tests instead. */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id").cast("long").as("doc_id"),
      expr("fingerprint64(text)").as("fingerprint"))
  }

  /** Typed-map formulation of [[fingerprint]] (parity reference). */
  def fingerprintTyped(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, fingerprint64(text)) })
      .toDF("doc_id", "fingerprint")
  }

  def fingerprint64(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 131 + s.charAt(i); i += 1 }
    h
  }
}
