package graft.annotate

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{AnnotateOptions, Match, MatchType}
import graft.dict.AnnotatorModel

/** A1–A3 — the core dictionary-scan operator: broadcast Aho-Corasick automaton
  * applied via typed `mapPartitions` (SURVEY.md §3.2 A2). Deliberately NOT a
  * Catalyst Expression: the per-partition automaton reference is resolved once
  * per partition, and the hand-written scan loop over int arrays is already
  * tighter than codegen would produce (SURVEY.md §5.1). Term-id → concept
  * resolution (A3, the reference's Redis `hgetall`) is fused into the scan via
  * the broadcast payload — no join, no shuffle.
  */
object Scan {

  /** Direct annotation: extracted corpus (url, text, …) → Dataset[Match].
    * Pipelined map-side only — zero shuffles between scan input and output.
    */
  def annotateDirect(extracted: DataFrame,
                     model: Broadcast[AnnotatorModel],
                     longestOnly: Boolean = false): Dataset[Match] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.select(col("url"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val m = model.value
        val automaton = m.automaton
        val payload = m.payload
        it.flatMap { case (url, text) =>
          automaton.scan(text, longestOnly).iterator.flatMap { h =>
            val entries = payload(h.termId)
            val matched = text.substring(h.from - 1, h.to) // offsets 1-based inclusive
            entries.iterator.map { p =>
              Match(url, h.from, h.to, matched, p.classIri, p.ont,
                if (p.pref) MatchType.Pref else MatchType.Syn)
            }
          }
        }
      }
  }
}

/** A4–A5 — request filters, mirroring the reference `annotate(text, opts)`
  * option surface (ontologies whitelist, semantic types, exclude_synonyms,
  * longest_only). min_term_size / exclude_numbers are dictionary-build-time
  * (DictBuild). whole_word_only is always true (mgrep semantics baked into
  * the automaton's word-boundary contract).
  */
object Filters {

  /** Apply scalar request filters + optional semantic-type semi-join.
    * `semanticTypesTable` is `(class_iri, tui)` exploded — broadcast
    * left-semi join, never a shuffle of the match stream's big side.
    */
  def apply(matches: DataFrame, opts: AnnotateOptions,
            semanticTypesTable: Option[DataFrame] = None): DataFrame = {
    var df = matches
    if (opts.ontologies.nonEmpty)
      df = df.filter(col("ont").isin(opts.ontologies: _*))
    if (opts.excludeSynonyms)
      df = df.filter(col("matchType") =!= MatchType.Syn)
    if (opts.semanticTypes.nonEmpty) {
      val allowed = semanticTypesTable
        .getOrElse(sys.error("semanticTypes filter requires the (class_iri, tui) table"))
        .filter(col("tui").isin(opts.semanticTypes: _*))
        .select(col("class_iri").as("st_class_iri")).distinct()
      df = df.join(broadcast(allowed), df("classIri") === col("st_class_iri"), "left_semi")
    }
    df
  }

  /** A5 as a declarative window (DataFrame form of the scan-side
    * `longestOnly`): per (url, from) keep rows whose `to` equals the max.
    * Prefer the scan-side flag at scale (no shuffle); this form exists for
    * oracle coverage and post-hoc filtering of persisted matches.
    */
  def longestOnlyWindow(matches: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"), col("from"))
    matches
      .withColumn("max_to", max(col("to")).over(w))
      .filter(col("to") === col("max_to"))
      .drop("max_to")
  }
}
