package graft.annotate

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{AnnotateOptions, Match, MatchType, Pred}
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
                     longestOnly: Boolean = false,
                     wholeWord: Boolean = true): Dataset[Match] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.select(col("url"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val m = model.value
        val automaton = m.automaton
        val payload = m.payload
        val buf = new graft.dict.HitBuffer() // reused across the partition
        it.filter(_._2 != null) // null-text rows (bad upstream extraction) are skipped, not fatal
          .flatMap { case (url, text) =>
          automaton.scanInto(text, buf, longestOnly, wholeWord)
          val out = new scala.collection.mutable.ArrayBuffer[Match](buf.size)
          var i = 0
          while (i < buf.size) {
            val from = buf.from(i); val to = buf.to(i)
            val matched = text.substring(from - 1, to) // offsets 1-based inclusive
            payload(buf.termId(i)).foreach { p =>
              out += Match(url, from, to, matched, p.classIri, p.ont,
                if (p.pref) MatchType.Pref else MatchType.Syn)
            }
            i += 1
          }
          out
        }
      }
  }
}

/** Per-document aggregated direct annotation: one row per (url, classIri)
  * with 'old'-mode score, occurrence count, and best match type. */
case class DirectAgg(url: String, classIri: String, ont: String,
                     match_type: String, n_matches: Long, score: Double)

object ScanAgg {

  /** The scale-path variant of [[Scan.annotateDirect]]: because every
    * (url, classIri) group lives entirely inside the partition that scanned
    * the document, direct grouping/scoring (A6 + A10) folds into the scan
    * itself — the 10–30× larger per-occurrence match stream is never
    * materialized, serialized, or shuffled. Downstream expansion joins see
    * one row per (doc, concept). Identical results to
    * `Scoring.directScores(Scan.annotateDirect(...))` (oracle-checked).
    */
  def annotateDirectAgg(extracted: DataFrame,
                        model: Broadcast[AnnotatorModel],
                        longestOnly: Boolean = false,
                        wholeWord: Boolean = true): Dataset[DirectAgg] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.select(col("url"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val m = model.value
        val automaton = m.automaton
        val payload = m.payload
        val buf = new graft.dict.HitBuffer()
        it.filter(_._2 != null) // null-text rows (bad upstream extraction) are skipped, not fatal
          .flatMap { case (url, text) =>
          // per-doc fold: classIri -> (ont, bestType, n, score)
          val acc = new scala.collection.mutable.HashMap[String, (String, String, Long, Double)]()
          automaton.scanInto(text, buf, longestOnly, wholeWord)
          var i = 0
          while (i < buf.size) {
            payload(buf.termId(i)).foreach { p =>
              val mt = if (p.pref) MatchType.Pref else MatchType.Syn
              val w = if (p.pref) graft.Score.PrefWeight else graft.Score.SynWeight
              acc.get(p.classIri) match {
                case Some((ont, t, n, s)) =>
                  acc(p.classIri) = (ont, if (mt < t) mt else t, n + 1, s + w)
                case None =>
                  acc(p.classIri) = (p.ont, mt, 1L, w)
              }
            }
            i += 1
          }
          acc.iterator.map { case (ci, (ont, t, n, s)) => DirectAgg(url, ci, ont, t, n, s) }
        }
      }
  }
}

/** Fully-fused per-document annotate: direct scan + scoring + hierarchy +
  * mapping expansion in ONE typed mapPartitions pass — the zero-shuffle scale
  * path. Every output row of the annotate pipeline is a function of a single
  * document plus broadcast ontology-side state (automaton payload, closure
  * map, mappings map), so no exchange is semantically necessary; the
  * Catalyst-join formulation ([[Expand]]) produces identical triples
  * (cross-checked in tests + DuckDB oracle) and remains the default for
  * post-hoc/provenance recomputation over persisted matches.
  */
object FusedAnnotate {

  /** Ontology-side broadcast state for the fused pass. `maxLevel` records
    * the closure cap the maps were built with — requests beyond it fail
    * loudly (see [[annotateTriples]]) instead of silently truncating. */
  case class ExpansionMaps(
      closure: Map[String, Array[(String, Int)]], // classIri -> (ancestor, minDist)
      mappings: Map[String, Array[String]], // classIri -> mapped iris
      maxLevel: Int)
      extends Serializable

  def expansionMaps(closureDf: DataFrame, mappingsDf: DataFrame,
                    maxLevel: Int): ExpansionMaps = {
    val cl = closureDf.filter(col("distance") <= maxLevel)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.map(r => (r._2, r._3)).sortBy(_._1)
      }
    val mp = mappingsDf.select(col("class_iri"), col("mapped_iri"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (c, rows) => c -> rows.map(_._2).distinct.sorted }
    ExpansionMaps(cl, mp, maxLevel)
  }

  /** Corpus → complete triple set (direct + expanded + mapped), map-only.
    * Honors the full reference request-option surface (A4/A5/A10/A11):
    * ontologies whitelist, semantic-type class filter (pass the allowed
    * class set via `semanticTypeClasses`), exclude_synonyms, longest_only,
    * hierarchy level cap, expansion toggles, score threshold. */
  def annotateTriples(extracted: DataFrame,
                      model: Broadcast[AnnotatorModel],
                      maps: Broadcast[ExpansionMaps],
                      dictVersion: String,
                      opts: AnnotateOptions = AnnotateOptions(),
                      semanticTypeClasses: Option[Broadcast[Set[String]]] = None): Dataset[graft.Triple] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    require(opts.hierarchyMaxLevel <= maps.value.maxLevel,
      s"hierarchyMaxLevel=${opts.hierarchyMaxLevel} exceeds the broadcast " +
        s"closure's build level ${maps.value.maxLevel} — rebuild expansionMaps " +
        "with a deeper cap (silent truncation would diverge from Expand.hierarchy)")
    val ontWhitelist: Set[String] = opts.ontologies.toSet
    extracted.select(col("url"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val m = model.value
        val automaton = m.automaton
        val payload = m.payload
        val exp = maps.value
        val allowedClasses = semanticTypeClasses.map(_.value)
        // stop_words resolved once per partition (cheap: one automaton scan
        // per stopword string), blacklisted ids skipped per hit
        val stopIds: Set[Int] =
          if (opts.stopWords.isEmpty) Set.empty else m.termIdsOf(opts.stopWords)
        val buf = new graft.dict.HitBuffer()
        it.filter(_._2 != null) // null-text rows (bad upstream extraction) are skipped, not fatal
          .flatMap { case (url, text) =>
          // per-doc direct fold: classIri -> (bestType, score)
          val direct = new scala.collection.mutable.HashMap[String, (String, Double)]()
          automaton.scanInto(text, buf, opts.longestOnly, opts.wholeWordOnly)
          var hi = 0
          while (hi < buf.size) {
            if (!stopIds.contains(buf.termId(hi)))
            payload(buf.termId(hi)).foreach { p =>
              val keep = (ontWhitelist.isEmpty || ontWhitelist.contains(p.ont)) &&
                (!opts.excludeSynonyms || p.pref) &&
                allowedClasses.forall(_.contains(p.classIri))
              if (keep) {
                val mt = if (p.pref) MatchType.Pref else MatchType.Syn
                val w = if (p.pref) graft.Score.PrefWeight else graft.Score.SynWeight
                direct.get(p.classIri) match {
                  case Some((t, s)) => direct(p.classIri) = (if (mt < t) mt else t, s + w)
                  case None => direct(p.classIri) = (mt, w)
                }
              }
            }
            hi += 1
          }
          if (direct.isEmpty) Iterator.empty
          else {
            val ancestors = new scala.collection.mutable.HashMap[String, Int]()
            val mapped = new scala.collection.mutable.HashSet[String]()
            direct.keysIterator.foreach { c =>
              if (opts.expandHierarchy)
                exp.closure.getOrElse(c, Array.empty).foreach { case (a, d) =>
                  if (d <= opts.hierarchyMaxLevel &&
                      ancestors.getOrElse(a, Int.MaxValue) > d) ancestors(a) = d
                }
              if (opts.expandMappings)
                exp.mappings.getOrElse(c, Array.empty).foreach(mapped += _)
            }
            val out = new scala.collection.mutable.ArrayBuffer[graft.Triple](
              direct.size + ancestors.size + mapped.size)
            direct.foreach { case (c, (t, s)) =>
              if (s >= opts.scoreThreshold)
                out += graft.Triple(url, Pred.Direct, c, t, 0, s, dictVersion)
            }
            ancestors.foreach { case (a, d) =>
              val s = graft.Score.hierWeight(d)
              if (s >= opts.scoreThreshold)
                out += graft.Triple(url, Pred.Expanded, a, MatchType.Hier, d, s, dictVersion)
            }
            mapped.foreach { mi =>
              if (graft.Score.MapWeight >= opts.scoreThreshold)
                out += graft.Triple(url, Pred.Mapped, mi, MatchType.Map, 1,
                  graft.Score.MapWeight, dictVersion)
            }
            out.iterator
          }
        }
      }
  }
}

/** A4–A5 — post-scan request filters, mirroring the reference
  * `annotate(text, opts)` option surface (ontologies whitelist, semantic
  * types, exclude_synonyms). Scan-TIME options (longest_only,
  * whole_word_only) must be passed to the scan itself — this object filters
  * an existing match stream and cannot re-derive spans. min_term_size /
  * exclude_numbers are dictionary-build-time (DictBuild).
  */
object Filters {

  /** Apply scalar request filters + optional semantic-type semi-join.
    * `semanticTypesTable` is `(class_iri, tui)` exploded — broadcast
    * left-semi join, never a shuffle of the match stream's big side.
    */
  def apply(matches: DataFrame, opts: AnnotateOptions,
            semanticTypesTable: Option[DataFrame] = None): DataFrame = {
    var df = matches
    if (opts.stopWords.nonEmpty) {
      // post-hoc form of the stop_words blacklist: a whole-word match's
      // uppercased matched text IS its normalized dictionary term (the scan
      // is literal after per-char uppercasing), so term equality == matched-
      // text equality here. Scan-time resolution (termIdsOf) is the scale
      // path; this covers persisted match streams.
      val norm = opts.stopWords
        .map(_.trim.replaceAll("\\s+", " ").toUpperCase(java.util.Locale.ROOT))
      df = df.filter(!upper(col("text")).isin(norm: _*))
    }
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
