package graft

import java.sql.Timestamp

/** Core data model (SURVEY.md §2).
  *
  * Offsets convention (reference parity): `from`/`to` are 1-based INCLUSIVE
  * character positions in the ORIGINAL (pre-uppercase) extracted text, the
  * same convention the reference mgrep wire tuple `(id, from, to, word)` uses
  * (SURVEY.md §2.1 "Match / annotation").
  */

/** Canonical corpus row — the graft's fixed input shape:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`
  * (BASELINE.json `input_hint`). `html` may be null when `text` is already
  * extracted; A0 extraction uses `text` verbatim when non-null (the
  * byte-identity invariant) and falls back to deterministic HTML stripping.
  */
case class Doc(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** One concept behind a normalized dictionary term (SURVEY.md §2.1
  * "Dictionary entry": term → set of (classIri, ontology, isPreferred)). */
case class DictPayload(classIri: String, ont: String, pref: Boolean)

/** Exploded, normalized dictionary row (stages D2–D4) before aggregation. */
case class DictTerm(term: String, classIri: String, ont: String, pref: Boolean)

/** A direct annotation: one dictionary occurrence resolved to one concept
  * (reference `Annotation` with matchType ∈ {PREF, SYN}). */
case class Match(url: String, from: Int, to: Int, text: String,
                 classIri: String, ont: String, matchType: String)

/** Raw automaton hit before payload fan-out; offsets 1-based inclusive. */
case class RawHit(from: Int, to: Int, termId: Int)

/** Normalized triple row (SURVEY.md §2.3). The P/R gate compares distinct
  * `(subj, pred, obj)`; everything else is provenance/score metadata. */
case class Triple(subj: String, pred: String, obj: String,
                  match_type: String, distance: Int, score: Double,
                  dict_version: String)

/** Per-partition lineage row emitted by each pipeline stage (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics"). */
case class Lineage(stage: String, partition_id: Int, input_rows: Long,
                   output_rows: Long, wall_ms: Long, dict_version: String,
                   run_id: String)

object Pred {
  /** Direct dictionary annotation (url hasAnnotation conceptIRI). */
  val Direct = "hasAnnotation"
  /** Is-a transitive-closure (hierarchy) expansion. */
  val Expanded = "hasExpandedAnnotation"
  /** Inter-ontology mapping expansion. */
  val Mapped = "hasMappedAnnotation"
}

object MatchType {
  val Pref = "PREF" // preferred-label match
  val Syn = "SYN" // synonym match
  val Hier = "HIER" // hierarchy-expanded
  val Map = "MAP" // mapping-expanded
}

/** Scoring constants, `old` NCBO mode shape (Melzi & Jonquet 2014; SURVEY.md
  * §3.2 A10). Exact reference constants are unverifiable this round (empty
  * reference mount — SURVEY.md §0); the normative ordering contract
  * direct-pref > direct-syn > expanded is enforced by construction:
  * expanded/mapped weights never exceed [[SynWeight]].
  */
object Score {
  val PrefWeight = 10.0
  val SynWeight = 8.0
  /** Hierarchy-expansion weight decays with is-a distance, capped below SYN. */
  def hierWeight(distance: Int): Double = 7.0 / math.max(distance, 1)
  val MapWeight = 5.0
}

/** Annotation request options — mirror of the reference `annotate(text, opts)`
  * surface (SURVEY.md §3.2 A4/A5). Build-time options (minTermSize,
  * excludeNumbers) live on [[graft.dict.DictBuild]].
  */
case class AnnotateOptions(
    ontologies: Seq[String] = Nil, // empty = all
    semanticTypes: Seq[String] = Nil, // empty = all
    excludeSynonyms: Boolean = false,
    longestOnly: Boolean = false,
    wholeWordOnly: Boolean = true, // reference whole_word_only (mgrep default)
    expandHierarchy: Boolean = true,
    hierarchyMaxLevel: Int = 5,
    expandMappings: Boolean = true,
    scoreThreshold: Double = Double.NegativeInfinity,
    /** Reference `stop_words`: a per-request term blacklist. Entries are
      * D3-normalized (trim/collapse/upper) and resolved to dictionary term
      * ids at payload-compile time ([[graft.dict.AnnotatorModel.termIdsOf]]);
      * non-dictionary entries are no-ops, matching the reference (stopping a
      * word that is not a term changes nothing). */
    stopWords: Seq[String] = Nil,
    /** Reference `score` mode: old | cvalue | cvalueh (Melzi & Jonquet
      * 2014). Dispatched by [[graft.Annotator.scores]]; the triple-emitting
      * paths are old-mode by construction and reject other modes loudly. */
    scoreMode: String = ScoreMode.Old)

object ScoreMode {
  val Old = "old"
  val CValue = "cvalue"
  val CValueH = "cvalueh"
  val All: Set[String] = Set(Old, CValue, CValueH)
}
