package graft.fixture

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic ontology fixture (FIXTURES.md §B) — NO randomness,
  * constructed by explicit formula over the `documents.text` vocabulary so
  * matches actually occur. This object is the single source of truth for:
  *   - Spark DataFrames (tests + SparkEntry queries),
  *   - the DuckDB oracle SQL (inlined as VALUES via the *SqlValues helpers),
  * guaranteeing both sides see byte-identical fixture data.
  *
  * Edge cases required by FIXTURES.md: overlapping terms ("sort" ⊂
  * "merge sort") for longest_only; a term that only occurs as a substring of
  * a word ("par" inside "spark"/"part") to prove word boundaries; a pure
  * number term; 1–2 char terms (min_term_size); the same CUI in both
  * ontologies; concepts with no parents; an is-a diamond; depth ≥ 4.
  */
object OntologyFixture {

  case class Concept(classIri: String, ont: String, prefLabel: String,
                     synonyms: Seq[String], tuis: Seq[String], cui: String)
  case class Edge(childIri: String, parentIri: String)
  case class Mapping(classIri: String, mappedIri: String, kind: String)
  case class CuiRow(cui: String, preferredIri: String)

  /** sorted `documents` vocabulary (31 words, verified against sf0.001/sf0.01). */
  val vocab: Vector[String] = Vector(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")

  private def iri1(i: Int) = f"http://fix.onto/ONT1#C$i%03d"
  private def iri2(j: Int) = f"http://fix.onto/ONT2#D$j%03d"

  /** Explicit synonym map for ONT1 word concepts (overlap + cross-class cases). */
  private val synMap: Map[String, Seq[String]] = Map(
    "sort" -> Seq("merge sort"), // ⊂-overlap with ONT2 pref "merge sort"
    "scan" -> Seq("table scan"), // same term as ONT2 D002 pref → 2 classes, 1 term
    "join" -> Seq("hash join"),
    "data" -> Seq("big data"),
    "agg" -> Seq("window agg"),
    "query" -> Seq("slow query", "fast query"),
    "stream" -> Seq("data stream"),
    "key" -> Seq("key value"))

  /** ONT2 bigram concepts; even-indexed share a CUI with the ONT1 concept of
    * their first word (cross-ontology same-CUI → mapping + canonicalization). */
  val ont2Labels: Vector[String] = Vector(
    "hash join", "merge sort", "table scan", "window agg", "sort merge",
    "group agg", "big data", "data stream", "key value", "query filter")

  private def cuiOf(word: String): String = f"C${vocab.indexOf(word)}%07d"

  val concepts: Vector[Concept] = {
    val ont1 = vocab.zipWithIndex.map { case (w, i) =>
      Concept(iri1(i), "ONT1", w, synMap.getOrElse(w, Nil),
        Seq(f"T${40 + i % 5}%03d"), cuiOf(w))
    }
    val ont2 = ont2Labels.zipWithIndex.map { case (lbl, j) =>
      val firstWord = lbl.split(' ').head
      val cui = if (j % 2 == 0) cuiOf(firstWord) else f"C${1000 + j}%07d"
      Concept(iri2(j), "ONT2", lbl, Nil, Seq(f"T${50 + j % 3}%03d"), cui)
    }
    // edge-case concepts: substring-of-word, pure number, 2-char (filtered)
    val extras = Vector(
      Concept("http://fix.onto/ONT1#X001", "ONT1", "par", Nil, Seq("T060"), "C0009001"),
      Concept("http://fix.onto/ONT1#X002", "ONT1", "12345", Nil, Seq("T060"), "C0009002"),
      Concept("http://fix.onto/ONT1#X003", "ONT1", "ab", Nil, Seq("T060"), "C0009003"))
    ont1 ++ ont2 ++ extras
  }

  /** Is-a DAG: binary tree over ONT1 word concepts (depth 4 at 31 nodes),
    * plus a diamond (C006 → C001 and C006 → C002, both → C000), plus ONT2
    * children under D000. Extras and roots have no parents. */
  val edges: Vector[Edge] = {
    val tree = (1 until vocab.length).map(i => Edge(iri1(i), iri1((i - 1) / 2)))
    val diamond = Vector(Edge(iri1(6), iri1(1))) // natural parent of 6 is 2
    val ont2 = (1 until ont2Labels.length).map(j => Edge(iri2(j), iri2(0)))
    (tree ++ diamond ++ ont2).toVector
  }

  /** v2 hierarchy delta — EDGES ADDED by an ontology release (the second
    * maintenance axis next to the dict-only [[conceptsV2]] delta; feeds
    * [[graft.graph.Closure.deltaClosure]]). Three shapes on purpose:
    * a cross-ontology bridge (ONT2's root grafted under ONT1 C003 — every
    * ONT2 node gains C003/C001/C000 ancestors), a second new edge reachable
    * only THROUGH the first (C003 → X001: paths D00x ⇒ X001 traverse TWO
    * new edges — exercises the semi-naive composition rounds), and a
    * shortcut that IMPROVES an existing distance (C006 → C000 was 2 via
    * C001/C002, becomes 1 — exercises the min-distance merge). */
  val edgesDelta: Vector[Edge] = Vector(
    Edge(iri2(0), iri1(3)),
    Edge(iri1(3), "http://fix.onto/ONT1#X001"),
    Edge(iri1(6), iri1(0)))

  /** Cross-ontology mappings: CUI-identical pairs (both directions) + LOOM
    * lexical pairs — classes in DIFFERENT ontologies whose D3-normalized
    * labels (preferred OR synonym) coincide, derived by the same rule
    * [[graft.OntologyTables.loomMappings]] applies to real RDF submissions
    * (the published LOOM algorithm: Ghazvinian, Noy & Musen 2009, lexical
    * match over preferred names and synonyms). Deriving rather than curating
    * keeps the fixture and the NT-fed pipeline in exact agreement (round 2's
    * one curated LOOM pair left the NT flagship 111 triples short). */
  val mappings: Vector[Mapping] = {
    val cuiPairs = for {
      c2 <- concepts if c2.ont == "ONT2"
      c1 <- concepts if c1.ont == "ONT1" && c1.cui == c2.cui
      m <- Seq(Mapping(c1.classIri, c2.classIri, "CUI"), Mapping(c2.classIri, c1.classIri, "CUI"))
    } yield m
    def norm(s: String) =
      s.trim.replaceAll("\\s+", " ").toUpperCase(java.util.Locale.ROOT)
    val labels = concepts.flatMap(c =>
      (c.prefLabel +: c.synonyms).map(l => (norm(l), c.ont, c.classIri)))
    val loom = for {
      (l1, o1, i1) <- labels
      (l2, o2, i2) <- labels
      if l1 == l2 && o1 != o2
    } yield Mapping(i1, i2, "LOOM")
    (cuiPairs ++ loom).distinct.toVector
  }

  /** Deterministic canonicalization: preferred IRI = min(classIri) per CUI
    * (SURVEY.md §2.1 "CUI resolution"). */
  val cuiResolution: Vector[CuiRow] =
    concepts.groupBy(_.cui).map { case (cui, cs) =>
      CuiRow(cui, cs.map(_.classIri).min)
    }.toVector.sortBy(_.cui)

  // ---- Spark DataFrame views -------------------------------------------

  def conceptsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    concepts.map(c => (c.classIri, c.ont, c.prefLabel, c.synonyms, c.tuis, c.cui))
      .toDF("class_iri", "ont", "pref_label", "synonyms", "tuis", "cui")
  }

  def edgesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    edges.map(e => (e.childIri, e.parentIri)).toDF("child_iri", "parent_iri")
  }

  def edgesDeltaDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    edgesDelta.map(e => (e.childIri, e.parentIri)).toDF("child_iri", "parent_iri")
  }

  def mappingsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mappings.map(m => (m.classIri, m.mappedIri, m.kind)).toDF("class_iri", "mapped_iri", "kind")
  }

  def cuiResolutionDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cuiResolution.map(r => (r.cui, r.preferredIri)).toDF("cui", "preferred_iri")
  }

  /** Per-class resolution (class_iri, preferred_iri) — concepts joined
    * through the CUI table; the broadcast side of A9. */
  def classResolutionDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val prefByCui = cuiResolution.map(r => r.cui -> r.preferredIri).toMap
    concepts.map(c => (c.classIri, prefByCui(c.cui)))
      .toDF("class_iri", "preferred_iri")
  }

  // ---- DuckDB oracle inlining ------------------------------------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Exploded raw label rows `(class_iri, ont, label, pref)` as SQL VALUES —
    * the D2 output, so the dict oracle re-derives D3–D6 itself. */
  def labelRowsValues: String =
    concepts.flatMap { c =>
      ((c.prefLabel, true) +: c.synonyms.map(s => (s, false))).map { case (lbl, pref) =>
        s"(${q(c.classIri)}, ${q(c.ont)}, ${q(lbl)}, $pref)"
      }
    }.mkString(", ")

  /** Normalized, filtered dictionary `(term, class_iri, ont, pref)` computed
    * in pure Scala with the SAME normalization contract as DictBuild — used
    * both as oracle VALUES and as the in-test expected dictionary. */
  def dictRows(minTermSize: Int = 3, excludeNumbers: Boolean = false,
               cs: Vector[Concept] = concepts): Vector[graft.DictTerm] =
    cs.flatMap { c =>
      ((c.prefLabel, true) +: c.synonyms.map(s => (s, false))).map { case (lbl, pref) =>
        val norm = lbl.trim.replaceAll("\\s+", " ").toUpperCase(java.util.Locale.ROOT)
        graft.DictTerm(norm, c.classIri, c.ont, pref)
      }
    }.filter(t => t.term.length >= minTermSize &&
        !(excludeNumbers && t.term.matches("^[0-9.,]+$")))
      .distinct.sortBy(t => (t.term, t.classIri, t.ont))

  /** All declared concept IRIs as SQL VALUES — the sh:class universe for
    * the SHACL dangling-object leg (UNFILTERED: the concept scheme, not the
    * minTermSize-filtered dictionary). */
  def conceptIriValues: String =
    concepts.map(c => s"(${q(c.classIri)})").mkString(", ")

  /** `(term, class_iri, ont, pref)` VALUES of the NORMALIZED dictionary. */
  def dictValues: String =
    dictRows().map(t => s"(${q(t.term)}, ${q(t.classIri)}, ${q(t.ont)}, ${t.pref})")
      .mkString(", ")

  // ---- v2 dictionary (the incremental-update fixture) --------------------

  /** The DICT-ONLY v1→v2 update for the incremental re-annotation path
    * ([[graft.annotate.Incremental]]): "query" loses both synonyms
    * (removed-rows leg), "big data" is renamed to a label that never occurs
    * in the corpus (remove + no-hit add), and a new ONT3 class reuses the
    * occurring word "filter" (added-term leg with real hits). Classes,
    * edges, mappings and CUI tables are UNCHANGED — the precondition under
    * which an incremental update is sound (a class/hierarchy change
    * invalidates expansion maps and needs the full rebuild). */
  val conceptsV2: Vector[Concept] = concepts.map {
    case c if c.ont == "ONT1" && c.prefLabel == "query" => c.copy(synonyms = Nil)
    case c if c.ont == "ONT2" && c.prefLabel == "big data" => c.copy(prefLabel = "bigdata")
    case c => c
  } :+ Concept("http://fix.onto/ONT3#N001", "ONT3", "filter", Nil, Seq("T060"), "C0009101")

  def conceptsV2Df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    conceptsV2.map(c => (c.classIri, c.ont, c.prefLabel, c.synonyms, c.tuis, c.cui))
      .toDF("class_iri", "ont", "pref_label", "synonyms", "tuis", "cui")
  }

  /** v2 dictionary VALUES for the incremental oracle's dict CTE. */
  def dictValuesV2: String =
    dictRows(cs = conceptsV2)
      .map(t => s"(${q(t.term)}, ${q(t.classIri)}, ${q(t.ont)}, ${t.pref})")
      .mkString(", ")

  /** `(class_iri, tui)` exploded semantic-type VALUES rows. */
  def tuisValues: String =
    concepts.flatMap(c => c.tuis.map(t => s"(${q(c.classIri)}, ${q(t)})")).mkString(", ")

  def edgesValues: String =
    edges.map(e => s"(${q(e.childIri)}, ${q(e.parentIri)})").mkString(", ")

  def edgesDeltaValues: String =
    edgesDelta.map(e => s"(${q(e.childIri)}, ${q(e.parentIri)})").mkString(", ")

  def mappingsValues: String =
    mappings.map(m => s"(${q(m.classIri)}, ${q(m.mappedIri)}, ${q(m.kind)})").mkString(", ")

  def cuiResolutionValues: String = {
    // (class_iri, preferred_iri) — already joined through CUI for SQL simplicity
    concepts.map { c =>
      val pref = cuiResolution.find(_.cui == c.cui).get.preferredIri
      s"(${q(c.classIri)}, ${q(pref)})"
    }.mkString(", ")
  }
}
