package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Pred

/** KG-release quality gates over the canonical triple table
  * (subj, pred, obj — SURVEY.md §2.3): SHACL-lite shape validation and
  * RDFS-rule type materialization. Both consume the triple table as the ONE
  * big input and keep every schema/constraint side tiny and broadcast —
  * at 10^12 triples the plans below are one scan plus hash aggregations on
  * `subj` (co-partitioned with the triple sink's layout), never a shuffle
  * of anything wider than (subj, pred) pairs.
  *
  * Constraint/schema constants live here ONCE and are interpolated into the
  * DuckDB oracle SQL by the paired builders ([[shaclMaxDirect]],
  * [[propSchemaValues]], [[typeEdgesValues]]) — the house single-source-of-
  * truth contract for query/oracle literal agreement.
  */
object KgQuality {

  /** sh:maxCount for direct annotations per document — chosen to produce
    * BOTH violating and conforming subjects on the seeded corpus. */
  val shaclMaxDirect = 20

  /** The `kg_bgp_star` pattern's class root — C001 heads roughly half the
    * fixture's ONT1 binary tree, so the descendant set has real fanout. */
  val bgpRoot = "http://fix.onto/ONT1#C001"

  /** SHACL-lite validation report over the triple table. Four shapes, each
    * the relational form of a core SHACL constraint component:
    *
    *  - `MaxDirectAnnotations` (sh:maxCount): a document with more than
    *    [[shaclMaxDirect]] distinct direct annotations — the hub-page smell
    *    a curation pass reviews first.
    *  - `MissingMappedAnnotation` (sh:minCount): a document with direct
    *    annotations but NO cross-ontology mapped annotation — coverage gaps
    *    in the mapping table surface here.
    *  - `DanglingExpandedObject` (sh:class): an expanded-annotation object
    *    absent from the concept universe — a closure bug would put rows
    *    here, so the leg is a checked NEGATIVE control (empty by
    *    construction, and the oracle proves it empty the same way).
    *  - `SubjectPattern` (sh:pattern): subjects must match `^doc://[0-9]+$`
    *    — the second negative control (any emitter writing malformed
    *    subject IRIs fails this leg loudly).
    *
    * Shapes: one aggregation per cardinality leg (partial aggregation
    * map-side, keys are subj — the sink's partition key, so at-rest layouts
    * make these exchanges cheap); the sh:class leg is a broadcast LEFT ANTI
    * join against the (small, ontology-scale) concept set. Output is the
    * standard validation-report triple (focus, shape, detail).
    */
  def shaclReport(triples: DataFrame, conceptIris: DataFrame): DataFrame = {
    val direct = triples.filter(col("pred") === Pred.Direct)
    val mapped = triples.filter(col("pred") === Pred.Mapped)
    val expanded = triples.filter(col("pred") === Pred.Expanded)

    val maxCount = direct.groupBy(col("subj"))
      .agg(countDistinct(col("obj")).as("n"))
      .filter(col("n") > shaclMaxDirect)
      .select(col("subj").as("focus"), lit("MaxDirectAnnotations").as("shape"),
        col("n").cast("string").as("detail"))

    val minMapped = direct.groupBy(col("subj"))
      .agg(countDistinct(col("obj")).as("n"))
      .join(mapped.select(col("subj")).distinct(), Seq("subj"), "left_anti")
      .select(col("subj").as("focus"), lit("MissingMappedAnnotation").as("shape"),
        col("n").cast("string").as("detail"))

    val dangling = expanded.select(col("subj"), col("obj")).distinct()
      .join(broadcast(conceptIris.select(col("class_iri").as("obj"))),
        Seq("obj"), "left_anti")
      .select(col("subj").as("focus"), lit("DanglingExpandedObject").as("shape"),
        col("obj").as("detail"))

    val badSubj = triples.select(col("subj")).distinct()
      .filter(!col("subj").rlike("^doc://[0-9]+$"))
      .select(col("subj").as("focus"), lit("SubjectPattern").as("shape"),
        col("subj").as("detail"))

    maxCount.unionByName(minMapped).unionByName(dangling).unionByName(badSubj)
  }

  // ---- RDFS type materialization -----------------------------------------

  /** Property schema (pred → rdfs:domain, rdfs:range) for the three triple
    * legs — the tiny T-Box side of the inference join. */
  val propSchema: Seq[(String, String, String)] = Seq(
    (Pred.Direct, "http://graft.kg/t#Document", "http://graft.kg/t#Concept"),
    (Pred.Expanded, "http://graft.kg/t#Document", "http://graft.kg/t#Concept"),
    (Pred.Mapped, "http://graft.kg/t#Document", "http://graft.kg/t#ExternalConcept"))

  /** Type-level subclass edges (rdfs:subClassOf) — two levels deep so the
    * rdfs9 lift is a real multi-hop closure, not one join. */
  val typeEdges: Seq[(String, String)] = Seq(
    ("http://graft.kg/t#Document", "http://graft.kg/t#Resource"),
    ("http://graft.kg/t#Concept", "http://graft.kg/t#Entity"),
    ("http://graft.kg/t#ExternalConcept", "http://graft.kg/t#Entity"),
    ("http://graft.kg/t#Entity", "http://graft.kg/t#Resource"))

  private def q(s: String) = "'" + s.replace("'", "''") + "'"

  /** VALUES list twins for the DuckDB oracle. */
  def propSchemaValues: String =
    propSchema.map { case (p, d, r) => s"(${q(p)}, ${q(d)}, ${q(r)})" }.mkString(", ")
  def typeEdgesValues: String =
    typeEdges.map { case (c, p) => s"(${q(c)}, ${q(p)})" }.mkString(", ")

  /** RDFS entailment materialization over the triple table — the three
    * rules that matter for A-Box typing, as one declarative plan:
    *
    *  - rdfs2: (s p o), (p rdfs:domain D) ⇒ (s rdf:type D)
    *  - rdfs3: (s p o), (p rdfs:range R) ⇒ (o rdf:type R)
    *  - rdfs9: (x rdf:type C), (C ⊑* C') ⇒ (x rdf:type C')
    *
    * Plan shape at scale: the schema and the type-edge closure are a few
    * ROWS (T-Box), so both inference joins broadcast; the only exchange is
    * the final distinct on (node, rdf_type) — exactly the dedup any
    * entailment materialization must pay. The subclass closure is computed
    * with the same bounded-depth machinery as the ontology closure
    * ([[graft.graph.Closure.transitiveClosure]]), on a table small enough
    * that the driver-side loop cost is nil. */
  def rdfsTypes(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val schema = propSchema.toDF("pred", "domain_type", "range_type")
    val tEdges = typeEdges.toDF("child_iri", "parent_iri")
    val tClosure = graft.graph.Closure.transitiveClosure(tEdges, maxLevel = 4)
      .select(col("child").as("rdf_type"), col("ancestor").as("ancestor_iri"))

    val base = triples.join(broadcast(schema), Seq("pred"))
      .select(col("subj").as("node"), col("domain_type").as("rdf_type"))
      .unionByName(triples.join(broadcast(schema), Seq("pred"))
        .select(col("obj").as("node"), col("range_type").as("rdf_type")))

    val lifted = base.join(broadcast(tClosure), Seq("rdf_type"))
      .select(col("node"), col("ancestor_iri").as("rdf_type"))

    base.unionByName(lifted).distinct()
  }
}
