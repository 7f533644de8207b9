package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.KgQuality

/** KG-release quality gates over crafted triple tables: each SHACL-lite
  * shape fires exactly where seeded (and nowhere else), and the RDFS
  * materialization emits the full rdfs2/rdfs3/rdfs9 type set. The
  * whole-pipeline forms are oracle-gated (`kg_shacl_report`,
  * `kg_rdfs_types`); these specs pin the per-shape semantics on inputs
  * small enough to check by hand. */
class KgQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def triplesDf(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj")
  }

  test("shaclReport: each shape fires exactly where crafted") {
    import spark.implicits._
    // doc://1 — over the direct-annotation cap AND no mapped annotation;
    // doc://2 — conforming (1 direct + 1 mapped);
    // doc://3 — mapped present, but one expanded object outside the
    //           concept universe (the sh:class negative control);
    // bad://x — malformed subject IRI (sh:pattern), also unmapped.
    val overCap = (1 to KgQuality.shaclMaxDirect + 1)
      .map(i => ("doc://1", Pred.Direct, s"http://c/$i"))
    val t = triplesDf(overCap ++ Seq(
      ("doc://2", Pred.Direct, "http://c/1"),
      ("doc://2", Pred.Mapped, "http://ext/1"),
      ("doc://3", Pred.Direct, "http://c/2"),
      ("doc://3", Pred.Mapped, "http://ext/2"),
      ("doc://3", Pred.Expanded, "http://c/unknown"),
      ("bad://x", Pred.Direct, "http://c/1")))
    val universe = (1 to 30).map(i => s"http://c/$i").toDF("class_iri")
    val got = KgQuality.shaclReport(t, universe)
      .as[(String, String, String)].collect().toSet
    val n = (KgQuality.shaclMaxDirect + 1).toString
    assert(got === Set(
      ("doc://1", "MaxDirectAnnotations", n),
      ("doc://1", "MissingMappedAnnotation", n),
      ("bad://x", "MissingMappedAnnotation", "1"),
      ("doc://3", "DanglingExpandedObject", "http://c/unknown"),
      ("bad://x", "SubjectPattern", "bad://x")))
  }

  test("shaclReport: a conforming triple table yields an empty report") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "http://c/1"),
      ("doc://1", Pred.Mapped, "http://ext/1"),
      ("doc://1", Pred.Expanded, "http://c/2")))
    val universe = Seq("http://c/1", "http://c/2").toDF("class_iri")
    assert(KgQuality.shaclReport(t, universe).count() === 0)
  }

  test("rdfsTypes: rdfs2/rdfs3 typing + rdfs9 multi-hop lift") {
    import spark.implicits._
    val D = "http://graft.kg/t#Document"
    val C = "http://graft.kg/t#Concept"
    val X = "http://graft.kg/t#ExternalConcept"
    val E = "http://graft.kg/t#Entity"
    val R = "http://graft.kg/t#Resource"
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "http://c/1"),
      ("doc://1", Pred.Mapped, "http://ext/1")))
    val got = KgQuality.rdfsTypes(t).as[(String, String)].collect().toSet
    assert(got === Set(
      ("doc://1", D), ("doc://1", R),                      // rdfs2 + one hop
      ("http://c/1", C), ("http://c/1", E), ("http://c/1", R), // rdfs3 + 2 hops
      ("http://ext/1", X), ("http://ext/1", E), ("http://ext/1", R)))
  }

  test("rdfsTypes: duplicate triples do not duplicate type assertions") {
    val t = triplesDf(Seq.fill(3)(("doc://1", Pred.Direct, "http://c/1")))
    val out = KgQuality.rdfsTypes(t)
    assert(out.count() === out.distinct().count())
  }

  // ---- AMIE-style rule mining (RuleMine) --------------------------------

  private def emptyEdges = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("child_iri", "parent_iri")
  }
  private def emptyMaps = {
    import spark.implicits._
    Seq.empty[(String, String, String)].toDF("class_iri", "mapped_iri", "kind")
  }

  test("mineRules: hand-checkable chain rule with exact AMIE metrics") {
    // 6 persons live in cityA; cityA is in countryX; 5 of the 6 carry the
    // countryfact — support 5, bodySize 6, headSize 5:
    //   stdConf = 5/6, headCoverage = 1.0, pcaConf = 5/5 = 1.0
    // (person6 has NO livesInCountry fact, so PCA excludes their pair).
    val persons = (1 to 6).map(i => (s"p$i", "livesIn", "cityA"))
    val country = Seq(("cityA", "cityIn", "countryX"))
    val heads = (1 to 5).map(i => (s"p$i", "livesInCountry", "countryX"))
    val t = triplesDf(persons ++ country ++ heads)
    val rules = graft.ops.RuleMine.mineRules(t, emptyEdges, emptyMaps)
      .filter(col("p1") === "livesIn" && col("p2") === "cityIn" &&
        col("head_pred") === "livesInCountry")
      .collect()
    assert(rules.length === 1)
    val r = rules.head
    assert(r.getAs[Long]("support") === 5L)
    assert(r.getAs[Long]("body_size") === 6L)
    assert(r.getAs[Double]("head_coverage") === 1.0)
    assert(r.getAs[Double]("std_conf") === 0.833333)
    assert(r.getAs[Double]("pca_conf") === 1.0)
  }

  test("inferTriples: completes exactly the missing fact, never a known one") {
    val persons = (1 to 6).map(i => (s"p$i", "livesIn", "cityA"))
    val country = Seq(("cityA", "cityIn", "countryX"))
    val heads = (1 to 5).map(i => (s"p$i", "livesInCountry", "countryX"))
    val t = triplesDf(persons ++ country ++ heads)
    val inferred = graft.ops.RuleMine.inferTriples(t, emptyEdges, emptyMaps)
      .filter(col("pred") === "livesInCountry").collect()
    assert(inferred.length === 1)
    assert(inferred.head.getAs[String]("subj") === "p6")
    assert(inferred.head.getAs[String]("obj") === "countryX")
    assert(inferred.head.getAs[Double]("conf") === 1.0)
    assert(inferred.head.getAs[Long]("n_rules") === 1L)
  }

  test("mineRules: FanCap prunes chains through a hot middle entity") {
    // hub's out-fan (FanCap + 1) exceeds the prune, so no body pair may
    // route through it as the SECOND atom — the would-be rule vanishes
    // even though its support would clear the floor.
    val in = (1 to 10).map(i => (s"s$i", "pIn", "hub"))
    val out = (1 to graft.ops.RuleMine.FanCap + 1)
      .map(j => ("hub", "pOut", s"o$j"))
    val heads = (1 to 10).map(i => (s"s$i", "pHead", "o1"))
    val t = triplesDf(in ++ out ++ heads)
    val rules = graft.ops.RuleMine.mineRules(t, emptyEdges, emptyMaps)
      .filter(col("p1") === "pIn" && col("p2") === "pOut").collect()
    assert(rules.isEmpty)
  }

  test("mineRules on the pipeline's own KG: expansion semantics re-emerge at conf 1.0") {
    // the expansion semantics the pipeline implements MUST be mined back
    // as confidence-1.0 rules from its own output — the end-to-end
    // semantic self-check (metric exactness is oracle-gated; this pins
    // the interpretability claim the operator exists for)
    val rules = SparkEntry.queries("kg_rule_mine")(spark, "/root/testdata/sf0.001")
      .filter(col("std_conf") === 1.0 && col("pca_conf") === 1.0)
      .select("p1", "p2", "head_pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rules.contains((Pred.Direct, graft.ops.RuleMine.SubClassOf, Pred.Expanded)))
    assert(rules.contains((Pred.Direct, graft.ops.RuleMine.MappedTo, Pred.Mapped)))
    assert(rules.contains((Pred.Expanded, graft.ops.RuleMine.SubClassOf, Pred.Expanded)))
  }
}
