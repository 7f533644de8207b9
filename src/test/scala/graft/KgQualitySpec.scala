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
}
