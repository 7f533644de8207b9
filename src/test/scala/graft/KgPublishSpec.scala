package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.KgPublish

/** KG-publication operators on crafted inputs small enough to check by
  * hand; the whole-pipeline forms are oracle-gated (`kg_construct_rule`,
  * `kg_path_query`, `kg_encoded_store`, `kg_void_stats`, `kg_prov_bundle`,
  * `kg_owl_horst`). */
class KgPublishSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def triplesDf(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj")
  }

  test("construct: template instantiation with CONSTRUCT set semantics") {
    import spark.implicits._
    // doc://1 matches (c in desc set, has mapped m1 and m2); doc://2 has a
    // direct annotation OUTSIDE the descendant set (no solution); doc://3
    // re-derives the SAME (cA, m1) pair — must dedup to one triple.
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "cA"),
      ("doc://1", Pred.Mapped, "m1"),
      ("doc://1", Pred.Mapped, "m2"),
      ("doc://2", Pred.Direct, "cOut"),
      ("doc://2", Pred.Mapped, "m9"),
      ("doc://3", Pred.Direct, "cA"),
      ("doc://3", Pred.Mapped, "m1")))
    val desc = Seq("cA", "cB").toDF("c")
    val got = KgPublish.construct(t, desc)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("cA", KgPublish.CoMentionPred, "m1"),
      ("cA", KgPublish.CoMentionPred, "m2")))
  }

  test("pathQuery: alternation + zero-length star leg") {
    import spark.implicits._
    // closure: c1 -> root (1 hop). doc://1 reaches root via hasAnnotation
    // on c1; doc://2 hits the root DIRECTLY (the subClassOf* zero-length
    // leg) via the mapped predicate; doc://3 annotates an unrelated
    // concept; the expanded predicate never participates (not in the
    // alternation).
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "c1"),
      ("doc://2", Pred.Mapped, "root"),
      ("doc://3", Pred.Direct, "other"),
      ("doc://4", Pred.Expanded, "c1")))
    val closure = Seq(("c1", "root", 1)).toDF("child", "ancestor", "distance")
    val got = KgPublish.pathQuery(t, closure, "root")
      .as[(String, String)].collect().toSet
    assert(got === Set(("doc://1", Pred.Direct), ("doc://2", Pred.Mapped)))
  }

  test("encodeTriples: dense rank ids, decode == identity") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("b", "p", "a"),
      ("b", "p", "c"),
      ("a", "q", "c")))
    // distinct terms sorted: a=1, b=2, c=3, p=4, q=5
    val got = KgPublish.encodeTriples(t)
      .as[(Long, Long, Long, String, String, String)].collect().toSet
    assert(got === Set(
      (2L, 4L, 1L, "b", "p", "a"),
      (2L, 4L, 3L, "b", "p", "c"),
      (1L, 5L, 3L, "a", "q", "c")))
  }

  test("voidStats: dataset rows + per-predicate partitions") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("d1", "p1", "o1"),
      ("d1", "p1", "o2"),
      ("d2", "p2", "o1")))
    val got = KgPublish.voidStats(t, "ds:x")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("ds:x", "void:triples", "3"),
      ("ds:x", "void:distinctSubjects", "2"),
      ("ds:x", "void:distinctObjects", "2"),
      ("ds:x", "void:properties", "2"),
      ("ds:x", "void:propertyPartition", "ds:x/prop/p1"),
      ("ds:x/prop/p1", "void:property", "p1"),
      ("ds:x/prop/p1", "void:triples", "2"),
      ("ds:x/prop/p1", "void:distinctSubjects", "1"),
      ("ds:x/prop/p1", "void:distinctObjects", "2"),
      ("ds:x", "void:propertyPartition", "ds:x/prop/p2"),
      ("ds:x/prop/p2", "void:property", "p2"),
      ("ds:x/prop/p2", "void:triples", "1"),
      ("ds:x/prop/p2", "void:distinctSubjects", "1"),
      ("ds:x/prop/p2", "void:distinctObjects", "1")))
  }

  test("provBundle: batch entities + fixed activity/dict rows") {
    import spark.implicits._
    // doc ids 1 and 5 land in batch1, doc 2 in batch2
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "c1"),
      ("doc://5", Pred.Direct, "c2"),
      ("doc://2", Pred.Direct, "c1")))
    val got = KgPublish.provBundle(t, "v9")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("http://graft.kg/g#batch1", "rdf:type", "prov:Entity"),
      ("http://graft.kg/g#batch1", "prov:wasGeneratedBy", "http://graft.kg/a#annotate_v9"),
      ("http://graft.kg/g#batch1", "graft:tripleCount", "2"),
      ("http://graft.kg/g#batch2", "rdf:type", "prov:Entity"),
      ("http://graft.kg/g#batch2", "prov:wasGeneratedBy", "http://graft.kg/a#annotate_v9"),
      ("http://graft.kg/g#batch2", "graft:tripleCount", "1"),
      ("http://graft.kg/a#annotate_v9", "rdf:type", "prov:Activity"),
      ("http://graft.kg/a#annotate_v9", "prov:used", "http://graft.kg/dict#v9"),
      ("http://graft.kg/dict#v9", "rdf:type", "prov:Entity"),
      ("http://graft.kg/dict#v9", "prov:wasAttributedTo", "http://graft.kg/agent#graft")))
  }

  test("owlHorst: each rule fires exactly where crafted") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "c1"),
      ("doc://1", Pred.Direct, "c1"), // duplicate — rdfp8 must dedup
      ("doc://1", Pred.Mapped, "m1"))) // mapped leg never inverts
    val maps = Seq(("c1", "m1", "xref")).toDF("class_iri", "mapped_iri", "kind")
    val closure = Seq(("c1", "root", 1), ("c1", "root", 2))
      .toDF("child", "ancestor", "distance") // dup distances — rdfp4 dedups
    val got = KgPublish.owlHorst(t, maps, closure)
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(
      ("c1", KgPublish.InverseOfDirect, "doc://1", "rdfp8"),
      ("c1", "mappedTo", "m1", "rdfp3"),
      ("m1", "mappedTo", "c1", "rdfp3"),
      ("c1", "subClassOf", "root", "rdfp4")))
  }

  test("describe: CBD pulls seed triples + fragment sub-node descriptions only") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("u1", "rdf:type", "schema:Article"),
      ("u1", "schema:author", "u1#author"),
      ("u1#author", "schema:name", "Ann"),
      ("u1#author", "rdf:type", "schema:Person"),
      ("u1", "schema:about", "u2"), // plain IRI object — must NOT expand
      ("u2", "rdf:type", "schema:Article"), // a second seed
      ("u3", "rdf:type", "schema:Product"), // not a seed
      ("u3", "schema:name", "W")))
    val seeds = Seq("u1", "u2").toDF("subj")
    val got = KgPublish.describe(t, seeds)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("u1", "rdf:type", "schema:Article"),
      ("u1", "schema:author", "u1#author"),
      ("u1", "schema:about", "u2"),
      ("u1#author", "schema:name", "Ann"),
      ("u1#author", "rdf:type", "schema:Person"),
      ("u2", "rdf:type", "schema:Article")))
  }

  test("ask: true on satisfiable path, false on the phantom predicate") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("doc://1", "hasAnnotation", "c1"),
      ("doc://2", "hasMappedAnnotation", "root")))
    val closure = Seq(("c1", "root", 1)).toDF("child", "ancestor", "distance")
    val got = KgPublish.ask(t, closure, "root")
      .as[(String, Boolean)].collect().toMap
    assert(got === Map("path_to_root" -> true, "phantom_pred" -> false))
    // an empty triple table answers false on both
    val none = KgPublish.ask(t.limit(0), closure, "root")
      .as[(String, Boolean)].collect().toMap
    assert(none === Map("path_to_root" -> false, "phantom_pred" -> false))
  }

  test("unionMinus: UNION binds via, FILTER drops odd docs, MINUS drops root descendants") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("doc://2", Pred.Direct, "cA"), // kept (even, cA outside the subtree)
      ("doc://2", Pred.Expanded, "cB"), // kept via the UNION branch
      ("doc://3", Pred.Direct, "cA"), // FILTER: odd trailing digit
      ("doc://4", Pred.Direct, "cUnder"), // MINUS: cUnder ⊑ root
      ("doc://8", Pred.Expanded, "cA"), // duplicate solution (two rows,
      ("doc://8", Pred.Expanded, "cA"), //  one SET entry)
      ("doc://6", Pred.Mapped, "cA"))) // mapped pred: not in the UNION
    val closure = Seq(("cUnder", "root", 1), ("cA", "elsewhere", 1))
      .toDF("child", "ancestor", "distance")
    val got = KgPublish.unionMinus(t, closure, "root")
      .as[(String, String, String)].collect().toList
    assert(got.toSet === Set(
      ("doc://2", "cA", Pred.Direct),
      ("doc://2", "cB", Pred.Expanded),
      ("doc://8", "cA", Pred.Expanded)))
    assert(got.size === 3) // DISTINCT: the doc://8 dup collapsed
  }

  test("reify: 5 rows per distinct fact, content-addressed + idempotent") {
    import spark.implicits._
    val t = triplesDf(Seq(
      ("doc://1", Pred.Direct, "cA"),
      ("doc://1", Pred.Direct, "cA"), // duplicate fact: ONE statement node
      ("doc://2", Pred.Mapped, "cB")))
    val got = KgPublish.reify(t, "v1")
      .as[(String, String, String)].collect().toList
    assert(got.size === 10) // 2 distinct facts × 5 rows
    val stmts = got.map(_._1).distinct
    assert(stmts.size === 2)
    assert(stmts.forall(_.startsWith(KgPublish.StmtPrefix)))
    // every statement node carries the full reification quad + qualifier
    for (s <- stmts) {
      val preds = got.filter(_._1 == s).map(_._2).toSet
      assert(preds === Set("rdf:type", "rdf:subject", "rdf:predicate",
        "rdf:object", "prov:wasDerivedFrom"))
    }
    // content-addressing: the same fact reifies to the same node across
    // independent runs (what makes cross-release qualifier joins work)
    val again = KgPublish.reify(triplesDf(Seq(("doc://1", Pred.Direct, "cA"))),
      "v1").as[(String, String, String)].collect().toList
    assert(again.map(_._1).distinct === got
      .filter(r => r._2 == "rdf:subject" && r._3 == "doc://1")
      .map(_._1).distinct)
    // the separator prevents boundary collisions: ("a","bc") != ("ab","c")
    val x = KgPublish.reify(triplesDf(Seq(("a", "bc", "d"))), "v1")
    val y = KgPublish.reify(triplesDf(Seq(("ab", "c", "d"))), "v1")
    assert(x.select("subj").distinct().collect().head.getString(0) !==
      y.select("subj").distinct().collect().head.getString(0))
  }
}
