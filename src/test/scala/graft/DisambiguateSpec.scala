package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.annotate.Disambiguate

/** Collective disambiguation: context co-occurrence votes beat the prior,
  * the prior decides context-free mentions, class_iri breaks dead ties. */
class DisambiguateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("votes, prior fallback, and lexicographic tie-break") {
    import spark.implicits._
    // surfaces: "hash join" → {C012, D000} (ambiguous); "hj only" → C012;
    // "d only" → D000; "sort" → CS (all unambiguous)
    val matches = Seq(
      // doc1: ambiguous mention + SORT context; C012 co-occurs with CS
      // (via doc3) so C012 should win despite D000's larger prior
      ("doc1", "hash join", "C012"), ("doc1", "hash join", "D000"),
      ("doc1", "sort", "CS"),
      // doc3 anchors the cooc edge (C012, CS) unambiguously
      ("doc3", "hj only", "C012"), ("doc3", "sort", "CS"),
      // d4/d5 give D000 the bigger corpus prior (2 docs vs C012's 1)
      ("doc4", "d only", "D000"), ("doc5", "d only", "D000"),
      // doc2: ambiguous mention with NO unambiguous context → prior → D000
      ("doc2", "hash join", "C012"), ("doc2", "hash join", "D000"),
      // doc6: ambiguous surface whose candidates have NO context and NO
      // prior → lexicographic class_iri → AAA
      ("doc6", "merge sort", "AAA"), ("doc6", "merge sort", "ZZZ"))
      .toDF("url", "text", "class_iri")
    val got = Disambiguate.collective(matches).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(got === Map(
      ("doc1", "HASH JOIN") -> (("C012", 1L)), // one cooc vote via CS
      ("doc2", "HASH JOIN") -> (("D000", 0L)), // prior 2 beats prior 1
      ("doc6", "MERGE SORT") -> (("AAA", 0L)))) // pure tie → min class_iri
  }

  test("hub docs above maxPerDoc drop from votes, context, AND prior (one universe)") {
    import spark.implicits._
    val matches = Seq(
      // hub doc: 3 unambiguous concepts > cap of 2 — excluded everywhere.
      // X would otherwise gain cooc(X, CS) and a prior of 1
      ("hub", "sx", "X"), ("hub", "sort", "CS"), ("hub", "sz", "Z"),
      // small doc anchors cooc(Y, CS) legitimately
      ("d1", "sy", "Y"), ("d1", "sort", "CS"),
      // the ambiguous doc: context CS; candidates X and Y
      ("d2", "amb term", "X"), ("d2", "amb term", "Y"), ("d2", "sort", "CS"))
      .toDF("url", "text", "class_iri")
    val got = Disambiguate.collective(matches, maxPerDoc = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // with the hub counted, X and Y would tie at one vote each and X would
    // win the class_iri tie-break; the cap leaves only cooc(Y, CS) → Y wins
    assert(got === Map(("d2", "AMB TERM") -> (("Y", 1L))))
  }

  test("ambiguity is per (url, surface): unique-candidate mentions never emitted") {
    import spark.implicits._
    val matches = Seq(
      ("d1", "alpha", "A"), ("d1", "beta", "B"),
      ("d2", "alpha", "A")).toDF("url", "text", "class_iri")
    assert(Disambiguate.collective(matches).count() === 0)
  }
}
