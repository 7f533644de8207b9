package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dict.DictBuild
import graft.fixture.OntologyFixture
import graft.io.NTriples

/** D1 interop — the RDF (N-Triples) ontology source: scalar parser contract,
  * distributed file round-trip against the fixture tables, and dictionary
  * parity (a dict built from the NT-parsed concept table must be
  * byte-identical to one built from the in-memory fixture). */
class NTriplesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scalar parser: IRIs, literals, escapes, lang tags, datatypes, comments") {
    import NTriples.{parseLine, Stmt}
    assert(parseLine("") === None)
    assert(parseLine("   # a comment") === None)
    assert(parseLine("<http://x/a> <http://x/p> <http://x/b> .") ===
      Some(Stmt("http://x/a", "http://x/p", "http://x/b", literal = false)))
    assert(parseLine("""<http://x/a> <http://x/p> "plain" .""") ===
      Some(Stmt("http://x/a", "http://x/p", "plain", literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "q\"uote\\slash\nnl\tt" .""") ===
      Some(Stmt("http://x/a", "http://x/p", "q\"uote\\slash\nnl\tt", literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "café" .""") ===
      Some(Stmt("http://x/a", "http://x/p", "café", literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "\U0001F600" .""") ===
      Some(Stmt("http://x/a", "http://x/p", new String(Character.toChars(0x1F600)), literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "hello"@en .""") ===
      Some(Stmt("http://x/a", "http://x/p", "hello", literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .""") ===
      Some(Stmt("http://x/a", "http://x/p", "42", literal = true)))
    // dot IMMEDIATELY after a lang tag is valid N-Triples (review finding:
    // the tag loop used to swallow it)
    assert(parseLine("""<http://x/a> <http://x/p> "hi"@en.""") ===
      Some(Stmt("http://x/a", "http://x/p", "hi", literal = true)))
    assert(parseLine("""<http://x/a> <http://x/p> "hi"@en-GB . # c""") ===
      Some(Stmt("http://x/a", "http://x/p", "hi", literal = true)))
    intercept[IllegalArgumentException](parseLine("<http://x/a> <http://x/p> ."))
    intercept[IllegalArgumentException](parseLine("""<http://x/a> <http://x/p> "no dot""""))
    intercept[IllegalArgumentException](parseLine("""<http://x/a> <http://x/p> "bad\qesc" ."""))
    // two statements glued on one line must FAIL loudly, not silently drop
    // the second (review finding)
    intercept[IllegalArgumentException](
      parseLine("""<http://x/a> <http://x/p> "L1" . <http://x/b> <http://x/p> "L2" ."""))
  }

  test("blank-node statements: skipped (not rejected) in the strict path") {
    import NTriples.parseLine
    // axiom-reification plumbing common in real BioPortal/OWL submissions:
    // well-formed bnode statements carry no labels of interest → None
    assert(parseLine("_:b0 <http://x/p> <http://x/b> .") === None)
    assert(parseLine("<http://x/a> <http://x/p> _:b0 .") === None)
    assert(parseLine("""_:genid1 <http://x/p> "lit" .""") === None)
    assert(parseLine("<http://x/a> <http://x/p> _:b0.") === None) // dot glued to label
    assert(parseLine("_:b.0-x <http://x/p> _:c .") === None) // internal dot/dash
    // malformed bnode statements still fail loudly
    assertThrows[IllegalArgumentException](parseLine("_: <http://x/p> <http://x/b> ."))
    assertThrows[IllegalArgumentException](parseLine("<http://x/a> <http://x/p> _:b0"))
    // and a whole strict Dataset parse survives interleaved bnode lines
    import spark.implicits._
    val lines = Seq(
      "<http://x/a> <http://www.w3.org/2004/02/skos/core#prefLabel> \"alpha\" .",
      "_:b0 <http://www.w3.org/2002/07/owl#annotatedSource> <http://x/a> .",
      "<http://x/a> <http://x/p> _:b0 .").toDS()
    val parsed = NTriples.statements(lines).collect()
    assert(parsed.length === 1 && parsed.head.getString(0) === "http://x/a")
  }

  test("escapeLiteral is the parser's inverse") {
    val nasty = "a\"b\\c\nd\re\tf café"
    val line = s"""<http://x/a> <http://x/p> "${NTriples.escapeLiteral(nasty)}" ."""
    assert(NTriples.parseLine(line).get.obj === nasty)
  }

  test("literal round-trip fuzz: 500 seeded random strings survive escape->parse") {
    val rnd = new scala.util.Random(42) // seeded — deterministic corpus
    val alphabet =
      "abcXYZ 09\"\\\n\r\t<>#.@^éπ漢" + new String(Character.toChars(0x1F600))
    (1 to 500).foreach { i =>
      val s = (0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val line = s"""<http://x/s$i> <http://x/p> "${NTriples.escapeLiteral(s)}" ."""
      val parsed = NTriples.parseLine(line)
      assert(parsed.isDefined && parsed.get.obj === s,
        s"case $i failed for ${s.map(_.toInt.toHexString).mkString(" ")}")
    }
  }

  private def canonConcepts(df: org.apache.spark.sql.DataFrame) =
    df.select(col("class_iri"), col("ont"), col("pref_label"),
        sort_array(col("synonyms")).as("synonyms"),
        sort_array(col("tuis")).as("tuis"), col("cui"))
      .collect().map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toVector
        case x => x
      }).toSet

  test("file round-trip: fixture -> N-Triples text -> concepts/edges") {
    val c = OntologyFixture.conceptsDf(spark)
    val e = OntologyFixture.edgesDf(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-nt").toString
    val onts = NTriples.writeSubmissions(c, e, dir)
    val rebuilt = onts.map { o =>
      NTriples.concepts(NTriples.read(spark, s"$dir/$o"), o)
    }.reduce(_.unionAll(_))
    assert(canonConcepts(rebuilt) === canonConcepts(c))
    val rebuiltEdges = NTriples.edges(NTriples.read(spark, s"$dir/${onts.head}"))
    assert(rebuiltEdges.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      e.collect().map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("permissive parse: bad lines to the side channel, good rows identical to strict") {
    import spark.implicits._
    val good = Seq(
      """<http://x/a> <http://x/p> "fine" .""",
      "<http://x/a> <http://x/p> <http://x/b> .")
    val bad = Seq(
      "<http://x/a> <http://x/p> .",           // missing object
      """<http://x/a> <http://x/p> "no dot"""") // missing terminator
    val mixed = spark.createDataset(scala.util.Random.shuffle(good ++ bad))
    val parsed = NTriples.statementsPermissive(mixed)
    val goodRows = parsed.filter(col("bad_line").isNull).drop("bad_line")
    val badRows = parsed.filter(col("bad_line").isNotNull)
    assert(goodRows.collect().map(_.toSeq).toSet ===
      NTriples.statements(spark.createDataset(good)).collect().map(_.toSeq).toSet)
    assert(badRows.select("bad_line").as[String].collect().toSet === bad.toSet)
    intercept[org.apache.spark.SparkException] { // strict mode still fails loudly
      NTriples.statements(mixed).collect()
    }
  }

  test("N-Quads: scalar parser + distributed serialize/parse round trip") {
    import NTriples.{parseLine, parseQuadLine, Quad}
    // graph label present
    assert(parseQuadLine("<http://x/a> <http://x/p> <http://x/b> <http://x/g> .") ===
      Some(Quad("http://x/a", "http://x/p", "http://x/b", literal = false, Some("http://x/g"))))
    // a plain triple line is legal N-Quads → default graph (None)
    assert(parseQuadLine("""<http://x/a> <http://x/p> "lit"@en .""") ===
      Some(Quad("http://x/a", "http://x/p", "lit", literal = true, None)))
    // comments / blank-node statements keep triples-mode skip semantics
    assert(parseQuadLine("  # comment") === None)
    assert(parseQuadLine("_:b <http://x/p> <http://x/b> <http://x/g> .") === None)
    // a fourth term in TRIPLES mode is a loud syntax error, not a graph
    intercept[IllegalArgumentException](
      parseLine("<http://x/a> <http://x/p> <http://x/b> <http://x/g> ."))
    // strictness survives the extra term: trailing junk still fails
    intercept[IllegalArgumentException](
      parseQuadLine("<http://x/a> <http://x/p> <http://x/b> <http://x/g> . junk"))
    intercept[IllegalArgumentException](
      parseQuadLine("<http://x/a> <http://x/p> <http://x/b> <http://x/g>"))
    // distributed: quadLines → quadStatements is the identity on IRI quads
    import spark.implicits._
    val quads = Seq(
      ("http://x/a", "http://x/p", "http://x/b", "http://x/g0"),
      ("http://x/c", "http://x/p", "http://x/d", "http://x/g1"))
      .toDF("subj", "pred", "obj", "graph")
    val back = NTriples.quadStatements(NTriples.quadLines(quads).as[String])
    assert(back.select("subj", "pred", "obj", "graph").collect().map(_.toSeq).toSet ===
      quads.collect().map(_.toSeq).toSet)
    assert(back.filter(col("is_literal")).count() === 0)
  }

  test("dict built from NT-parsed concepts == dict built from fixture") {
    import spark.implicits._
    val c = OntologyFixture.conceptsDf(spark)
    val onts = c.select("ont").distinct().as[String].collect().sorted
    val viaNt = onts.map { o =>
      val lines = NTriples.lines(c.filter(col("ont") === o),
        OntologyFixture.edgesDf(spark).limit(0)).select("line").as[String]
      NTriples.concepts(NTriples.statements(lines), o)
    }.reduce(_.unionAll(_))
    val dictNt = DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(viaNt)))
    val dictFx = DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(c)))
    assert(dictNt.collect().map(_.toSeq).toSet === dictFx.collect().map(_.toSeq).toSet)
    assert(dictNt.count() > 0)
  }
}
