package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dict.{DictBuild, DictVersioning}
import graft.fixture.OntologyFixture

/** D7 TSV sink + D9 blue/green dictionary version swap. */
class VersioningAndSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))

  test("blue/green snapshot swap: activation is atomic, readers see whole versions") {
    val base = Files.createTempDirectory("graft-dictver").toString
    DictVersioning.writeSnapshot(dict, base, "v1")
    DictVersioning.activate(base, "v1")
    assert(DictVersioning.currentVersion(base) === Some("v1"))
    val v1Count = DictVersioning.readCurrent(spark, base).count()
    assert(v1Count === dict.count())

    // rebuild with a different filter → v2 snapshot; v1 stays readable until flip
    val dict2 = DictBuild.build(
      DictBuild.labelRows(OntologyFixture.conceptsDf(spark)), minTermSize = 4)
    DictVersioning.writeSnapshot(dict2, base, "v2")
    assert(DictVersioning.currentVersion(base) === Some("v1")) // not flipped yet
    DictVersioning.activate(base, "v2")
    assert(DictVersioning.currentVersion(base) === Some("v2"))
    val v2Count = DictVersioning.readCurrent(spark, base).count()
    assert(v2Count < v1Count) // stricter min_term_size drops 3-char terms
  }

  test("D7 TSV sink: id<TAB>TERM lines, mgrep dictionary format") {
    val out = Files.createTempDirectory("graft-tsv").toString + "/dict_tsv"
    DictVersioning.writeTsv(dict, out)
    val lines = spark.read.text(out).collect().map(_.getString(0))
    assert(lines.length === dict.count())
    val parsed = lines.map { l =>
      val Array(id, term) = l.split("\t", 2)
      (id.toInt, term)
    }
    // ids dense 1..N ordered by term
    assert(parsed.map(_._1).sorted.toSeq === (1 to parsed.length))
    val byId = parsed.sortBy(_._1).map(_._2)
    assert(byId.toSeq === byId.sorted.toSeq)
    assert(byId.contains("MERGE SORT"))
  }

  test("JSON response sink: reference-shaped nested documents, score-ordered") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, sfDir))
      .filter(col("url").isin((0 until 30).map(i => s"doc://$i"): _*))
    val model = {
      val d = DictBuild.build(DictBuild.labelRows(
        graft.fixture.OntologyFixture.conceptsDf(spark)))
      graft.dict.AutomatonBuild.broadcastModel(spark,
        graft.dict.AutomatonBuild.build(spark, d, "vj"))
    }
    val matches = graft.annotate.NativeAnnotate.annotateMatches(corpus, model)
    val closure = graft.graph.Closure.transitiveClosure(
      graft.fixture.OntologyFixture.edgesDf(spark), 5)
    val responses = graft.emit.Triples.jsonResponses(matches, closure,
      graft.fixture.OntologyFixture.mappingsDf(spark), maxLevel = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(responses.nonEmpty)
    // parse one document back and check the reference response contract
    val (url, json) = responses.head
    val parsed = spark.read.json(
      spark.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING))
    val anns = parsed.selectExpr("explode(annotations) as a")
      .select("a.annotatedClass", "a.score").collect()
    assert(anns.nonEmpty)
    val scores = anns.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "annotations must be score-descending")
    assert(parsed.select("text_id").head().getString(0) === url)
    // every annotation carries its class, spans exist in the json
    assert(json.contains("\"annotations\"") && json.contains("\"annotatedClass\""))
  }

  test("mgrep TSV source: writeTsv → readTsv round-trips (term, term_id) exactly") {
    val out = Files.createTempDirectory("graft-tsv-rt").toString + "/dict_tsv"
    DictVersioning.writeTsv(dict, out)
    val back = DictVersioning.readTsv(spark, out)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val orig = dict.select("term_id", "term")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back === orig)
    assert(back.nonEmpty)
    // and an automaton built from the file scans identically to one built
    // from the table (term-id space is the file's — the mgrep contract)
    val fromFile = graft.dict.TrieBuilder.of(
      back.iterator.map { case (id, t) => (t, id) })
    val fromTable = graft.dict.TrieBuilder.of(
      orig.iterator.map { case (id, t) => (t, id) })
    val text = "the hash join beats a merge sort on the table scan"
    val a = graft.dict.Automaton.fromTrie(fromFile).scan(text)
    val b = graft.dict.Automaton.fromTrie(fromTable).scan(text)
    assert(a.toSet === b.toSet)
    assert(a.nonEmpty)
  }
}
