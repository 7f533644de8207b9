package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.annotate.RuleTagger
import graft.dict.{AutomatonBuild, DictBuild}
import graft.fixture.OntologyFixture

/** The second recognizer behind the seam (the reference's mallet slot):
  * offset contract on a crafted doc, scalar==DataFrame classification
  * parity, seam dispatch, and downstream composition with scoring. */
class RuleTaggerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def model = {
    val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
    AutomatonBuild.broadcastModel(spark, AutomatonBuild.build(spark, dict, "v1"))
  }

  test("offsets + classes on a crafted doc (hand-computed oracle)") {
    import spark.implicits._
    val doc = Seq(("doc://1", "  customer sorting 123 row slow query data th er"))
      .toDF("url", "text")
    val got = RuleTagger.tag(doc).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3), r.getString(4))).toSet
    assert(got === Set(
      (3, 10, "customer", "http://graft.tag/AgentNoun"),
      (12, 18, "sorting", "http://graft.tag/Gerund"), // ING before ER
      (20, 22, "123", "http://graft.tag/Number"),
      (24, 26, "row", "http://graft.tag/ModifierNoun"),
      (28, 31, "slow", "http://graft.tag/ModifierNoun"),
      (33, 37, "query", "http://graft.tag/AbstractNoun"),
      (39, 42, "data", "http://graft.tag/MassNoun")))
    // "th"/"er" are under MinTokenLen — dropped, matching classify()
    assert(RuleTagger.classify("ER") === None)
    assert(RuleTagger.classify("SORTING") === Some("Gerund"))
    assert(RuleTagger.classify("99") === None)
    assert(RuleTagger.classify("999") === Some("Number"))
  }

  test("DataFrame classification == scalar classify on the real corpus") {
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, "/root/testdata/sf0.001"))
    val viaDf = RuleTagger.tag(corpus).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(4))).toSet
    assert(viaDf.nonEmpty, "rule tagger found nothing on the driver corpus")
    // scalar recompute: tokenize each doc, classify, rebuild offsets
    val viaScalar = corpus.select("url", "text").collect().flatMap { r =>
      val url = r.getString(0); val text = r.getString(1)
      val m = java.util.regex.Pattern.compile("[A-Za-z0-9_]+").matcher(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
      while (m.find()) {
        val tok = m.group()
        if (tok.length >= RuleTagger.MinTokenLen)
          RuleTagger.classify(tok.toUpperCase(java.util.Locale.ROOT)).foreach(cls =>
            out += ((url, m.start() + 1, RuleTagger.IriPrefix + cls)))
      }
      out
    }.toSet
    assert(viaDf === viaScalar)
  }

  test("seam dispatch: Annotator.matches routes through the tagger; whitelist honored") {
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, "/root/testdata/sf0.001"))
    val m = model
    val direct = RuleTagger.tag(corpus).collect().map(_.toSeq).toSet
    val viaSeam = Annotator.matches(corpus, m,
      recognizer = Some(new Annotator.RuleTaggerRecognizer)).collect().map(_.toSeq).toSet
    assert(viaSeam === direct)
    // the tagger's classes live under ont=TAGGER — the standard whitelist
    // option selects or excludes them like any ontology
    val excluded = Annotator.matches(corpus, m,
      Annotator.Request(AnnotateOptions(ontologies = Seq("ONT1"))),
      recognizer = Some(new Annotator.RuleTaggerRecognizer)).count()
    assert(excluded === 0L)
    val included = Annotator.matches(corpus, m,
      Annotator.Request(AnnotateOptions(ontologies = Seq(RuleTagger.Ont))),
      recognizer = Some(new Annotator.RuleTaggerRecognizer)).count()
    assert(included === direct.size.toLong)
  }

  test("downstream composition: scoring consumes the tagger match stream unchanged") {
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, "/root/testdata/sf0.001"))
    val stream = RuleTagger.tag(corpus)
      .withColumnRenamed("class_iri", "classIri")
      .withColumnRenamed("match_type", "matchType")
    val scored = graft.annotate.Scoring.directScores(stream)
    val row = scored.agg(count(lit(1)), min(col("score"))).head()
    assert(row.getLong(0) > 0)
    // RULE matches are non-preferred → SYN weight per occurrence
    assert(row.getDouble(1) >= Score.SynWeight)
  }
}
