package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.annotate.{Corpus, Filters, FusedAnnotate, Scan}
import graft.dict.{AutomatonBuild, DictBuild}
import graft.fixture.OntologyFixture
import graft.graph.Closure

/** Request-option parity: the fused path's A4/A5/A11 option handling must
  * agree with the declarative Filters/threshold formulation. */
class FusedOptionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val model = {
    val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
    AutomatonBuild.broadcastModel(spark, AutomatonBuild.build(spark, dict, "v1"))
  }
  private lazy val maps = spark.sparkContext.broadcast(
    FusedAnnotate.expansionMaps(
      Closure.transitiveClosure(OntologyFixture.edgesDf(spark), 5),
      OntologyFixture.mappingsDf(spark), 5))
  private lazy val corpus = Corpus.extract(Corpus.readDriverDocuments(spark, sfDir))

  private def fusedDirectPairs(opts: AnnotateOptions,
                               semClasses: Option[Set[String]] = None): Set[(String, String)] =
    FusedAnnotate.annotateTriples(corpus, model, maps, "v1", opts,
        semClasses.map(spark.sparkContext.broadcast(_)))
      .toDF().filter(col("pred") === Pred.Direct)
      .select("subj", "obj").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  private def filteredPairs(opts: AnnotateOptions): Set[(String, String)] = {
    val m = Scan.annotateDirect(corpus, model, opts.longestOnly).toDF()
    val semTable = OntologyFixture.conceptsDf(spark)
      .select(col("class_iri"), explode(col("tuis")).as("tui"))
    Filters(m, opts, Some(semTable))
      .select("url", "classIri").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("ontology whitelist parity (fused vs Filters)") {
    val opts = AnnotateOptions(ontologies = Seq("ONT2"))
    assert(fusedDirectPairs(opts) === filteredPairs(opts))
    assert(fusedDirectPairs(opts).nonEmpty)
  }

  test("exclude_synonyms parity") {
    val opts = AnnotateOptions(excludeSynonyms = true)
    assert(fusedDirectPairs(opts) === filteredPairs(opts))
  }

  test("semantic-type filter parity") {
    val tuis = Set("T050", "T051", "T052")
    val allowed = OntologyFixture.concepts
      .filter(_.tuis.exists(tuis)).map(_.classIri).toSet
    val opts = AnnotateOptions(semanticTypes = tuis.toSeq)
    assert(fusedDirectPairs(AnnotateOptions(), Some(allowed)) === filteredPairs(opts))
  }

  test("longest_only parity") {
    val opts = AnnotateOptions(longestOnly = true)
    assert(fusedDirectPairs(opts) === filteredPairs(opts))
    // longest_only must drop the nested 'sort' when 'merge sort' covers it
    // at the same start; set must be a subset of the unrestricted one
    assert(fusedDirectPairs(opts).subsetOf(fusedDirectPairs(AnnotateOptions())))
  }

  test("expansion toggles and score threshold") {
    val none = FusedAnnotate.annotateTriples(corpus, model, maps, "v1",
      AnnotateOptions(expandHierarchy = false, expandMappings = false)).toDF()
    assert(none.filter(col("pred") =!= Pred.Direct).count() === 0)
    val lvl1 = FusedAnnotate.annotateTriples(corpus, model, maps, "v1",
      AnnotateOptions(hierarchyMaxLevel = 1)).toDF()
    assert(lvl1.filter(col("pred") === Pred.Expanded)
      .agg(max("distance")).head().getInt(0) === 1)
    val thresh = FusedAnnotate.annotateTriples(corpus, model, maps, "v1",
      AnnotateOptions(scoreThreshold = 9.0)).toDF()
    assert(thresh.agg(min("score")).head().getDouble(0) >= 9.0)
    // threshold 9 keeps PREF-scored directs, drops lone-SYN directs + all expansions
    assert(thresh.filter(col("pred") =!= Pred.Direct).count() === 0)
  }
}
