package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.annotate.{Context, ContextScan, Lemma, LemmaScan}
import graft.dict.{AutomatonBuild, DictBuild}
import graft.fixture.OntologyFixture

/** Annotator+ extension surface: lemmatized matching (offsets mapped back to
  * original coordinates) and ConText-style clinical attributes. */
class LemmaAndContextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- lemmatizer scalar ---------------------------------------------

  test("lemmaToken golden cases") {
    val cases = Seq(
      "TUMORS" -> "TUMOR", "BIOPSIES" -> "BIOPSY", "MATCHES" -> "MATCH",
      "BOXES" -> "BOX", "CLASSES" -> "CLASS", "RUNNING" -> "RUN",
      "SCANNED" -> "SCAN", "JOINED" -> "JOIN", "JOINS" -> "JOIN",
      "GAS" -> "GAS", "IS" -> "IS", "US" -> "US", "GLASS" -> "GLASS",
      "ANALYSIS" -> "ANALYSIS", "THE" -> "THE")
    cases.foreach { case (in, want) =>
      assert(Lemma.lemmaToken(in) === want, s"lemmaToken($in)")
    }
  }

  test("lemmaTerm keeps separators verbatim, lemmatizes per token") {
    assert(Lemma.lemmaTerm("HASH JOINS") === "HASH JOIN")
    assert(Lemma.lemmaTerm("MERGE-SORTED LISTS") === "MERGE-SORT LIST")
  }

  test("lemmatizeDoc token maps round-trip original spans") {
    val text = "Tumors, and hashed joins!"
    val d = Lemma.lemmatizeDoc(text)
    assert(d.lemmaText === "TUMOR, AND HASH JOIN!")
    assert(d.numTokens === 4)
    // token 0 "Tumors" spans original [0, 6)
    assert(d.tokStartO(0) === 0 && d.tokEndO(0) === 6)
    // lemma-space hit on "HASH JOIN" (1-based [12, 20]) maps to "hashed joins"
    val (f, t) = Lemma.mapHit(d, d.tokStartL(2) + 1, d.tokEndL(3))
    assert(text.substring(f - 1, t) === "hashed joins")
  }

  // ---- lemma scan over Spark ------------------------------------------

  private lazy val lemmaModel = {
    val dict = DictBuild.buildLemmatized(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
    AutomatonBuild.broadcastModel(spark, AutomatonBuild.build(spark, dict, "v1-lemma"))
  }
  private lazy val plainModel = {
    val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
    AutomatonBuild.broadcastModel(spark, AutomatonBuild.build(spark, dict, "v1"))
  }

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (s"doc://lem/$i", new java.sql.Timestamp(0L),
        null.asInstanceOf[Array[Byte]], t, "en") }
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  test("lemma scan matches inflected text, reports ORIGINAL offsets and text") {
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").collect().map(_.getString(0))
    // a term whose tokens are lemma fixpoints AND whose plural strips back
    val termOpt = terms.find(t => t.split(' ').forall { w =>
      val u = w.toUpperCase
      u.length > 3 && Lemma.lemmaToken(u) == u && Lemma.lemmaToken(u + "S") == u
    })
    assert(termOpt.nonEmpty, "fixture must contain a lemma-fixpoint multi-char term")
    val term = termOpt.get
    val inflected = term.split(' ').map(_ + "s").mkString(" ") // pluralize every token
    val text = s"prefix words then $inflected and a tail"
    val hits = LemmaScan.annotateDirectLemma(docsDf(Seq(text)), lemmaModel)
      .collect()
    assert(hits.nonEmpty, s"no lemma hits for '$inflected' (term '$term')")
    val h = hits.minBy(_.from)
    val matched = text.substring(h.from - 1, h.to)
    assert(matched === inflected, "matched text must be the ORIGINAL inflected span")
    assert(h.text === inflected)
  }

  test("lemma scan == plain scan on uninflected text (lemma is identity there)") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, sfDir))
      .filter(col("url").isin((0 to 20).map(i => s"doc://$i"): _*))
    // the driver corpus vocabulary is engine words; keep only docs where
    // lemmatization is the identity so the two scans must agree exactly
    val idDocs = corpus.collect().filter { r =>
      val t = r.getAs[String]("text")
      t != null && Lemma.lemmatizeDoc(t).lemmaText ==
        t.map(graft.dict.Automaton.normChar)
    }
    assert(idDocs.nonEmpty, "need at least one lemma-identity doc in the slice")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(idDocs.toSeq), corpus.schema)
    val plain = graft.annotate.Scan.annotateDirect(df, plainModel).collect()
      .map(m => (m.url, m.from, m.to, m.classIri)).toSet
    val lemma = LemmaScan.annotateDirectLemma(df, lemmaModel).collect()
      .map(m => (m.url, m.from, m.to, m.classIri)).toSet
    assert(lemma === plain)
    assert(lemma.nonEmpty)
  }

  // ---- Annotator facade -------------------------------------------------

  test("Annotator facade: lemmatize=true == native path over a pre-lemmatized corpus") {
    import org.apache.spark.sql.functions.col
    import graft.annotate.{FusedAnnotate, NativeAnnotate}
    import graft.graph.Closure
    val maps = spark.sparkContext.broadcast(
      FusedAnnotate.expansionMaps(
        Closure.transitiveClosure(OntologyFixture.edgesDf(spark), 5),
        OntologyFixture.mappingsDf(spark), 5))
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").collect().map(_.getString(0))
      .filter(t => t.split(' ').forall { w =>
        val u = w.toUpperCase
        u.length > 3 && Lemma.lemmaToken(u) == u
      }).sorted.take(3)
    assume(terms.length >= 2)
    val texts = Seq(
      s"${terms(0)}s and ${terms(1)} here", // inflected + base
      s"plain ${terms(1)} only",
      s"${terms(0)} ${if (terms.length > 2) terms(2) + "s" else terms(0)}")
    val corpus = docsDf(texts)
    val viaFacade = Annotator
      .annotate(corpus, plainModel, maps, "v1",
        Annotator.Request(lemmatize = true), lemmaModel = Some(lemmaModel))
      .select("subj", "pred", "obj", "distance", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3), r.getDouble(4)))
      .toSet
    // oracle: lemma-normalize the corpus text, then run the ordinary native
    // path with the lemma dictionary — identical matches by construction
    val lemmaCorpus = spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.collect().toSeq.map { r =>
        org.apache.spark.sql.Row(r.getString(0), r.getTimestamp(1),
          r.getAs[Array[Byte]](2), Lemma.lemmatizeDoc(r.getString(3)).lemmaText,
          r.getString(4))
      }),
      corpus.schema)
    val viaNative = NativeAnnotate
      .annotateTriples(lemmaCorpus, lemmaModel, maps, "v1")
      .select("subj", "pred", "obj", "distance", "score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3), r.getDouble(4)))
      .toSet
    assert(viaFacade === viaNative)
    assert(viaFacade.nonEmpty)
    // the inflected doc matched through lemma space
    assert(viaFacade.exists(_._1 == "doc://lem/0"))
  }

  test("Annotator facade: default request routes to the native plan") {
    import graft.annotate.FusedAnnotate
    import graft.graph.Closure
    val maps = spark.sparkContext.broadcast(
      FusedAnnotate.expansionMaps(
        Closure.transitiveClosure(OntologyFixture.edgesDf(spark), 5),
        OntologyFixture.mappingsDf(spark), 5))
    val corpus = graft.annotate.Corpus.extract(
      graft.annotate.Corpus.readDriverDocuments(spark, "/root/testdata/sf0.001"))
    val plan = Annotator.annotate(corpus, plainModel, maps, "v1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && !plan.contains("MapPartitions"))
    assert(Annotator.matches(corpus, plainModel).count() > 0)
    assert(Annotator.annotate(corpus, plainModel, maps, "v1").count() > 0)
  }

  // ---- clinical context -----------------------------------------------

  private def attrs(text: String, span: String): Context.Attrs = {
    val from = text.indexOf(span) + 1
    assert(from > 0, s"span '$span' not in '$text'")
    Context.classify(text, from, from + span.length - 1)
  }

  test("negation triggers (pre, phrase, post) within the window") {
    assert(attrs("patient has no fracture today", "fracture").negated)
    assert(attrs("denies chest pain", "chest pain").negated)
    assert(attrs("absence of tumor", "tumor").negated)
    assert(attrs("negative for influenza", "influenza").negated)
    assert(attrs("fracture unlikely", "fracture").negated)
    assert(!attrs("patient has a fracture", "fracture").negated)
  }

  test("negation scope is cut by sentence edges and breakers") {
    assert(!attrs("no fever. fracture present", "fracture").negated)
    // post-hoc lookahead must respect '!'/'?' sentence edges like the
    // pre-context scan does (review regression)
    assert(!attrs("has a fracture! unlikely to need surgery", "fracture").negated)
    assert(!attrs("a fracture? unlikely", "fracture").negated)
    assert(!attrs("no fever but fracture present", "fracture").negated)
    // window bound: trigger 6+ tokens away is out of scope
    assert(!attrs("no one two three four five fracture", "fracture").negated)
  }

  test("experiencer and temporality triggers") {
    assert(attrs("family history of tumor", "tumor").experiencer === "OTHER")
    assert(attrs("history of tumor", "tumor").temporality === "HISTORICAL")
    assert(attrs("patient has tumor", "tumor").experiencer === "PATIENT")
    assert(attrs("patient has tumor", "tumor").temporality === "RECENT")
  }

  test("ContextScan emits match + attributes over Spark, zero extra shuffles") {
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").collect().map(_.getString(0))
      .filter(_.length >= 4).sorted.take(2) // deterministic, survives min_term_size
    val df = docsDf(Seq(
      s"patient shows ${terms(0)} clearly",
      s"no ${terms(0)} but family history of ${terms(1)}"))
    val rows = ContextScan.annotateWithContext(df, plainModel).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.url)
    val affirmed = byDoc("doc://lem/0").filter(_.text.equalsIgnoreCase(terms(0)))
    assert(affirmed.nonEmpty && affirmed.forall(!_.negated))
    val negated = byDoc("doc://lem/1").filter(_.text.equalsIgnoreCase(terms(0)))
    assert(negated.nonEmpty && negated.forall(_.negated))
    val other = byDoc("doc://lem/1").filter(_.text.equalsIgnoreCase(terms(1)))
    assert(other.nonEmpty && other.forall(r => r.experiencer == "OTHER" && !r.negated))
    // plan shape: one typed scan, no exchange
    val plan = ContextScan.annotateWithContext(df, plainModel)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
