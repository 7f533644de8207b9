package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

import graft.annotate.{Corpus, FusedAnnotate, NativeAnnotate}
import graft.dict.{AutomatonBuild, DictBuild, TrieBuilder, Automaton}
import graft.fixture.OntologyFixture
import graft.graph.Closure

/** The native Generator formulation must be row-for-row identical to the
  * typed `mapPartitions` fused path — over the full smoke corpus, the whole
  * request-option matrix, non-ASCII fallback docs, and the sparse-accumulator
  * branch. Plus: the plan it produces must actually BE native (no
  * object-mode island), and the byte-level scan must equal the char-level
  * scan on arbitrary ASCII input.
  */
class NativeAnnotateSpec extends AnyFunSuite {
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

  private def tripleSet(df: DataFrame): Set[(String, String, String, String, Int, Double, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3), r.getInt(4), r.getDouble(5), r.getString(6))).toSet

  private def assertParity(opts: AnnotateOptions,
                           semClasses: Option[Set[String]] = None,
                           denseLimit: Int = NativeAnnotate.DenseLimit): Unit = {
    val semB = semClasses.map(spark.sparkContext.broadcast(_))
    val fused = tripleSet(
      FusedAnnotate.annotateTriples(corpus, model, maps, "v1", opts, semB).toDF())
    val native = tripleSet(
      NativeAnnotate.annotateTriples(corpus, model, maps, "v1", opts, semB, denseLimit))
    assert(native === fused)
    assert(native.nonEmpty)
  }

  test("native == fused on the full smoke corpus (defaults)") {
    assertParity(AnnotateOptions())
  }

  test("native == fused: longest_only") {
    assertParity(AnnotateOptions(longestOnly = true))
  }

  test("native == fused: ontology whitelist") {
    assertParity(AnnotateOptions(ontologies = Seq("ONT2")))
  }

  test("native == fused: exclude_synonyms") {
    assertParity(AnnotateOptions(excludeSynonyms = true))
  }

  test("native == fused: score threshold") {
    assertParity(AnnotateOptions(scoreThreshold = 8.5))
  }

  test("native == fused: hierarchy level cap + no mappings") {
    assertParity(AnnotateOptions(hierarchyMaxLevel = 1, expandMappings = false))
  }

  test("native == fused: no hierarchy") {
    assertParity(AnnotateOptions(expandHierarchy = false))
  }

  test("native == fused: semantic-type class filter") {
    val allowed = OntologyFixture.conceptsDf(spark)
      .select("class_iri").limit(10).collect().map(_.getString(0)).toSet
    assertParity(AnnotateOptions(), Some(allowed))
  }

  test("native == fused: stop_words blacklist (incl. normalization + non-term no-op)") {
    // un-normalized entries ("  Table  Scan ", mixed case) must resolve, a
    // non-dictionary entry ("nonsense term") must be a no-op
    assertParity(AnnotateOptions(
      stopWords = Seq("data", "  Table  Scan ", "nonsense term")))
  }

  test("stop_words actually removes the stopped term's classes (native)") {
    val stopped = NativeAnnotate.annotateTriples(corpus, model, maps, "v1",
      AnnotateOptions(stopWords = Seq("data"), expandHierarchy = false,
        expandMappings = false))
    val dataIri = OntologyFixture.concepts
      .find(c => c.ont == "ONT1" && c.prefLabel == "data").get.classIri
    // DATA the pref term is stopped, but 'big data'/'data stream' synonyms
    // still resolve their classes — the blacklist is per-TERM, not per-class
    assert(stopped.filter(org.apache.spark.sql.functions.expr(
      s"pred = 'hasAnnotation' AND obj = '$dataIri' AND match_type = 'PREF'")).isEmpty)
    val unstopped = NativeAnnotate.annotateTriples(corpus, model, maps, "v1",
      AnnotateOptions(expandHierarchy = false, expandMappings = false))
    assert(!unstopped.filter(org.apache.spark.sql.functions.expr(
      s"pred = 'hasAnnotation' AND obj = '$dataIri' AND match_type = 'PREF'")).isEmpty)
  }

  test("Recognizer seam: dictionary recognizer == native matches; custom recognizers dispatch") {
    val viaSeam = Annotator.matches(corpus, model).collect().map(_.toSeq).toSet
    val direct = NativeAnnotate.annotateMatches(corpus, model).collect().map(_.toSeq).toSet
    assert(viaSeam === direct && viaSeam.nonEmpty)
    // a custom recognizer plugs in without touching the facade
    val marker = new Annotator.Recognizer {
      override def recognize(extracted: org.apache.spark.sql.DataFrame,
                             opts: AnnotateOptions): org.apache.spark.sql.DataFrame =
        extracted.limit(0).selectExpr("url", "1 as from", "1 as to",
          "'x' as text", "'c' as class_iri", "'o' as ont", "'PREF' as match_type")
    }
    assert(Annotator.matches(corpus, model, recognizer = Some(marker)).columns.toSeq ===
      Seq("url", "from", "to", "text", "class_iri", "ont", "match_type"))
  }

  test("native == fused: combined options") {
    assertParity(AnnotateOptions(longestOnly = true, excludeSynonyms = true,
      hierarchyMaxLevel = 2, scoreThreshold = 3.0))
  }

  test("native == fused: whole_word_only=false (substring matching)") {
    assertParity(AnnotateOptions(wholeWordOnly = false))
  }

  test("whole_word_only=false finds mid-word occurrences; true suppresses them") {
    val trie = new TrieBuilder
    trie.insert("ASH", 0)
    val auto = Automaton.fromTrie(trie)
    val text = "XASHY ash"
    val strict = auto.scanInto(text, new graft.dict.HitBuffer())
    assert((0 until strict.size).map(i => (strict.from(i), strict.to(i))).toSet ===
      Set((7, 9))) // only the standalone word
    val loose = auto.scanInto(text, new graft.dict.HitBuffer(), wholeWord = false)
    assert((0 until loose.size).map(i => (loose.from(i), loose.to(i))).toSet ===
      Set((2, 4), (7, 9))) // mid-word occurrence too
    // byte scan parity for the substring mode
    val u8 = UTF8String.fromString(text)
    val buf = new graft.dict.HitBuffer()
    auto.scanUtf8Into(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, buf,
      longestOnly = false, wholeWord = false)
    assert((0 until buf.size).map(i => (buf.from(i), buf.to(i))).toSet ===
      Set((2, 4), (7, 9)))
  }

  test("sparse accumulator branch (denseLimit=0) == dense") {
    assertParity(AnnotateOptions(), denseLimit = 0)
    assertParity(AnnotateOptions(longestOnly = true, scoreThreshold = 8.5), denseLimit = 0)
  }

  test("non-ASCII documents fall back to the char scan with identical results") {
    import spark.implicits._
    // é before a term start, multi-byte inside a word (breaks it), emoji
    // (surrogate pair) between terms, ß adjacent to a term
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").limit(3).collect().map(_.getString(0))
    val texts = Seq(
      s"café ${terms(0)} naïve ${terms(1)} 😀 ${terms(2)}",
      s"${terms(0)}ß not-a-boundary but ${terms(1)} yes",
      s"Ünicode ${terms(0)} mixed τερμ ${terms(1)}",
      terms.mkString(" é "))
    val df = texts.zipWithIndex
      .map { case (t, i) => (s"doc://nonascii/$i", new java.sql.Timestamp(0L),
        null.asInstanceOf[Array[Byte]], t, "und") }
      .toDF("url", "warc_ts", "html", "text", "lang")
    val fused = tripleSet(FusedAnnotate.annotateTriples(df, model, maps, "v1").toDF())
    val native = tripleSet(NativeAnnotate.annotateTriples(df, model, maps, "v1"))
    assert(native === fused)
    assert(native.nonEmpty, "non-ASCII fixture should still produce matches")
  }

  test("null-text rows are skipped, not fatal") {
    import spark.implicits._
    val df = Seq(
      ("doc://null/0", new java.sql.Timestamp(0L), null.asInstanceOf[Array[Byte]],
        null.asInstanceOf[String], "und"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    assert(NativeAnnotate.annotateTriples(df, model, maps, "v1").count() === 0L)
  }

  test("the native plan has no object-mode island and prunes to (url, text)") {
    val plan = NativeAnnotate.annotateTriples(corpus, model, maps, "v1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
    assert(plan.contains("Generate"), plan)
    val optimized = NativeAnnotate.annotateTriples(
      Corpus.extract(Corpus.readDriverDocuments(spark, sfDir)), model, maps, "v1")
      .queryExecution.optimizedPlan.toString
    assert(!optimized.contains("html"), "html column must be pruned from the scan:\n" + optimized)
  }

  test("byte scan == char scan on arbitrary ASCII inputs (property)") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("spark", "hash join", "window", "agg", "x1", "catalyst rule", "a_b")
    val trie = new TrieBuilder
    vocab.zipWithIndex.foreach { case (t, i) =>
      trie.insert(t.toUpperCase.trim.replaceAll("\\s+", " "), i)
    }
    val auto = Automaton.fromTrie(trie)
    val charBuf = new graft.dict.HitBuffer()
    val byteBuf = new graft.dict.HitBuffer()
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(60)
      val text = (1 to n).map { _ =>
        if (rnd.nextBoolean()) vocab(rnd.nextInt(vocab.length))
        else rnd.alphanumeric.take(rnd.nextInt(6) + 1).mkString
      }.mkString(Seq(" ", ", ", "-", ".").apply(rnd.nextInt(4)))
      val u8 = UTF8String.fromString(text)
      auto.scanInto(text, charBuf)
      val ok = auto.scanAsciiBytesInto(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, byteBuf)
      assert(ok, s"ASCII text must take the byte path: $text")
      val charHits = (0 until charBuf.size)
        .map(i => (charBuf.from(i), charBuf.to(i), charBuf.termId(i))).toSet
      val byteHits = (0 until byteBuf.size)
        .map(i => (byteBuf.from(i), byteBuf.to(i), byteBuf.termId(i))).toSet
      assert(byteHits === charHits, s"mismatch on: $text")
    }
  }

  private def matchSet(df: DataFrame): Set[(String, Int, Int, String, String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3),
      r.getString(4), r.getString(5), r.getString(6))).toSet

  test("annotateMatches == typed Scan.annotateDirect (offsets, text, payload fan-out)") {
    import graft.annotate.Scan
    for (longest <- Seq(false, true)) {
      val typed = matchSet(Scan.annotateDirect(corpus, model, longest).toDF()
        .select("url", "from", "to", "text", "classIri", "ont", "matchType"))
      val native = matchSet(NativeAnnotate.annotateMatches(corpus, model, longest))
      assert(native === typed, s"longestOnly=$longest")
      assert(native.nonEmpty)
    }
  }

  test("annotateMatches parity on non-ASCII docs (char-offset coordinates)") {
    import spark.implicits._
    import graft.annotate.Scan
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").limit(3).collect().map(_.getString(0))
    val texts = Seq(
      s"café ${terms(0)} 😀 ${terms(1)}", // surrogate pair shifts char offsets
      s"τ ${terms(2)} é ${terms(0)}")
    val df = texts.zipWithIndex
      .map { case (t, i) => (s"doc://na/$i", new java.sql.Timestamp(0L),
        null.asInstanceOf[Array[Byte]], t, "und") }
      .toDF("url", "warc_ts", "html", "text", "lang")
    val typed = matchSet(Scan.annotateDirect(df, model).toDF()
      .select("url", "from", "to", "text", "classIri", "ont", "matchType"))
    val native = matchSet(NativeAnnotate.annotateMatches(df, model))
    assert(native === typed)
    assert(native.nonEmpty)
  }

  test("native Generator lifts to readStream unchanged (batch/stream same plan)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("url", "text")
    val query = NativeAnnotate.annotateTriples(docs, model, maps, "v1").writeStream
      .format("memory").queryName("native_stream_triples").outputMode("append").start()
    try {
      input.addData(("doc://ns1", "the hash join beats a merge sort"))
      query.processAllAvailable()
      input.addData(("doc://ns2", "table scan and spark"))
      query.processAllAvailable()
      val got = spark.table("native_stream_triples")
        .select("subj", "pred", "obj")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val expected = graft.oracle.ReferenceOracle.goldenTriples(Seq(
        ("doc://ns1", "the hash join beats a merge sort"),
        ("doc://ns2", "table scan and spark")))
      assert(got === expected)
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("UTF-8 byte scan is TOTAL: non-ASCII text scans in place, char offsets exact") {
    val trie = new TrieBuilder
    trie.insert("SPARK", 0)
    val auto = Automaton.fromTrie(trie)
    val buf = new graft.dict.HitBuffer()
    val text = "spark é spark 😀 spark"
    val u8 = UTF8String.fromString(text)
    val pure = auto.scanUtf8Into(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, buf)
    assert(!pure) // flag reports non-ASCII, but the scan is complete
    val byteHits = (0 until buf.size).map(i => (buf.from(i), buf.to(i))).toSet
    val charBuf = auto.scanInto(text, new graft.dict.HitBuffer())
    val charHits = (0 until charBuf.size).map(i => (charBuf.from(i), charBuf.to(i))).toSet
    assert(byteHits === charHits)
    assert(byteHits.size === 3)
    // offsets are UTF-16 char coordinates (😀 counts as 2)
    byteHits.foreach { case (f, t) => assert(text.substring(f - 1, t) == "spark") }
  }

  test("giant document (50 MB): linear scan, buffers grow, offsets stay exact") {
    val terms = OntologyFixture.conceptsDf(spark)
      .select("pref_label").collect().map(_.getString(0))
      .filter(_.length >= 4).sorted.take(2)
    val block = s"filler words between ${terms(0)} and more ${terms(1)} end. "
    val sb = new java.lang.StringBuilder(52 * 1024 * 1024)
    while (sb.length < 50 * 1024 * 1024) sb.append(block)
    val giant = sb.toString
    val u8 = UTF8String.fromString(giant)
    val auto = {
      val dict = graft.dict.DictBuild.build(
        DictBuild.labelRows(OntologyFixture.conceptsDf(spark)))
      graft.dict.AutomatonBuild.build(spark, dict, "vG").automaton
    }
    val buf = new graft.dict.HitBuffer()
    val t0 = System.nanoTime()
    auto.scanUtf8Into(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, buf)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"50 MB scan: $sec%.2f s (${50 / sec}%.0f MB/s), ${buf.size} hits")
    val perBlock = auto.scanInto(block, new graft.dict.HitBuffer()).size
    // the trailing space makes every block repetition boundary-identical
    assert(buf.size === perBlock.toLong * (giant.length / block.length) +
      auto.scanInto(giant.substring(giant.length / block.length * block.length),
        new graft.dict.HitBuffer()).size)
    assert(sec < 10.0, "50 MB must scan in seconds, not minutes")
    // spot-check a late hit's offsets against the text
    val i = buf.size - 1
    val span = giant.substring(buf.from(i) - 1, buf.to(i))
    assert(span.equalsIgnoreCase(terms(0)) || span.equalsIgnoreCase(terms(1)))
  }

  test("empty dictionary: scans emit nothing, nothing crashes") {
    val auto = Automaton.fromTrie(new TrieBuilder)
    val buf = new graft.dict.HitBuffer()
    val u8 = UTF8String.fromString("any text at all é 😀")
    auto.scanUtf8Into(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, buf)
    assert(buf.size === 0)
    assert(auto.scanInto("any text", new graft.dict.HitBuffer()).size === 0)
  }

  test("UTF-8 byte scan == char scan on random mixed-script text (property)") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("spark", "hash join", "café", "naïve", "日本", "a_b", "x1")
    val trie = new TrieBuilder
    vocab.zipWithIndex.foreach { case (t, i) =>
      trie.insert(t.toUpperCase.trim.replaceAll("\\s+", " "), i)
    }
    val auto = Automaton.fromTrie(trie)
    val fillers = Array("zzz", "é", "ß", "漢字", "😀", "qq", "-", "«»", "_x")
    val byteBuf = new graft.dict.HitBuffer()
    val charBuf = new graft.dict.HitBuffer()
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(40)
      val text = (1 to n).map { _ =>
        if (rnd.nextBoolean()) vocab(rnd.nextInt(vocab.length))
        else fillers(rnd.nextInt(fillers.length))
      }.mkString(Seq(" ", ", ", "·", ".").apply(rnd.nextInt(4)))
      val u8 = UTF8String.fromString(text)
      // both boundary modes: byte scan == char scan, offset-exact
      Seq(true, false).foreach { ww =>
        auto.scanUtf8Into(u8.getBaseObject, u8.getBaseOffset, u8.numBytes,
          byteBuf, longestOnly = false, wholeWord = ww)
        auto.scanInto(text, charBuf, longestOnly = false, wholeWord = ww)
        val b = (0 until byteBuf.size).map(i => (byteBuf.from(i), byteBuf.to(i), byteBuf.termId(i))).toSet
        val c = (0 until charBuf.size).map(i => (charBuf.from(i), charBuf.to(i), charBuf.termId(i))).toSet
        assert(b === c, s"wholeWord=$ww mismatch on: $text")
      }
    }
  }

  test("accent fold: 1:1 translate preserves offsets; unfolded damage loses matches") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val clean = docs.select(concat(lit("doc://"), col("doc_id")).as("url"),
      col("text"))
    val damaged = graft.ops.TextOps.withAccents(docs)
    def rows(df: DataFrame) = NativeAnnotate.annotateMatches(df, model)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getString(4))).toSet
    val base = rows(clean)
    // negative control: unfolded damage strictly SHRINKS the match set —
    // terms containing e/a vowels stop matching on damaged docs (terms
    // without them, e.g. SORT/JOIN, rightly survive), and no new match
    // can appear (no dictionary term contains an accented char)
    val unfolded = rows(damaged)
    assert(unfolded.subsetOf(base) && unfolded != base)
    // the fold restores EXACTLY the clean match set, offsets included —
    // the 1:1 map's same-length guarantee
    val folded = rows(damaged.select(col("url"),
      graft.ops.TextOps.foldAccents(col("text")).as("text")))
    assert(folded === base)
  }
}
