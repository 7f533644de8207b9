package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dict.DictBuild
import graft.fixture.OntologyFixture
import graft.graph.Closure

/** D2–D6 dictionary build vs the pure-Scala fixture derivation, and H2
  * closure vs a hand-computed BFS oracle (diamond, depth, cap). */
class DictAndClosureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("DictBuild output == pure-Scala fixture dictionary (D3–D6)") {
    val dict = DictBuild.flatDict(
      DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(spark))))
    val got = dict.select("term", "class_iri", "ont", "pref")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSet
    val want = OntologyFixture.dictRows()
      .map(t => (t.term, t.classIri, t.ont, t.pref)).toSet
    assert(got === want)
    // ids: dense, 1-based, ordered by term
    val ids = dict.select("term", "term_id").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    assert(ids.map(_._2).toSeq === (1 to ids.length))
    assert(ids.map(_._1).toSeq === ids.map(_._1).sorted.toSeq)
  }

  test("min_term_size and exclude_numbers filters (D4)") {
    val terms = DictBuild.build(
      DictBuild.labelRows(OntologyFixture.conceptsDf(spark)),
      minTermSize = 3, excludeNumbers = true)
      .select("term").collect().map(_.getString(0)).toSet
    assert(!terms.contains("A")) // 1-char dropped
    assert(!terms.contains("AB")) // 2-char dropped
    assert(!terms.contains("12345")) // pure number dropped when excluded
    assert(terms.contains("THE")) // 3-char kept
    val withNumbers = DictBuild.build(
      DictBuild.labelRows(OntologyFixture.conceptsDf(spark)),
      minTermSize = 3, excludeNumbers = false)
      .select("term").collect().map(_.getString(0)).toSet
    assert(withNumbers.contains("12345"))
  }

  test("fixture terms can never self-overlap at word boundaries (regexp-oracle precondition)") {
    // The DuckDB oracle counts occurrences with regexp_extract_all
    // (NON-overlapping) while the automaton emits ALL occurrences. Counts
    // agree unless a term admits two overlapping WORD-BOUNDARY-VALID
    // occurrences: shift s needs border T[s:]==T[:len-s] AND non-word chars
    // at both overlap seams (T[s-1] before the 2nd start, T[len-s] after the
    // 1st end). Letter-only borders (e.g. the 'G' in "GROUP AGG") are safe.
    // Guard the fixture against an edit silently breaking
    // ann_counts/ann_score/ann_stats parity.
    import graft.dict.Automaton.isWordChar
    OntologyFixture.dictRows().map(_.term).distinct.foreach { t =>
      val overlapCapable = (1 until t.length).exists { s =>
        t.substring(s) == t.substring(0, t.length - s) &&
          !isWordChar(t.charAt(s - 1)) && !isWordChar(t.charAt(t.length - s))
      }
      assert(!overlapCapable,
        s"term '$t' admits word-valid self-overlap — regexp oracle counts would diverge")
    }
  }

  test("transitive closure: distances == BFS oracle, capped at maxLevel") {
    val maxLevel = 5
    val got = Closure.transitiveClosure(OntologyFixture.edgesDf(spark), maxLevel)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val oracle = graft.oracle.ReferenceOracle.closure(maxLevel)
    val want = oracle.flatMap { case (c, m) => m.map { case (a, d) => (c, a) -> d } }
    assert(got === want)
    assert(got.values.max <= maxLevel)
  }

  test("diamond resolves to min distance") {
    // C006 → C001 (diamond edge) and C006 → C002 (tree), both → C000
    val cl = graft.oracle.ReferenceOracle.closure(5)
    val c6 = "http://fix.onto/ONT1#C006"
    assert(cl(c6)("http://fix.onto/ONT1#C001") === 1)
    assert(cl(c6)("http://fix.onto/ONT1#C002") === 1)
    assert(cl(c6)("http://fix.onto/ONT1#C000") === 2) // via either parent, min=2
  }

  test("closure terminates on cycles (bounded, min-distance)") {
    import spark.implicits._
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("child_iri", "parent_iri")
    val got = Closure.transitiveClosure(cyc, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    // every node reaches every node (incl. itself around the cycle)
    assert(got.size === 9)
    assert(got(("a", "b")) === 1)
    assert(got(("a", "c")) === 2)
    assert(got(("a", "a")) === 3) // self via full cycle; loop still terminates
    assert(got.values.max === 3) // min-distances never exceed the cycle length
  }

  test("closure cap: maxLevel=1 keeps only direct parents") {
    val got = Closure.transitiveClosure(OntologyFixture.edgesDf(spark), 1)
    assert(got.agg(max("distance")).head().getInt(0) === 1)
    assert(got.count() === OntologyFixture.edges.map(e => (e.childIri, e.parentIri)).distinct.size)
  }

  test("fuzzyAlign: reordered/subset labels pair cross-ontology; cap bounds postings") {
    val labels = graft.dict.DictBuild.labelRows(OntologyFixture.conceptsDf(spark))
      .select(graft.dict.DictBuild.normalizeTerm(col("label")).as("term"),
        col("class_iri"), col("ont"))
    val got = graft.dict.Align.fuzzyAlign(labels).collect()
      .map(r => (r.getString(2), r.getString(5), r.getLong(6), r.getDouble(7)))
      .toSet
    // token-reordered pair exact LOOM cannot see: ONT1 syn "MERGE SORT"
    // (of sort) vs ONT2 D004 pref "SORT MERGE" — token sets equal
    assert(got.contains(("MERGE SORT", "SORT MERGE", 2L, 1.0)))
    // subset label: ONT1 "JOIN" vs ONT2 "HASH JOIN" — 1 shared of 2 union
    assert(got.contains(("JOIN", "HASH JOIN", 1L, 0.5)))
    // exact cross-ontology equality (the LOOM case) scores 1.0
    assert(got.contains(("HASH JOIN", "HASH JOIN", 2L, 1.0)))
    // everything is cross-ontology and ordered one way
    graft.dict.Align.fuzzyAlign(labels).collect().foreach { r =>
      assert(r.getString(1) < r.getString(4)) // ont_1 < ont_2
    }
    // a tight posting cap drops hot tokens from pairing entirely
    val capped = graft.dict.Align.fuzzyAlign(labels, maxPostings = 1).collect()
    assert(capped.isEmpty) // every pairable token rides >= 2 labels here
  }

  private def closureSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap

  test("deltaClosure == cold rebuild over edges ∪ delta (fixture release delta)") {
    val base = OntologyFixture.edgesDf(spark)
    val delta = OntologyFixture.edgesDeltaDf(spark)
    val old = Closure.transitiveClosure(base, 5)
    val got = closureSet(Closure.deltaClosure(base, delta, 5, old))
    val want = closureSet(Closure.transitiveClosure(base.unionByName(delta), 5))
    assert(got === want)
    // the three engineered delta shapes actually fired:
    val c6 = "http://fix.onto/ONT1#C006"
    val c0 = "http://fix.onto/ONT1#C000"
    assert(got((c6, c0)) === 1,
      "shortcut edge must IMPROVE the old distance-2 pair") // was 2 in v1
    assert(got(("http://fix.onto/ONT2#D004", "http://fix.onto/ONT1#X001")) === 3,
      "chained path D004 → D000 →Δ C003 →Δ X001 uses two new edges")
    assert(!closureSet(old).contains((c6, c0)) ||
      closureSet(old)((c6, c0)) === 2)
  }

  test("deltaClosure == cold rebuild on seeded random DAGs and deltas") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      // random DAG: edges only from higher to lower index (acyclic), plus a
      // random 1/4 slice held out as the release delta
      val edges = (0 until 3 * n).flatMap { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        if (a > b) Some((f"N$a%03d", f"N$b%03d")) else None
      }.distinct
      val (delta, base) = edges.partition(_ => rnd.nextInt(4) == 0)
      if (base.nonEmpty && delta.nonEmpty) {
        val baseDf = base.toDF("child_iri", "parent_iri")
        val deltaDf = delta.toDF("child_iri", "parent_iri")
        val old = Closure.transitiveClosure(baseDf, 5)
        val got = closureSet(Closure.deltaClosure(baseDf, deltaDf, 5, old))
        val want = closureSet(
          Closure.transitiveClosure(baseDf.unionByName(deltaDf), 5))
        assert(got === want, s"trial $trial")
      }
    }
  }

  test("deltaClosure: empty delta is the identity; cyclic delta bounded") {
    import spark.implicits._
    val base = Seq(("a", "b"), ("b", "c")).toDF("child_iri", "parent_iri")
    val old = Closure.transitiveClosure(base, 10)
    val none = Seq.empty[(String, String)].toDF("child_iri", "parent_iri")
    assert(closureSet(Closure.deltaClosure(base, none, 10, old))
      === closureSet(old))
    // delta closes the cycle c → a: every node now reaches every node
    val cyc = Seq(("c", "a")).toDF("child_iri", "parent_iri")
    val got = closureSet(Closure.deltaClosure(base, cyc, 10, old))
    val want = closureSet(Closure.transitiveClosure(
      base.unionByName(cyc), 10))
    assert(got === want)
    assert(got(("a", "a")) === 3)
  }

  test("spellVariants: FastSS ED1 discovery, exact-member/ED2/minLen " +
       "exclusions, df, hot-key cap") {
    import spark.implicits._
    val dict = Seq("QUERY", "JOIN", "SMALL").toDF("term")
    val docs = Seq(
      (1L, "qery join"),      // QERY: ED1 of QUERY (deletion)
      (2L, "qery joni the"),  // JONI: shares keys JON/JOI with JOIN but
      (3L, "join")            //       lev = 2 (transposition) → rejected;
    ).toDF("doc_id", "text")  //       THE below minLen; JOIN exact member
    val got = DictBuild.spellVariants(docs, dict).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("QERY", "QUERY", 2L)))
    // hot-key cap 0 drops every dictionary key → no candidates survive
    assert(DictBuild.spellVariants(docs, dict, hotKeyCap = 0).count() === 0L)
  }
}
