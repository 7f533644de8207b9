package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dict.{Automaton, NaiveMatcher, TrieBuilder}

/** A2/A5 semantics: golden cases + seeded randomized equivalence vs the
  * naive scalar matcher (SURVEY.md §6.2). */
class AutomatonSpec extends AnyFunSuite {

  private def build(terms: (String, Int)*): Automaton =
    Automaton.fromTrie(TrieBuilder.of(terms.iterator))

  private def hitsOf(a: Automaton, text: String, longest: Boolean = false) =
    a.scan(text, longest).map(h => (h.from, h.to, h.termId)).toSet

  test("word boundaries at both ends, case-insensitive, 1-based offsets") {
    val a = build("SCAN" -> 1, "TABLE SCAN" -> 2)
    // 'scan' inside 'scanner' must NOT match; standalone does
    assert(hitsOf(a, "scan the scanner") === Set((1, 4, 1)))
    assert(hitsOf(a, "a Table SCAN here") === Set((3, 12, 2), (9, 12, 1)))
  }

  test("substring-of-word never matches (par in spark/part)") {
    val a = build("PAR" -> 1)
    assert(hitsOf(a, "spark part partition") === Set.empty)
    assert(hitsOf(a, "a par b") === Set((3, 5, 1)))
  }

  test("named decision NonWordEdgeBoundary: adjacent-char checks apply even at non-word term edges") {
    // D3/D4 normalization means real dictionary terms start/end with word
    // chars, so this edge is normally unexercised — pinned here so it cannot
    // drift silently (SURVEY.md §7.4). CONTRACT: whole-word matching requires
    // the char BEFORE the match start and AFTER the match end to be non-word,
    // REGARDLESS of the term's own edge classes. This intentionally diverges
    // from \b-regex semantics, which would accept "-ABC" inside "X-ABC"
    // (\b sits between 'X' and '-') — mgrep-style delimiter checks look at
    // the chars adjacent to the SPAN, not at word/non-word transitions.
    val a = build("-ABC" -> 1)
    assert(hitsOf(a, "X-ABC") === Set.empty) // regex \b would accept this
    assert(hitsOf(a, " -ABC") === Set((2, 5, 1)))
    assert(hitsOf(a, "-ABC") === Set((1, 4, 1))) // text edges are boundaries
    val b = build("ABC-" -> 2)
    assert(hitsOf(b, "ABC-D") === Set.empty) // regex \b would accept this
    assert(hitsOf(b, "ABC- d") === Set((1, 4, 2)))
    assert(hitsOf(b, "ABC-") === Set((1, 4, 2)))
  }

  test("all occurrences incl. nested term, longestOnly keeps max end per start") {
    val a = build("SORT" -> 1, "MERGE SORT" -> 2)
    val text = "merge sort sort"
    assert(hitsOf(a, text) === Set((1, 10, 2), (7, 10, 1), (12, 15, 1)))
    // longest: start 7 hit (7,10) survives (no competitor at same start)
    assert(hitsOf(a, text, longest = true) === Set((1, 10, 2), (7, 10, 1), (12, 15, 1)))
    val t2 = "sort sorting"
    assert(hitsOf(a, t2) === Set((1, 4, 1)))
  }

  test("longestOnly drops the shorter hit at the same start") {
    val a = build("MERGE" -> 1, "MERGE SORT" -> 2)
    assert(hitsOf(a, "merge sort") === Set((1, 5, 1), (1, 10, 2)))
    assert(hitsOf(a, "merge sort", longest = true) === Set((1, 10, 2)))
  }

  test("adjacent repeats each match (regex-oracle count parity)") {
    val a = build("SORT" -> 1)
    assert(hitsOf(a, "sort x sort sort") === Set((1, 4, 1), (8, 11, 1), (13, 16, 1)))
  }

  test("digits and underscore are word chars") {
    val a = build("KEY" -> 1)
    assert(hitsOf(a, "key1 _key key_ key") === Set((16, 18, 1)))
  }

  test("unicode text positions stay in original coordinates") {
    val a = build("SCAN" -> 1)
    assert(hitsOf(a, "数据 scan 扫描") === Set((4, 7, 1)))
  }

  test("sharded trie merge equals single build") {
    val terms = Vector("SCAN" -> 1, "TABLE SCAN" -> 2, "SORT" -> 3,
      "MERGE SORT" -> 4, "HASH" -> 5, "HASH JOIN" -> 6)
    val single = Automaton.fromTrie(TrieBuilder.of(terms.iterator))
    val (s1, s2) = terms.splitAt(3)
    val merged = Automaton.fromTrie(
      TrieBuilder.of(s1.iterator).merge(TrieBuilder.of(s2.iterator)))
    val text = "the hash join does a merge sort then a table scan hash"
    assert(single.scan(text).toList === merged.scan(text).toList)
  }

  // --- property: automaton == naive matcher on random dicts + texts -------

  private val termPool = Vector("scan", "sort", "merge", "a1", "x", "键值",
    "hash", "join", "so", "sortsort", "merge sort", "sort merge", "12", "k_y",
    "sort sort", // self-overlapping pattern (suffix == prefix)
    "x y x", "so x so") // borders with word boundaries (word-valid overlaps)
  private val textPool = Vector(
    "scan", "sort", "merge", "merge sort", "scanner", "a1", "x", "键值",
    "12", "k_y", "SORT", "Merge", ",", "_", "sort sort sort",
    "x y x y x", "so x so x so") // word-valid overlapping occurrences

  test("property: automaton hits == naive matcher hits (incl. longestOnly)") {
    val rnd = new scala.util.Random(42) // deterministic
    for (_ <- 1 to 500) {
      val terms = (1 to (1 + rnd.nextInt(8)))
        .map(_ => termPool(rnd.nextInt(termPool.size)))
        .map(_.toUpperCase(java.util.Locale.ROOT)).distinct.sorted
      val withIds = terms.zipWithIndex.map { case (t, i) => (t, i + 1) }
      val text = (0 to rnd.nextInt(20))
        .map(_ => textPool(rnd.nextInt(textPool.size)))
        .mkString(if (rnd.nextBoolean()) " " else ",")
      val auto = Automaton.fromTrie(TrieBuilder.of(withIds.iterator))
      val naive = new NaiveMatcher(withIds.toArray)
      for (longest <- Seq(false, true)) {
        val a = auto.scan(text, longest).map(h => (h.from, h.to, h.termId)).toSet
        val n = naive.scan(text, longest).map(h => (h.from, h.to, h.termId)).toSet
        assert(a === n, s"dict=$terms text='$text' longest=$longest")
      }
      auto.scan(text).foreach { h =>
        assert(h.from >= 1 && h.to <= text.length && h.from <= h.to)
      }
    }
  }
}
