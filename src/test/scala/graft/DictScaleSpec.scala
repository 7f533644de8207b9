package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dict.{AutomatonBuild, NaiveMatcher}

/** S3 at scale: distributed trie build (term-partitioned shards +
  * treeReduce merge) over a ~50k-term synthetic dictionary must equal the
  * naive matcher, stay compact, and scan fast. */
class DictScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("50k-term distributed automaton build: correct, compact, broadcastable") {
    import spark.implicits._
    // deterministic synthetic terms: 3-9 char alphas + two-word phrases
    val words = (0 until 40000).map(i => f"W${i}%05d".toLowerCase)
    val phrases = (0 until 10000).map(i => s"ph${i % 500} w${i / 500}")
    val terms = (words ++ phrases).distinct.sorted
    val dict = terms.zipWithIndex
      .map { case (t, i) =>
        (t.toUpperCase(java.util.Locale.ROOT),
          Seq(("http://x/C" + i, "ONT1", true)), i + 1)
      }
      .toDF("term", "entries_raw", "term_id")
      .withColumn("entries", transform(col("entries_raw"),
        e => struct(e.getField("_1").as("class_iri"),
          e.getField("_2").as("ont"), e.getField("_3").as("pref"))))
      .drop("entries_raw")

    val t0 = System.nanoTime()
    val model = AutomatonBuild.build(spark, dict, "vS", shards = 8)
    val buildSec = (System.nanoTime() - t0) / 1e9
    info(f"build: $buildSec%.1f s, nodes=${model.automaton.numNodes}, " +
      f"size=${model.automaton.sizeEstimate / 1024 / 1024}%d MiB")
    assert(model.automaton.sizeEstimate < 256L * 1024 * 1024, "must stay broadcastable")

    // correctness vs naive on texts mixing hits + near-misses
    val naive = new NaiveMatcher(
      terms.zipWithIndex.map { case (t, i) => (t.toUpperCase(java.util.Locale.ROOT), i + 1) }.toArray)
    val samples = Seq(
      "w00000 ph3 w17 and w39999 w9999x xw00001",
      "ph499 w19 stray ph0 w0 ph0 w0",
      "nothing matches here at all",
      "W00123 inside W001234 but standalone w00123")
    samples.foreach { text =>
      val a = model.automaton.scan(text).map(h => (h.from, h.to, h.termId)).toSet
      val n = naive.scan(text).map(h => (h.from, h.to, h.termId)).toSet
      assert(a === n, s"text='$text'")
    }
    // and it actually finds things
    assert(model.automaton.scan(samples.head).nonEmpty)
  }

  test("canonical BFS numbering: shard-merge order cannot change the automaton") {
    import graft.dict.{Automaton, TrieBuilder}
    // same term set inserted in different orders and merged in different
    // shapes must FREEZE to bit-identical automata — the invariant that
    // makes resume/broadcast deterministic under treeReduce's arbitrary
    // merge order (ids are assigned before sharding; numbering is BFS over
    // sorted children, a pure function of the term SET)
    val terms = (0 until 500).map(i => (f"T${i % 97}%03d W${i / 7}%02d", i % 211))
    val a = TrieBuilder.of(terms.iterator)
    val shards = terms.grouped(50).map(g => TrieBuilder.of(g.iterator)).toSeq
    val b = shards.reduceLeft((x, y) => x.merge(y))
    val c = shards.reverse.reduceLeft((x, y) => x.merge(y))
    val (fa, fb, fc) = (Automaton.fromTrie(a), Automaton.fromTrie(b), Automaton.fromTrie(c))
    def arrays(x: Automaton) = Seq(x.childStart, x.childTo, x.fail, x.out,
      x.termIdAt, x.depth, x.emitNode, x.denseNext)
    arrays(fa).zip(arrays(fb)).foreach { case (p, q) => assert(p.sameElements(q)) }
    arrays(fa).zip(arrays(fc)).foreach { case (p, q) => assert(p.sameElements(q)) }
    assert(fa.childChar.sameElements(fb.childChar))
    assert(fa.childChar.sameElements(fc.childChar))
  }
}
