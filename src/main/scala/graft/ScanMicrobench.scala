package graft

import graft.dict.{Automaton, NaiveMatcher, TrieBuilder}
import graft.fixture.OntologyFixture

/** Dev-only micro-benchmark: raw single-thread automaton scan throughput
  * (no Spark), vs the naive matcher — the apples-to-apples number against
  * the reference's C mgrep radix scan. */
object ScanMicrobench {
  def main(args: Array[String]): Unit = {
    val repeats = if (args.nonEmpty) args(0).toInt else 200
    val dictRows = OntologyFixture.dictRows()
    val terms = dictRows.map(_.term).distinct.sorted.zipWithIndex.map { case (t, i) => (t, i + 1) }
    val auto = Automaton.fromTrie(TrieBuilder.of(terms.iterator))
    val naive = new NaiveMatcher(terms.toArray)

    // two corpora: dense = fixture vocab everywhere (worst-case emission),
    // sparse = mostly filler (realistic web-page dictionary-hit density)
    val base = ("the fast hash join beats a merge sort on the table scan " * 20).trim
    val filler = base.split(' ').map(_.reverse).mkString(" ")
    val dense = (base + " " + filler) * 5
    val sparse = (filler + " scan " + filler + " hash join ") * 5
    println(s"dense ${dense.length} chars / sparse ${sparse.length} chars, " +
      s"dict ${terms.size} terms, automaton ${auto.numNodes} nodes " +
      s"~${auto.sizeEstimate / 1024} KiB")

    def bench(name: String, doc: String, f: String => Int): Double = {
      (1 to 50).foreach(_ => f(doc)) // JIT warmup
      var hits = 0
      val t0 = System.nanoTime()
      (1 to repeats).foreach(_ => hits += f(doc))
      val sec = (System.nanoTime() - t0) / 1e9
      val mbs = doc.length.toLong * repeats / 1e6 / sec
      println(f"$name%-22s $mbs%8.1f MB/s  (${hits / repeats} hits/doc)")
      mbs
    }
    val buf = new graft.dict.HitBuffer()
    val denseU8 = org.apache.spark.unsafe.types.UTF8String.fromString(dense)
    val sparseU8 = org.apache.spark.unsafe.types.UTF8String.fromString(sparse)
    def byteScan(u8: org.apache.spark.unsafe.types.UTF8String): Int = {
      auto.scanAsciiBytesInto(u8.getBaseObject, u8.getBaseOffset, u8.numBytes, buf)
      buf.size
    }
    // mixed-script corpus: ~10 % non-ASCII tokens (the real-web shape) —
    // exercises the general UTF-8 loop end to end
    val mixed = sparse.split(' ').zipWithIndex
      .map { case (w, i) => if (i % 10 == 0) "café漢字" else w }.mkString(" ")
    val mixedU8 = org.apache.spark.unsafe.types.UTF8String.fromString(mixed)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      bench("dense  automaton(buf)", dense, d => auto.scanInto(d, buf).size)
      bench("dense  bytes(u8)", dense, _ => byteScan(denseU8))
      bench("dense  +longestOnly", dense, d => auto.scanInto(d, buf, longestOnly = true).size)
      bench("dense  naive", dense, d => naive.scan(d).length)
      bench("sparse automaton(buf)", sparse, d => auto.scanInto(d, buf).size)
      bench("sparse bytes(u8)", sparse, _ => byteScan(sparseU8))
      bench("sparse naive", sparse, d => naive.scan(d).length)
      bench("mixed  bytes(u8)", mixed, _ => byteScan(mixedU8))
      bench("mixed  chars(String)", mixed, d => auto.scanInto(d, buf).size)
    }
  }
}
