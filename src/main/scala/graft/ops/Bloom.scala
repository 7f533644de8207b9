package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** Bloom-filter semi-join pruning — the runtime-filter pattern at corpus
  * scale: build a BOUNDED bitset (m bits) from the small side's keys, push
  * membership into the big side's scan as a codegen'd predicate, and only
  * shuffle the survivors into the real join. The driver materialization is
  * bounded by the FILTER SIZE, never the key count (that is what a Bloom
  * filter is); false positives only cost extra rows in the downstream
  * exact join — never wrong results.
  *
  * All hashing is the repo's portable md5-derived double-hash
  * (Kirsch–Mitzenmacher), so the DuckDB oracle rebuilds the identical bit
  * positions and accept set, deterministic false positives included. */
object Bloom {

  /** The two 60-bit halves of one md5 — h1 = [[Sketch.hash60]] (the ONE
    * portable-hash contract, hex[1..15]), h2 = hex[17..31]. */
  def hash1(key: Column): Column = Sketch.hash60(key)
  def hash2(key: Column): Column =
    conv(substring(md5(key), 17, 15), 16, 10).cast("long")

  /** The k probe positions of one key: (h1 + i·h2) mod m, i ∈ [0, k).
    * No-overflow bound: h1 + 7·h2 < 8·2^60 = 2^63, so k ≤ 8 (k = 9 would
    * reach 16·2^60 = 2^64 and wrap negative — negative positions index
    * outside the bitset). */
  def positions(key: Column, m: Int, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => (hash1(key) + i.cast("long") * hash2(key)) % m)

  /** Build the filter's bit words from the (ontology-/dim-scale) key side.
    * One distinct aggregation over ≤ m positions; the collect is bounded by
    * m bits regardless of how many keys went in. */
  def build(keys: DataFrame, keyCol: String, m: Int, k: Int = 3): Array[Long] = {
    require(k >= 1 && k <= 8, s"k=$k out of the no-overflow bound [1,8]")
    val words = new Array[Long]((m + 63) / 64)
    keys.select(explode(positions(col(keyCol), m, k)).as("p")).distinct()
      .collect().foreach { r =>
        val p = r.getLong(0)
        words((p >> 6).toInt) |= (1L << (p & 63))
      }
    words
  }

  /** Membership predicate over a key column — a codegen'd expression (no
    * UDF, no object-mode island); see [[BloomMightContain]]. */
  def mightContain(key: Column, words: Array[Long], m: Int, k: Int = 3): Column =
    GraftShim.column(BloomMightContain(
      GraftShim.expression(hash1(key)), GraftShim.expression(hash2(key)),
      words, m, k))
}
