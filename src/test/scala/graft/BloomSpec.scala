package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain
import graft.ops.Bloom

/** Deterministic Bloom-filter pruning: no false negatives ever, false
  * positives exactly reproducible from the hashes, expression == scalar
  * contract, and a codegen plan with no object-mode island. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def keysDf(ks: Seq[String]) = {
    import spark.implicits._
    ks.toDF("k")
  }

  test("no false negatives: every inserted key passes, any m, k up to the bound") {
    for (m <- Seq(64, 512, 4096); k <- Seq(3, 8)) {
      val keys = (1 to 40).map(i => s"key$i")
      val words = Bloom.build(keysDf(keys), "k", m = m, k = k)
      val passed = keysDf(keys)
        .filter(Bloom.mightContain(col("k"), words, m, k)).count()
      assert(passed === keys.size, s"m=$m k=$k")
    }
    // k=9 would overflow h1 + 8·h2 past 2^63 (negative positions) — rejected
    val e = intercept[IllegalArgumentException] {
      Bloom.build(keysDf(Seq("x")), "k", m = 64, k = 9)
    }
    assert(e.getMessage.contains("no-overflow"))
  }

  test("false positives are deterministic and expression == scalar contract") {
    val keys = (1 to 40).map(i => s"key$i")
    val m = 64 // tiny filter → saturated bits → guaranteed FPs
    val words = Bloom.build(keysDf(keys), "k", m = m)
    val probes = (1 to 300).map(i => s"probe$i")
    val got = keysDf(probes)
      .filter(Bloom.mightContain(col("k"), words, m))
      .collect().map(_.getString(0)).toSet
    // scalar twin over the same md5 hashes (computed via Spark columns so
    // the hash derivation itself is shared, then checked scalar-side)
    val expr = BloomMightContain(null, null, words, m, 3)
    val hashes = keysDf(probes)
      .select(col("k"), Bloom.hash1(col("k")), Bloom.hash2(col("k")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = hashes.collect { case (k, h1, h2) if expr.contains(h1, h2) => k }.toSet
    assert(got === want)
    assert(want.nonEmpty, "a 64-bit filter holding 40 keys must produce FPs")
    assert(want.size < probes.size, "not everything may pass")
  }

  test("pruning plan: codegen'd predicate, no object-mode island, no UDF") {
    val words = Bloom.build(keysDf(Seq("alpha", "beta")), "k", m = 4096)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pruned = docs
      .select(col("doc_id"), explode(split(upper(col("text")), " ")).as("w"))
      .filter(Bloom.mightContain(col("w"), words, 4096))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"), plan)
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
