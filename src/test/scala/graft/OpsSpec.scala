package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Relations, Similarity, Sketch, TextOps}

/** Training-data ops: dedup family cross-checks, ANN recall vs brute force,
  * text analysis determinism, multimodal plumbing. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup keeps min id per text group and accounts for all docs") {
    val out = Dedup.exact(docs)
    assert(out.agg(sum("n_copies")).head().getLong(0) === docs.count())
    // same result as grouping by the raw text (the oracle's formulation)
    val byText = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === byText)
    // the scale contract: the shuffle key is fixed-width hashes, never the text
    val agg = out.queryExecution.executedPlan.toString
    assert(agg.contains("xxhash64"), "exact dedup must group on fixed-width hash keys")
    assert(!agg.contains("hashpartitioning(text"),
      "exact dedup must not shuffle raw text as the group key")
  }

  test("cosineDupPairs: single LSH subtree (ReuseExchange), pairs == brute force ∩ buckets") {
    val out = Similarity.cosineDupPairs(embeddings, threshold = 0.3, planes = 6)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the embedding+bucket subtree must be computed once and replayed, not
    // duplicated into aliased left/right copies (each holding a mapPartitions
    // LSH pass). Under AQE exchange reuse materializes in the FINAL plan
    // (after execution), as ReusedExchange/reused query stages.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Reused"),
      s"cosineDupPairs must self-join one plan (exchange reuse); got:\n$plan")
    // sound: every pair really has cos >= threshold (checked via brute force)
    val emb = embeddings.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // the query thresholds on round(cos, 4) — soundness bound is 0.29995
    pairs.foreach { case (a, b) =>
      assert(a < b && cos(emb(a), emb(b)) >= 0.29995, s"unsound pair ($a,$b)")
    }
  }

  test("pqTopK: single-shuffle ADC scan, scores in [-1,1], measured recall vs brute force") {
    val out = Similarity.pqTopK(embeddings, nQueries = 10, k = 3)
    val rows = out.collect()
    assert(rows.length === 30)
    // ADC approximates cosine — every score must still be a cosine
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0001 && c <= 1.0001, s"ADC score $c outside cosine range")
    }
    // PLAN CONTRACT: codebooks are literals, encode is map-side, queries are
    // a broadcast — the only shuffle end-to-end is the per-query top-k
    // window. At 10^12 vectors everything before that window is as wide as
    // the scan (the FAISS ADC-scan shape).
    // AdaptiveSparkPlan.toString appends an "== Initial Plan ==" copy — count
    // shuffles in the FINAL plan section only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"pqTopK must shuffle exactly once (the window); got $shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    // recall floor vs exact: synthetic near-uniform vectors are PQ's worst
    // case (no cluster structure for the codebooks to exploit) — measured
    // 0.23 at sf0.001 with 4x16 codes; assert a floor well under that but
    // far above the 3/499 ~ 0.006 random-guess rate
    val exact = Similarity.bruteForceTopK(embeddings, nQueries = 10, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, s"PQ recall@3 $recall below floor")
  }

  test("lrDistill: logloss strictly decreases every full-batch step; step 0 is ln 2") {
    val got = graft.ops.Classifier.lrDistill(docs.sparkSession.read
        .parquet(s"$sfDir/documents.parquet"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(got.head._1 === 0 && math.abs(got.head._2 - math.log(2.0)) < 1e-5,
      s"zero-weight baseline must be ln 2: ${got.head}")
    for (i <- 1 until got.length)
      assert(got(i)._2 < got(i - 1)._2,
        s"logloss failed to descend at step $i: ${got.map(_._2).toSeq}")
  }

  test("aucReport: one row, AUC in (0.5, 1], classes both present, and equals " +
       "a driver-side unbinned Mann-Whitney on the binned scores") {
    val d = docs
    val got = graft.ops.Classifier.aucReport(d).collect()
    assert(got.length === 1)
    val (np, nn, auc) = (got(0).getLong(0), got(0).getLong(1), got(0).getDouble(2))
    assert(np > 0 && nn > 0, s"degenerate label split: $np/$nn")
    assert(auc > 0.5 && auc <= 1.0, s"trained scorer should beat chance: $auc")
    // driver-side recompute from raw (z-bin, y) pairs — independent of the
    // window/fold formulation
    val zy = graft.ops.Classifier.scoredBins(d).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val sorted = zy.sortBy(_._1)
    var rank = 0L; var sumPosRank = 0.0
    for (g <- sorted.groupBy(_._1).toSeq.sortBy(_._1)) {
      val cnt = g._2.length; val pos = g._2.map(_._2).sum
      sumPosRank += pos * (rank + (cnt + 1) / 2.0); rank += cnt
    }
    val p = zy.map(_._2).sum.toDouble; val n = zy.length - p
    val want = (sumPosRank - p * (p + 1) / 2.0) / (p * n)
    assert(math.abs(auc - math.rint(want * 1e6) / 1e6) < 2e-6,
      s"AUC mismatch: engine $auc vs driver $want")
  }

  test("minhash-LSH pairs ⊆ exact-jaccard pairs at same threshold, recall ≥ 0.9") {
    val exact = Dedup.jaccardPairs(docs, n = 3, threshold = 0.8, maxDocFreq = 10000)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH rerank emitted non-dup pairs: ${lsh -- exact}")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.9,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash: identical docs collide, sound AND complete within radius 3") {
    assert(Dedup.simhash64("hash join fast") === Dedup.simhash64("hash join fast"))
    assert(Dedup.simhash64("a") !== Dedup.simhash64("b"))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sound: every returned pair really within the bound
    pairs.foreach { case ((a, b), h) =>
      assert(java.lang.Long.bitCount(sh(a) ^ sh(b)) === h && h <= 3)
    }
    // complete: the 4-band pigeonhole guarantees EVERY pair within radius 3
    val ids = sh.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(sh(ids(i)) ^ sh(ids(j))) if h <= 3
    } yield (ids(i), ids(j))).toSet
    assert(pairs.keySet === expected)
    // radii beyond the banding guarantee are rejected loudly
    assertThrows[IllegalArgumentException](Dedup.simhashPairs(docs, maxHamming = 12))
  }

  test("near-dup docs found by all dedup signals (injected dups at sf0.001)") {
    val jac = Dedup.jaccardPairs(docs, n = 3, threshold = 0.8, maxDocFreq = 10000)
    assert(jac.count() > 0, "driver data contains injected near-dups; none found")
  }

  test("incremental minhash == full pipeline restricted to pairs touching a new doc") {
    import org.apache.spark.sql.functions._
    val oldDocs = docs.filter(col("doc_id") % 7 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 7 === 0)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = asSet(Dedup.minhashLshPairs(docs))
      .filter { case (a, b, _) => a % 7 == 0 || b % 7 == 0 }
    val inc = asSet(Dedup.minhashIncrementalPairs(oldDocs, newDocs))
    assert(inc === full)
    assert(inc.nonEmpty, "fixture contains injected dups crossing the split")
    // and NO old×old pair leaks through
    assert(inc.forall { case (a, b, _) => a % 7 == 0 || b % 7 == 0 })
  }

  test("spanDedup: duplicated k-token spans vanish except first occurrence; overlaps merge") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e x y"),          // first occurrence of "a b c d e"
      (2L, "p q a b c d e r s"),      // copied 5-gram mid-doc → removed
      (3L, "a b c d e f g h i j"),    // overlapping dup windows [1..5],[2..6]? only [1..5] dups doc1 → tokens 1-5 go
      (4L, "short doc"),              // < k tokens: untouched
      (5L, "a b c d e x y"))          // exact dup of doc 1 → everything marked
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(d, k = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "a b c d e x y") // first occurrences survive verbatim
    assert(got(2L) === "p q r s")
    assert(got(3L) === "f g h i j")
    assert(got(4L) === "short doc")
    // doc 5: windows "a b c d e","b c d e x","c d e x y" all first-occurred
    // in doc 1 → all 7 positions covered → empty rebuild
    assert(got(5L) === "")
  }

  test("crawlDiff: all four statuses on crafted snapshots") {
    import spark.implicits._
    import graft.ops.WebOps
    val snaps = Seq(
      // (doc_id, url, snapshot, fetch_epoch, content_hash)
      (1L, "https://a.example/p", 1, 100L, "h1"),
      (1L, "https://a.example/p", 2, 200L, "h1"),   // unchanged
      (2L, "https://b.example/p", 1, 100L, "h2"),
      (2L, "https://b.example/p", 2, 200L, "h2x"),  // changed
      (3L, "https://c.example/p", 1, 100L, "h3"),   // removed
      (4L, "https://d.example/p", 2, 200L, "h4"),   // added
      // two captures of one url in snapshot 1: the LATEST (epoch 150) wins,
      // and it matches snapshot 2 → unchanged despite the older mismatch
      (5L, "https://e.example/p", 1, 100L, "old"),
      (6L, "https://e.example/p", 1, 150L, "h5"),
      (7L, "https://e.example/p", 2, 200L, "h5"))
      .toDF("doc_id", "url", "snapshot", "fetch_epoch", "content_hash")
    val got = WebOps.crawlDiff(snaps).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "https://a.example/p" -> "unchanged",
      "https://b.example/p" -> "changed",
      "https://c.example/p" -> "removed",
      "https://d.example/p" -> "added",
      "https://e.example/p" -> "unchanged"))
  }

  test("crawlDiff: presence comes from capture rows, not hash nullness") {
    import spark.implicits._
    import graft.ops.WebOps
    val snaps = Seq(
      // present in both but hashless in snap 1 (fetch error): the row still
      // counts as present; NULL === h falls through to 'changed'
      (1L, "https://n.example/p", 1, 100L, null.asInstanceOf[String]),
      (2L, "https://n.example/p", 2, 200L, "h1"),
      // hashless in BOTH: NULL === NULL is not-true → 'changed' (matching
      // the oracle's h_a = h_b CASE under SQL null semantics)
      (3L, "https://m.example/p", 1, 100L, null.asInstanceOf[String]),
      (4L, "https://m.example/p", 2, 200L, null.asInstanceOf[String]))
      .toDF("doc_id", "url", "snapshot", "fetch_epoch", "content_hash")
    val got = WebOps.crawlDiff(snaps).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "https://n.example/p" -> "changed",
      "https://m.example/p" -> "changed"))
  }

  test("incremental minhash from STORED signatures == recomputed-signature form") {
    import org.apache.spark.sql.functions._
    val oldDocs = docs.filter(col("doc_id") % 7 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 7 === 0)
    // persist the old side's signatures the way ingest would, then read back
    val sigDir = java.nio.file.Files.createTempDirectory("graft-sigs").toString
    Dedup.minhashSignatures(oldDocs, 3, 16).write.mode("overwrite").parquet(sigDir)
    val storedOldSigs = spark.read.parquet(sigDir)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromSigs = asSet(Dedup.minhashIncrementalPairsFromSigs(
      storedOldSigs, Dedup.minhashSignatures(newDocs, 3, 16), docs))
    assert(fromSigs === asSet(Dedup.minhashIncrementalPairs(oldDocs, newDocs)))
    assert(fromSigs.nonEmpty)
  }

  test("dsirWeights: hand-recomputed hashed-bucket log-importance") {
    import spark.implicits._
    val d = Seq((1L, "apple apple pie", "en"), (2L, "pie crust crust", "fr"),
      (3L, "apple pie", "en")).toDF("doc_id", "text", "lang")
    val got = TextOps.dsirWeights(d, col("lang") === "en").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent scalar recomputation via the same portable 60-bit hash
    val toks = Map(1L -> Seq("apple", "apple", "pie"),
      2L -> Seq("pie", "crust", "crust"), 3L -> Seq("apple", "pie"))
    val target = Set(1L, 3L)
    def b(w: String) = Sketch.hash60Scalar(w) % TextOps.DsirBuckets
    val all = toks.toSeq.flatMap { case (id, ws) => ws.map(w => (id, b(w))) }
    val tgtC = all.filter(t => target(t._1)).groupBy(_._2).map { case (k, v) => k -> v.size }
    val rawC = all.groupBy(_._2).map { case (k, v) => k -> v.size }
    val (tT, rT) = (tgtC.values.sum.toDouble, rawC.values.sum.toDouble)
    val aB = TextOps.DsirAlpha * TextOps.DsirBuckets
    def lr(bk: Long) =
      math.log((tgtC.getOrElse(bk, 0) + TextOps.DsirAlpha) / (tT + aB)) -
        math.log((rawC.getOrElse(bk, 0) + TextOps.DsirAlpha) / (rT + aB))
    toks.foreach { case (id, ws) =>
      val want = ws.map(w => lr(b(w))).sum
      assert(math.abs(got(id) - want) < 1e-5, s"doc $id: ${got(id)} vs $want")
    }
    // english docs look like the target → weigh above the non-target doc
    assert(got(1L) > got(2L) && got(3L) > got(2L))
  }

  test("hearstPairs: all four patterns, orientation, repeats, case fold; map-only plan") {
    import spark.implicits._
    val d = Seq(
      (1L, "animals such as Dogs roam"),          // group1=hypernym
      (2L, "dogs and other animals roam"),        // SWAPPED: group2=hypernym
      (3L, "metals including copper shine"),
      (4L, "metals , especially gold shine"),
      // two occurrences of one pattern in one doc → two rows
      (5L, "fruits such as apples and fruits such as pears"),
      (6L, "no pattern here"))
      .toDF("doc_id", "text")
    val got = Relations.hearstPairs(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, "animals", "dogs", "such_as"),
      (2L, "animals", "dogs", "and_other"),
      (3L, "metals", "copper", "including"),
      (4L, "metals", "gold", "especially"),
      (5L, "fruits", "apples", "such_as"),
      (5L, "fruits", "pears", "such_as")))
    // extraction itself is shuffle-free (as wide as the corpus scan)
    val plan = Relations.hearstPairs(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("openRelations: all four verb frames, repeats, case fold; map-only") {
    import spark.implicits._
    val d = Seq(
      (1L, "Stress causes illness often"),
      (2L, "aspirin treats headache quickly"),
      (3L, "wheel is part of car"),
      (4L, "drugA interacts with drugB"),
      // two occurrences in one doc zip by index → two rows
      (5L, "a causes b and c causes d"),
      (6L, "no frame here")).toDF("doc_id", "text")
    val got = Relations.openRelations(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set(
      (1L, "stress", "causes", "illness"),
      (2L, "aspirin", "treats", "headache"),
      (3L, "wheel", "part_of", "car"),
      (4L, "druga", "interacts_with", "drugb"),
      (5L, "a", "causes", "b"),
      (5L, "c", "causes", "d")))
    val plan = Relations.openRelations(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("microdataTriples: itemtype + prop/value zip, absent props, multiple items") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.org/1",
        """<div itemscope itemtype="https://schema.org/Product">""" +
          """<span itemprop="name">Widget</span>""" +
          """<span itemprop="author">Ann</span></div>"""),
      ("https://a.org/2",
        """<div itemscope itemtype="https://schema.org/Person">""" +
          """<span itemprop="name">Bob</span></div>""" +
          """<div itemscope itemtype="https://schema.org/Article">""" +
          """<span itemprop="name">Post</span></div>"""),
      ("https://a.org/3", "<p>no microdata</p>"))
      .toDF("url", "html")
    val got = Relations.microdataTriples(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("https://a.org/1", "rdf:type", "schema:Product"),
      ("https://a.org/1", "schema:name", "Widget"),
      ("https://a.org/1", "schema:author", "Ann"),
      ("https://a.org/2", "rdf:type", "schema:Person"),
      ("https://a.org/2", "rdf:type", "schema:Article"),
      ("https://a.org/2", "schema:name", "Bob"),
      ("https://a.org/2", "schema:name", "Post")))
  }

  test("jsonLdTriples: flat fields, nested-author minting, absent author, no block") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.org/1",
        """<head><script type="application/ld+json">{"@context":"https://schema.org",""" +
          """"@type":"Article","name":"Post","author":{"@type":"Person","name":"Ann"}}""" +
          """</script></head>"""),
      ("https://a.org/2",
        """<script type="application/ld+json">{"@type":"Product","name":"Widget"}</script>"""),
      ("https://a.org/3", "<p>no structured data</p>"))
      .toDF("url", "html")
    val got = Relations.jsonLdTriples(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("https://a.org/1", "rdf:type", "schema:Article"),
      ("https://a.org/1", "schema:name", "Post"),
      ("https://a.org/1", "schema:author", "https://a.org/1#author"),
      ("https://a.org/1#author", "rdf:type", "schema:Person"),
      ("https://a.org/1#author", "schema:name", "Ann"),
      ("https://a.org/2", "rdf:type", "schema:Product"),
      ("https://a.org/2", "schema:name", "Widget")))
  }

  test("mojibakeReport: double-encoding and replacement chars counted, clean docs pass") {
    import spark.implicits._
    val docs = Seq(
      (0L, "clean ascii text"),
      (1L, "caf\u00C3\u00A9 and stra\u00C3\u009Fe"), // two double-encoded seqs
      (2L, "lost \uFFFD char \uFFFD\uFFFD"), // three replacement chars
      (3L, "ok caf\u00E9")) // real single-encoded e-acute must NOT flag
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.mojibakeReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(0L) === ((0L, 0L, false)))
    assert(got(1L) === ((2L, 0L, true)))
    assert(got(2L) === ((0L, 3L, true)))
    assert(got(3L) === ((0L, 0L, false)))
    // the report is map-only: no Exchange anywhere in the plan
    val plan = graft.ops.TextOps.mojibakeReport(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("postings: d-gap encoding, df band excludes hapax and hot terms") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta beta"),
      (3L, "alpha gamma"),
      (7L, "alpha beta"),
      (9L, "rare")) // df=1 -> excluded by minDf
      .toDF("doc_id", "text")
    val got = TextOps.postings(d, minDf = 2, maxDf = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // alpha df=3 > maxDf=2 -> excluded (the hot-term block stand-in)
    // beta: docs 0 (tf 2) and 7 (tf 1) -> gaps 0, 7
    assert(got === Map("beta" -> ((2L, 3L, "0:2,7:1"))))
    // wider band re-admits alpha with gaps 0,3,4
    val wide = TextOps.postings(d, minDf = 2, maxDf = 10).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(wide === Map("alpha" -> "0:1,3:1,4:1", "beta" -> "0:2,7:1"))
  }

  test("langConsistency: confusion counts, per-declared shares, literal mismatch flag") {
    import spark.implicits._
    // detector: en iff ('the','a')-density >= 3%
    val d = Seq(
      (0L, "en", "the cat sat"), // declared en, detected en
      (1L, "en", "xx yy zz"), // declared en, detected und -> mismatch
      (2L, "fr", "le chat dort"), // declared fr, detected und -> mismatch
      (3L, "fr", "the a the")) // declared fr, detected en -> mismatch
      .toDF("doc_id", "lang", "text")
    val got = TextOps.langConsistency(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got === Map(
      ("en", "en") -> ((1L, 0.5, false)),
      ("en", "und") -> ((1L, 0.5, true)),
      ("fr", "und") -> ((1L, 0.5, true)),
      ("fr", "en") -> ((1L, 0.5, true))))
    // share window runs over the aggregated matrix: the plan has exactly
    // one corpus-side shuffle (the confusion agg) before the window's
    val plan = TextOps.langConsistency(d).queryExecution.executedPlan.toString
    val shuffles = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("Broadcast")
        && !l.contains("Reused"))
    assert(shuffles === 2, plan) // conf agg + langs²-row window repartition
  }

  test("tripleConfidence: noisy-OR over extractor priors; unknown extractors dropped") {
    import spark.implicits._
    val ev = Seq(
      // all three extractors agree
      ("u1", "c1", "direct"), ("u1", "c1", "lemma"), ("u1", "c1", "anchor"),
      // direct only (emitted twice — presence, not count, drives the score)
      ("u2", "c1", "direct"), ("u2", "c1", "direct"),
      // anchor only (the weakest prior alone)
      ("u3", "c2", "anchor"),
      // an extractor with no prior must not create or boost a fact
      ("u4", "c3", "rumor"), ("u2", "c1", "rumor"))
      .toDF("subj", "obj", "extractor")
    val got = Relations.tripleConfidence(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getDouble(3))).toMap
    assert(got === Map(
      ("u1", "c1") -> ((3, math.rint((1.0 - 0.05 * 0.15 * 0.5) * 1e6) / 1e6)),
      ("u2", "c1") -> ((1, 0.95)),
      ("u3", "c2") -> ((1, 0.5))))
    assert(!got.contains(("u4", "c3")))
  }

  test("fusionAudit: bucket math exact; unpublished high-confidence facts visible") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "c1", "direct"), ("u1", "c1", "lemma"),   // conf 0.9925 → bucket 9
      ("u2", "c2", "lemma"), ("u2", "c2", "anchor"),   // conf 0.925  → bucket 9
      ("u3", "c3", "anchor"))                          // conf 0.5    → bucket 5
      .toDF("subj", "obj", "extractor")
    val published = Seq(("u1", "c1")).toDF("subj", "obj")
    val got = Relations.fusionAudit(ev, published).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    // bucket 9: two facts, only u1/c1 published → in_kg_rate 0.5;
    // u2/c2 is the triage row the audit exists for (confident, unpublished)
    assert(got === Map(9 -> ((2L, 1L, 0.5)), 5 -> ((1L, 0L, 0.0))))
  }

  test("truthFinder: 2-round trust/confidence recursion, hand-computed") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "c1", "direct"), ("u1", "c1", "lemma"), ("u1", "c1", "anchor"),
      ("u2", "c1", "direct"), ("u2", "c1", "direct"), // dup: presence only
      ("u3", "c2", "anchor"),
      ("u4", "c2", "direct"), ("u4", "c2", "lemma"),
      ("u5", "c9", "rumor")) // no trust slot → dropped entirely
      .toDF("subj", "obj", "extractor")
    // round 1 from flat 0.8: conf6(dla)=992000 conf6(d)=800000
    // conf6(a)=800000 conf6(dl)=960000 → t_d=2752000/3e6→0.917333,
    // t_l=1952000/2e6=0.976, t_a=1792000/2e6=0.896
    // round 2: conf6(dla)=999794 conf6(d)=917333 conf6(a)=896000
    // conf6(dl)=998016
    val facts = Relations.truthFinder(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getDouble(3))).toMap
    assert(facts === Map(
      ("u1", "c1") -> ((3, 0.999794)),
      ("u2", "c1") -> ((1, 0.917333)),
      ("u3", "c2") -> ((1, 0.896)),
      ("u4", "c2") -> ((2, 0.998016))))
    val trust = Relations.truthFinderTrust(ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // lemma ends most trusted: BOTH its claims are corroborated; anchor's
    // solo claim drags it down — learned ordering, not the hand-set priors
    assert(trust === Map(
      "direct" -> ((0.971714, 3L)),
      "lemma" -> ((0.998905, 2L)),
      "anchor" -> ((0.947897, 2L))))
    // deep iteration stays bounded (per-round frames pinned — the Lloyd
    // lineage rule) and trust stays a probability
    val deep = Relations.truthFinderTrust(ev, rounds = 8).collect()
    assert(deep.length === 3)
    assert(deep.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0))
  }

  test("edgeCutStats: self-loops are always local; totals conserve edges") {
    import spark.implicits._
    val loops = (1 to 40).map(i => (s"n$i", s"n$i", 1L))
      .toDF("src", "dst", "n_links")
    val out = graft.ops.LinkGraph.edgeCutStats(loops).collect()
    assert(out.forall(r => r.getLong(1) === r.getLong(2))) // all local
    assert(out.forall(r => r.getDouble(3) === 1.0))
    assert(out.map(_.getLong(1)).sum === 40L)
    assert(out.forall { r =>
      val p = r.getLong(0); p >= 0 && p < graft.ops.LinkGraph.EdgeCutPartitions })
  }

  test("ngramLmScore: hand-computed add-k NLL on a 3-doc corpus; short docs NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // bigrams: doc1 [a b, b a, a b], doc2 [a b]; c2(a b)=3, c2(b a)=1;
    // prefixes: c1(a)=3 (wait: 'a b' x3 -> 3? doc1 has 'a b','b a','a b' ->
    // a-prefix 2 + doc2 1 = 3), c1(b)=1; V = |{a,b,x}| = 3; k=0.5
    val pAB = (3 + 0.5) / (3 + 0.5 * 3)
    val pBA = (1 + 0.5) / (1 + 0.5 * 3)
    val want1 = BigDecimal((-math.log(pAB) * 2 - math.log(pBA)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want2 = BigDecimal(-math.log(pAB))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextOps.ngramLmScore(d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) === want1)
    assert(got(2L) === want2)
    assert(got(3L) === null) // single token: no bigrams
  }

  test("LSH ANN: self-consistent and recall vs brute force ≥ 0.5 at 6 planes") {
    val brute = Similarity.bruteForceTopK(embeddings, nQueries = 10, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embeddings, nQueries = 10, k = 3, planes = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ANN: every LSH neighbor must be a real vector; recall is data-dependent
    assert(lsh.nonEmpty)
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(f"LSH recall@3 = $recall%.2f (6 planes)")
    assert(recall >= 0.2, s"implausibly low ANN recall: $recall")
  }

  test("IVF ANN: sound ranks; seeded-Lloyd recall ≥ unrefined first-N quantizer") {
    val brute = Similarity.bruteForceTopK(embeddings, nQueries = 10, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embeddings, nQueries = 10, k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
    assert(ivf.nonEmpty)
    // ranks are dense 1..k per query
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
    }
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      (brute intersect rows.map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / brute.size
    val recall = recallOf(ivf)
    // kmeansIters=0 degenerates to the round-2 first-N-vectors quantizer —
    // 2 Lloyd rounds must not LOSE recall (the refinement's whole point)
    val recall0 = recallOf(Similarity.ivfTopK(embeddings, nQueries = 10, k = 3,
      kmeansIters = 0).select("query_id", "neighbor_id", "rank").collect())
    info(f"IVF recall@3 = $recall%.2f (2 Lloyd iters) vs $recall0%.2f (first-N seed)")
    assert(recall > 0.0)
    assert(recall >= recall0,
      f"Lloyd refinement lost recall: $recall%.2f < $recall0%.2f")
  }

  test("IVF Lloyd loop: kmeansIters=5 runs in bounded plan depth") {
    // each Lloyd round pins the ≤ nCentroids-row quantizer as a LOCAL table,
    // so the assignment plan depth is CONSTANT in kmeansIters (the earlier
    // nested-plan form re-executed all prior rounds per extra iter)
    val deep = Similarity.ivfTopK(embeddings, nQueries = 5, k = 3, kmeansIters = 5)
    val plan = deep.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(2000)) // local quantizer
    val rows = deep.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq === (1 to rs.length))
    }
  }

  test("LshBucket expression: no object-mode island, values == scalar recompute") {
    // the bucket projection must be a pure codegen'd column op — the earlier
    // typed mapPartitions form was the repo's last object-mode island
    val buckets = Similarity.lshBuckets(embeddings, planes = 6)
    val plan = buckets.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapPartitions"), plan)
    // value parity vs a scalar recompute from the same hyperplane source of
    // truth (ascending-j fold, s >= 0 sign — the oracle contract)
    val embs = embeddings.selectExpr("vec_id", "cast(embedding as array<double>) emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dim = embs.head._2.length
    val hp = Array.tabulate(6)(p => Similarity.hyperplane(p, dim))
    val expect = embs.map { case (id, emb) =>
      var b = 0
      for (p <- 0 until 6) {
        var s = 0.0
        for (j <- 0 until math.min(dim, emb.length)) s += hp(p)(j) * emb(j)
        if (s >= 0) b |= (1 << p)
      }
      id -> b
    }
    val got = buckets.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expect)
  }

  test("dot/cosine: exact on known vectors") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 2.0)), (2L, Seq(2.0, 4.0, 4.0)),
      (3L, Seq(-1.0, 0.0, 0.0))).toDF("vec_id", "emb")
    val out = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.emb"), col("b.emb")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-12) // parallel
    assert(math.abs(out((1L, 3L)) - (-1.0 / 3.0)) < 1e-12)
  }

  test("fingerprint: deterministic, content-sensitive") {
    val fp1 = TextOps.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = TextOps.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 === fp2)
    assert(TextOps.fingerprint64("hash join") !== TextOps.fingerprint64("hash joins"))
  }

  test("codegen Fingerprint64 expression == typed mapPartitions == scalar") {
    val exprFp = TextOps.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val typedFp = TextOps.fingerprintTyped(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exprFp === typedFp)
    // scalar spot check through the SQL surface (incl. unicode + null)
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT fingerprint64('hash join'), fingerprint64('键值'), fingerprint64(NULL)").head()
    assert(row.getLong(0) === TextOps.fingerprint64("hash join"))
    assert(row.getLong(1) === TextOps.fingerprint64("键值"))
    assert(row.isNullAt(2))
    // the expression path must stay inside codegen: no object-mode operators
    val plan = TextOps.fingerprint(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    // same for the simhash expression; value parity vs the scalar contract
    val shPlan = Dedup.simhash(docs).queryExecution.executedPlan.toString
    assert(!shPlan.contains("DeserializeToObject"), shPlan)
    val viaExpr = Dedup.simhash(docs.limit(20)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScalar = docs.limit(20).collect()
      .map(r => r.getLong(0) -> Dedup.simhash64(r.getString(1))).toMap
    assert(viaExpr === viaScalar)
  }

  test("gopher rules: per-rule semantics on crafted docs") {
    import spark.implicits._
    val fifty = (1 to 48).map(_ => "word").mkString(" ") + " the a"
    val crafted = Seq(
      (1L, fifty), // 50 words, mean len 4ish, 2 stop hits → keep
      (2L, "the a short doc"), // 4 words → word-count fail
      (3L, (1 to 48).map(_ => "word").mkString(" ") + " ## !!"), // no stop hits + symbols
      (4L, (1 to 50).map(_ => "incomprehensibilities").mkString(" ")) // mean len 21 → fail
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(crafted).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(5))).toMap
    assert(got(1L) === ((50, true)))
    assert(got(2L) === ((4, false)))
    assert(got(3L)._2 === false) // 0 stop hits and symbol ratio 2/50 ≤ 0.1 → stop rule fails it
    assert(got(4L)._2 === false)
    // full-corpus run: both keep outcomes occur (the band discriminates)
    val keeps = TextOps.gopherRules(docs).groupBy("keep").count().collect()
    assert(keeps.length === 2, keeps.mkString(","))
  }

  test("repetition stats: sorted-run fold == brute-force scalar count") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "a b a b a b"), // bigrams: ab ba ab ba ab → top 'a b' freq 3/5
      (2L, "x"), // no bigrams → 0.0
      (3L, "u v w") // all distinct bigrams → 1/2
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(crafted).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 0.6)
    assert(got(2L)._1 === 0.0)
    assert(got(3L)._1 === 0.5)
    // scalar brute force over the real corpus
    val scalar = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ")
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val top = if (bgs.isEmpty) 0.0
        else BigDecimal(bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getLong(0) -> top
    }.toMap
    val engine = TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(engine === scalar)
  }

  test("IVF multi-probe: nProbe=2 recall ≥ nProbe=1, ranks stay dense") {
    val brute = Similarity.bruteForceTopK(embeddings, nQueries = 10, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val rows = Similarity.ivfTopK(embeddings, nQueries = 10, k = 3, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect rows).size.toDouble / brute.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2)
    info(f"IVF recall@3: nProbe=1 $r1%.2f, nProbe=2 $r2%.2f")
    assert(r2 >= r1, f"probing MORE lists lost recall: $r2%.2f < $r1%.2f")
  }

  test("redact: emails and phone-shaped runs become typed placeholders") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact jane.doe+x@sub.example.org or call +1 (555) 123-4567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.co and digits 12345678"))
      .toDF("doc_id", "text")
    val got = TextOps.redact(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "contact <EMAIL> or call <PHONE> now")
    assert(got(2L) === "no pii here at all")
    assert(got(3L) === "two mails <EMAIL> <EMAIL> and digits <PHONE>")
  }

  test("chunk: overlap coverage reconstructs the doc; count formula holds") {
    import spark.implicits._
    // lengths straddling every boundary case of size=200/overlap=50
    val docs = Seq(1, 150, 200, 201, 250, 499, 700)
      .map(n => (n.toLong, "abcdefghij" * ((n + 9) / 10) take n))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunk(docs, size = 200, overlap = 50).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((n, cs) <- chunks.map { case (k, v) => k.toInt -> v }) {
      // expected count: one chunk per start in 1, 151, 301, … ≤ max(n-50, 1)
      val expected = (1 to math.max(n - 50, 1) by 150).size
      assert(cs.length === expected, s"n=$n")
      // concatenating chunk 0 + each later chunk's post-overlap tail
      // rebuilds the document exactly
      val rebuilt = cs.head._3 + cs.tail.map(_._3.drop(50)).mkString
      assert(rebuilt === ("abcdefghij" * ((n + 9) / 10) take n), s"n=$n")
      // every chunk except possibly the last is exactly `size` long — and
      // consecutive chunks overlap by exactly 50 chars
      cs.init.foreach(c => assert(c._3.length === 200, s"n=$n"))
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._3.takeRight(50) === b._3.take(50), s"n=$n")
        case _ =>
      }
    }
    // empty docs emit nothing
    assert(TextOps.chunk(Seq((9L, "")).toDF("doc_id", "text")).count() === 0)
  }

  test("quality score bounded in [0,1]") {
    val q = TextOps.qualityScore(docs).agg(min("quality"), max("quality")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("quality score: exact .xxxx5 boundary rounds HALF-UP (the round-5 " +
      "cross-engine divergence case, pinned)") {
    import spark.implicits._
    // 16 tokens, 11 distinct, 2 stopword hits →
    // numer = 4·16·16 + 300·11 + 300·(16−2) = 8524; denom = 16000
    // quality = 8524/16000 = 0.53275 EXACTLY — the boundary where float
    // round() in the two engines disagreed; the exact-BIGINT half-up
    // contract pins 0.5328 (and the oracle's integer `//` form matches)
    val text = ("the a " + (1 to 9).map(i => s"x$i").mkString(" ")
      + " x1 x1 x1 x1 x1")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val q = TextOps.qualityScore(d).head().getDouble(1)
    assert(q === 0.5328, s"got $q, want half-up 0.5328 from exact 0.53275")
  }

  test("multimodal: REAL ImageIO round-trip — decoded dims/colors == generation formulas") {
    val media = Multimodal.mediaFromDocuments(docs.limit(60))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { f =>
      val id = f.url.stripPrefix("doc://").toLong
      val (r, g, b) = Multimodal.imgColor(id)
      assert(f.width === Multimodal.imgWidth(id), f.url)
      assert(f.height === Multimodal.imgHeight(id), f.url)
      assert((f.mean_r, f.mean_g, f.mean_b) === ((r, g, b)), f.url)
    }
    // non-image kinds: stub dims, means marked -1
    feats.filter(_.kind != "image").foreach { f =>
      assert(f.mean_r === -1 && f.mean_g === -1 && f.mean_b === -1)
    }
    // deterministic across runs
    val f2 = Multimodal.extractFeatures(media).collect().map(f => f.url -> f.checksum).toMap
    assert(feats.map(f => f.url -> f.checksum).toMap === f2)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    val frames = Multimodal.sampleFrames(media, stride = 256).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.url).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      fs.foreach(f => assert(f.frame_bytes.length <= 64))
    }
  }

  test("multimodal: resize decodes, resamples and re-encodes; solid stays solid") {
    val media = Multimodal.mediaFromDocuments(docs.limit(60))
    val r1 = Multimodal.resizeImages(media, w = 16, h = 16).collect()
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.width === 16 && r.height === 16)
      val id = r.url.stripPrefix("doc://").toLong
      assert((r.mean_r, r.mean_g, r.mean_b) === Multimodal.imgColor(id), r.url)
      // the re-encoded payload must itself decode back to 16×16
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.resized_bytes))
      assert(img.getWidth === 16 && img.getHeight === 16)
    }
    val r2 = Multimodal.resizeImages(media, w = 16, h = 16).collect()
    assert(r1.map(r => r.url -> r.resized_bytes.toSeq).toMap ===
      r2.map(r => r.url -> r.resized_bytes.toSeq).toMap)
  }

  test("collocations: hand-computed PMI; minCount floors the long tail") {
    import spark.implicits._
    val hand = Seq(
      (1L, "new york is big"),
      (2L, "new york city"))
      .toDF("doc_id", "text")
    // N_t = 7 tokens, N_b = 5 bigrams; only (new, york) reaches count 2:
    // pmi = ln((2/5) / ((2/7)·(2/7))) = ln(4.9)
    val got = TextOps.collocations(hand, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = BigDecimal(math.log(4.9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(("new", "york", 2L, want)))
    // minCount = 1 keeps every DISTINCT bigram, singletons included
    assert(TextOps.collocations(hand, minCount = 1).count() === 4)
  }

  test("tokenEntropy: closed-form cases and scalar recompute on real docs") {
    import spark.implicits._
    val hand = Seq(
      (1L, "a a b b"),   // H = ln4 − (2ln2 + 2ln2)/4 = ln2
      (2L, "x"),         // single token → 0
      (3L, "a b c"),     // all distinct → ln3
      (4L, "a a a a"))   // uniform repeat → 0
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(hand).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map(1L -> r4(math.log(2)), 2L -> 0.0,
      3L -> r4(math.log(3)), 4L -> 0.0))
    // scalar recompute over a real corpus slice
    val real = docs.limit(50)
    val exp = real.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val n = toks.length.toDouble
      val s = toks.groupBy(identity).values
        .map(g => g.length.toDouble * math.log(g.length.toDouble)).sum
      r.getLong(0) -> (math.log(n) - s / n)
    }.toMap
    TextOps.tokenEntropy(real).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - exp(r.getLong(0))) < 1e-3, r.getLong(0))
    }
  }

  test("bpeMerges: Sennrich merge order, ties lexicographic, chained symbols") {
    import spark.implicits._
    // the BPE paper's canonical vocabulary (no end-of-word-marker variant):
    // low:5 lower:2 newest:6 widest:3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = TextOps.bpeMerges(Seq(text).toDF("text"),
        vocabWords = 10, merges = 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: e-s and s-t tie at 9 → lexicographic pick (e,s); r2 chains the
    // merged symbol (es,t); r3: l-o and o-w tie at 7 → (l,o); r4 chains
    assert(got.toSeq === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("bpeMerges: left-to-right non-overlapping application (aaaa -> aa,aa)") {
    import spark.implicits._
    val got = TextOps.bpeMerges(Seq("aaaa aaaa aaaa").toDF("text"),
        vocabWords = 5, merges = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: 3 adjacent (a,a) pairs x freq 3 = 9; after applying, each word is
    // exactly [aa, aa] (the overlapping middle pair must NOT have merged),
    // so r2 finds (aa, aa) with count 3
    assert(got.toSeq === Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("fourth-pass plan contracts: encode map-only, zorder sort-free, align join-bounded, containment hash-keyed") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // BPE ENCODE (merges given): a pure scan→project→generate chain — the
    // corpus must NOT shuffle to be tokenized
    val merges = Seq((1, "a", "b", 3L)).toDF("round", "lhs", "rhs", "pair_count")
    val encPlan = TextOps.bpeEncode(docs, merges)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"bpeEncode must be map-only once merges are literal; got:\n$encPlan")
    // ZORDER layout: no Sort, no Window — bucketing by top bits is one agg
    val zPlan = graft.ops.ZOrder.layoutStats(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .queryExecution.executedPlan.toString
    assert(!zPlan.contains("Window") && !zPlan.contains("Sort "),
      s"zorder layout must not sort or window; got:\n$zPlan")
    // FUZZY ALIGN: posting-list equi-joins only — never a cartesian/NLJ
    val labels = graft.dict.DictBuild.labelRows(
        graft.fixture.OntologyFixture.conceptsDf(spark))
      .select(graft.dict.DictBuild.normalizeTerm(col("label")).as("term"),
        col("class_iri"), col("ont"))
    val alignPlan = graft.dict.Align.fuzzyAlign(labels)
      .queryExecution.executedPlan.toString
    assert(!alignPlan.contains("CartesianProduct"),
      s"fuzzyAlign must pair only inside posting lists; got:\n$alignPlan")
    // CONTAINMENT: same contract as jaccardPairs — hashed posting keys,
    // no raw-shingle shuffle key
    val contPlan = Dedup.containmentPairs(docs)
      .queryExecution.executedPlan.toString
    assert(contPlan.contains("xxhash64"),
      "containment postings must key on fixed-width hashes")
    assert(!contPlan.contains("hashpartitioning(shingle"),
      "containment must not shuffle raw shingle text")
  }

  test("winnow: scalar winnowing oracle; shared-run guarantee; short docs empty") {
    import spark.implicits._
    def scalarWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val t = text.split(" ")
      val hs = (0 to t.length - k)
        .map(i => TextOps.fingerprint64(t.slice(i, i + k).mkString(" ")))
      if (hs.length < w) Set.empty
      else (0 to hs.length - w).map { i =>
        // rightmost min in hs[i..i+w-1]
        val j = (i until i + w).minBy(j => (hs(j), -j))
        (j + 1, hs(j)) // 1-based pos
      }.toSet
    }
    val a = "the quick brown fox jumps over the lazy dog today again"
    val b = "xx yy quick brown fox jumps over the zz" // shares a 6-token run
    val docs = Seq((1L, a), (2L, b), (3L, "too short")).toDF("doc_id", "text")
    val got = TextOps.winnow(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = got.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(r => (r._2, r._3)).toSet
    }
    assert(byDoc(1L) === scalarWinnow(a, 3, 4))
    assert(byDoc(2L) === scalarWinnow(b, 3, 4))
    assert(!byDoc.contains(3L)) // < w shingles → no fingerprint
    // winnowing guarantee: a shared run of length >= w+k-1 (= 6) tokens
    // must leave at least one shared selected HASH
    val shared = byDoc(1L).map(_._2) & byDoc(2L).map(_._2)
    assert(shared.nonEmpty, "shared 6-token run must share a fingerprint")
    // property: engine == scalar oracle on seeded random docs
    val rnd = new scala.util.Random(31337)
    val vocabW = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val rdocs = (0 until 20).map { i =>
      (100L + i, (0 until 4 + rnd.nextInt(20))
        .map(_ => vocabW(rnd.nextInt(vocabW.size))).mkString(" "))
    }
    val rgot = TextOps.winnow(rdocs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSet }
    rdocs.foreach { case (id, text) =>
      val want = scalarWinnow(text, 3, 4)
      assert(rgot.getOrElse(id, Set.empty) === want, s"doc $id: '$text'")
    }
  }

  test("containmentPairs: asymmetric containment caught where Jaccard misses") {
    import spark.implicits._
    val src = "aa bb cc dd ee ff gg hh ii jj" // 10 tokens → 8 shingles
    val quote = "aa bb cc dd ee ff"           // prefix 6 → 4 shingles, all shared
    val docs = Seq((1L, src), (2L, quote), (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 0.5, 1.0))) // quote fully contained
    // the same pair is INVISIBLE to resemblance dedup: jaccard = 4/12
    assert(Dedup.jaccardPairs(docs).collect().isEmpty)
    // quote synthesis: every companion is fully contained in its source
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.containmentPairs(Dedup.withQuotes(real)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val quotePairs = pairs.filter { case (a, b, _) => b === a + 100000L }
    assert(quotePairs.nonEmpty)
    quotePairs.foreach { case (_, _, cb) => assert(cb === 1.0) }
  }

  test("quantizedTopK: snap error bounded by half a level; high agreement with exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = graft.ops.Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val got = graft.ops.Similarity.quantizedTopK(emb).collect()
    assert(got.map(r => r.getLong(0)).distinct.length === 10)
    assert(got.length === 30)
    // 8-bit snap barely moves cosines: top-3 sets mostly agree with exact
    val gotSets = got.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exactSets = exact.groupBy(_._1._1)
      .map { case (q, m) => q -> m.values.toSet }
    val overlap = gotSets.map { case (q, s) => (s & exactSets(q)).size }.sum
    assert(overlap >= 24, s"quantized top-3 overlap with exact = $overlap/30")
  }

  test("zOrder: Spark expression == scalar interleave; locality holds") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (3L, 0L), (0L, 3L), (65535L, 65535L),
      (12345L, 54321L), (1L, 65534L))
    val got = cases.toDF("x", "y")
      .withColumn("z", expr(graft.ops.ZOrder.sparkZ("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) === graft.ops.ZOrder.zValue(x, y), s"($x,$y)")
    }
    assert(graft.ops.ZOrder.zValue(3, 0) === 5L)   // x rides even bits
    assert(graft.ops.ZOrder.zValue(0, 3) === 10L)  // y rides odd bits
    assert(graft.ops.ZOrder.zValue(65535, 65535) === (1L << 32) - 1)
    // locality: a bucket's rows bound BOTH dims within the bucket's span,
    // and the layout actually splits the data across many buckets
    val stats = graft.ops.ZOrder.layoutStats(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")).collect()
    assert(stats.length > 10, s"expected many buckets, got ${stats.length}")
    stats.foreach { r =>
      val span = 1L << 4 // 16-8 top bits → ≤2^8 z-span → ≤2^4 per dim
      assert(r.getLong(3) - r.getLong(2) < span, "x extent")
      assert(r.getLong(5) - r.getLong(4) < span, "y extent")
    }
  }

  test("bpeEncode: merge order applied, positions 1-based, non-words skipped") {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, s"42 $text")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, vocabWords = 10, merges = 4)
    val got = TextOps.bpeEncode(docs, merges)
      .orderBy("word_pos", "piece_pos").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    // "42" at word_pos 1 is skipped (non [a-z]+); "low" at word_pos 2
    // encodes through merges (e,s)(es,t)(l,o)(lo,w) → ["low"]
    assert(!got.exists(_._1 == 1))
    assert(got.filter(_._1 == 2).map(_._3).toSeq === Seq("low"))
    // "lower" (word_pos 7) → lo+w merged then e,r untouched: low,e,r
    assert(got.filter(_._1 == 7).map(_._3).toSeq === Seq("low", "e", "r"))
    // "newest" (word_pos 9) → n,e,w,est: (e,s) then (es,t) chains
    assert(got.filter(_._1 == 9).map(_._3).toSeq === Seq("n", "e", "w", "est"))
    // reconstruction invariant: concatenated pieces == the original word
    val byWord = got.groupBy(_._1).values
    byWord.foreach { ps =>
      val word = ps.sortBy(_._2).map(_._3).mkString
      assert(word.matches("^[a-z]+$"))
    }
  }

  test("negatives: deterministic hash corruption, self/true filtered, <= k") {
    import spark.implicits._
    val pos = Seq(
      ("d1", "hasAnnotation", "C1"), ("d1", "hasAnnotation", "C2"),
      ("d2", "hasAnnotation", "C2"), ("d2", "hasAnnotation", "C3"),
      ("d3", "hasAnnotation", "C4")).toDF("subj", "pred", "obj")
    def run() = Relations.negatives(pos, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4)))
    val got = run()
    assert(got.toSet === run().toSet) // pure function of the input
    val posSet = Set(("d1", "C1"), ("d1", "C2"), ("d2", "C2"), ("d2", "C3"),
      ("d3", "C4"))
    got.foreach { case (s, _, o, slot, neg) =>
      assert(neg !== o, s"self-corruption survived: $s $o")
      assert(!posSet((s, neg)), s"true triple survived as negative: $s $neg")
      assert(slot === 0 || slot === 1)
      // the corruption index is exactly the portable 60-bit hash mod pool
      val eid = (Sketch.hash60Scalar(s"$s|hasAnnotation|$o|$slot") % 4).toInt
      assert(neg === Seq("C1", "C2", "C3", "C4")(eid))
    }
    // <= k negatives per positive, and at least one survives on this data
    val perPos = got.groupBy(t => (t._1, t._3)).view.mapValues(_.length)
    assert(perPos.values.forall(_ <= 2) && got.nonEmpty)
  }

  test("negativesTyped: every corruption shares the true object's type; " +
       "single-object types yield none; min-type policy") {
    import spark.implicits._
    val pos = Seq(
      ("d1", "p", "C1"), ("d1", "p", "C2"), ("d2", "p", "C2"),
      ("d2", "p", "C3"), ("d3", "p", "C4"), ("d4", "p", "C5")
    ).toDF("subj", "pred", "obj")
    // C1–C3 share type TA (C2 also TB — min picks TA); C4 alone in TC;
    // C5 alone in TD
    val types = Seq(("C1", "TA"), ("C2", "TB"), ("C2", "TA"), ("C3", "TA"),
      ("C4", "TC"), ("C5", "TD")).toDF("obj", "tui")
    val typeOf = Map("C1" -> "TA", "C2" -> "TA", "C3" -> "TA",
      "C4" -> "TC", "C5" -> "TD")
    val got = Relations.negativesTyped(pos, types, k = 2).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4)))
    assert(got.nonEmpty)
    got.foreach { case (s, o, neg) =>
      assert(typeOf(neg) === typeOf(o),
        s"cross-type corruption survived: $o → $neg")
      assert(neg !== o)
    }
    // the singleton-type positives (C4, C5) can only self-corrupt → none
    assert(!got.exists(t => t._2 == "C4" || t._2 == "C5"))
  }

  test("acronyms: initials must spell the abbreviation; counts are per-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "we ran merge sort (MS) twice"),
      (2L, "a merge sort (MS) baseline"),
      (3L, "alpha beta (XY) mismatch"),          // initials AB != XY
      (4L, "hash join (HJ) and merge sort (MS)") // two pairs, one doc
    ).toDF("doc_id", "text")
    val got = TextOps.acronyms(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("MS", "merge sort") -> 3L,
      ("HJ", "hash join") -> 1L))
  }

  test("rake: islands, deg/freq scores, phrase sums, rank tie-breaks") {
    import spark.implicits._
    // hand-computed: deep{plens 2,3,1}->2.0, learning{2,3}->2.5, fast{3}->3
    val d = Seq((1L, "deep learning the fast deep learning a deep"))
      .toDF("doc_id", "text")
    val got = TextOps.rake(d).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toList.sorted
    assert(got === List(
      (1, "fast deep learning", 7.5),
      (2, "deep learning", 4.5),
      (3, "deep", 2.0)))
  }

  test("termCandidates: support floor, stopword filter, dict anti-join") {
    import spark.implicits._
    val d = Seq(
      (1L, "big data fast sort"),
      (2L, "big data fast sort"),
      (3L, "the data big data")).toDF("doc_id", "text")
    val dict = Seq("BIG DATA").toDF("term") // already a dictionary term
    val got = graft.dict.DictBuild.termCandidates(d, dict, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // "the data" dies on the stopword, "data big" on support, "big data"
    // on the anti-join
    assert(got === Set(("DATA FAST", 2L, 2L), ("FAST SORT", 2L, 2L)))
  }

  test("withPronouns: every Nth token followed by 'it', offsets intact") {
    import spark.implicits._
    val d = Seq((7L, "a b c d e f g h i j k l m")).toDF("doc_id", "text")
    val got = Relations.withPronouns(d).collect().head
    assert(got.getString(0) === "doc://7")
    assert(got.getString(1) === "a b c d e f it g h i j k l it m")
  }

  test("tokenDrift: half-token+marker synthesis, L1 ordering, JSD bounds") {
    import spark.implicits._
    // doc 0 re-crawls truncated to [a, b] + the marker; doc 1 unchanged.
    // v1: a:2 b:2 c:1 d:1 (n=6); v2: a:2 b:2 marker:1 (n=5)
    val d = Seq((0L, "a b c d"), (1L, "a b")).toDF("doc_id", "text")
    val got = TextOps.tokenDrift(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))
    // drift: marker 0.2 > c = d = 1/6 (token tie-break) > a = b = 1/15
    assert(got.map(_._1).toList ===
      List(TextOps.DriftMarker, "c", "d", "a", "b"))
    assert(got.head._2 === 0L && got.head._3 === 1L) // marker: v2-only
    assert(got(1)._4 === 0.166667 && got(3)._4 === 0.066667)
    // one corpus-level JSD on every row, inside (0, ln 2)
    val jsds = got.map(_._5).distinct
    assert(jsds.length === 1 && jsds.head > 0 && jsds.head < 0.6932)
  }

  test("schemaInduction: modal domain/range, tie-breaks, multi-TUI shares") {
    import spark.implicits._
    val facts = Seq(
      ("s1", "causes", "o1"), ("s2", "causes", "o2"),
      ("s1", "causes", "o1"), // duplicate fact: distinct drops it
      ("s1", "treats", "o2")).toDF("subj_iri", "rel", "obj_iri")
    val tuis = Seq(("s1", "T1"), ("s2", "T2"),
      ("o1", "T9"), ("o2", "T9"), ("o2", "T5")).toDF("class_iri", "tui")
    val got = Relations.schemaInduction(facts, tuis).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4), r.getDouble(5))).toSet
    assert(got === Set(
      // causes: domain T1/T2 tie at 1 -> T1; range T9:2 of 3 observations
      ("causes", 2L, "T1", 0.5, "T9", 0.666667),
      // treats: range T9/T5 tie at 1 -> T5 (lexicographic)
      ("treats", 1L, "T1", 1.0, "T5", 0.5)))
  }

  test("corefMentions: nearest antecedent, ambiguity fanout, orphan pronouns drop") {
    import spark.implicits._
    // hand-laid char offsets on the single-space stream:
    //   table(1-5) scan(7-10) x(12) it(14-15) big(17-19) data(21-24)
    //   it(26-27) it(29-30)
    val pages = Seq(
      ("u1", "table scan x it big data it it"),
      ("u2", "it table scan")) // pronoun BEFORE any mention: dropped
    .toDF("url", "text")
    val matches = Seq(
      ("u1", 10L, "A"), ("u1", 10L, "B"), // ambiguous span: both link
      ("u1", 24L, "C"),
      ("u2", 13L, "D")) // ends after u2's pronoun
      .toDF("url", "to", "class_iri")
    val got = Relations.corefMentions(pages, matches).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("u1", Relations.CorefPred, "A", 1L), // pronoun at token 4
      ("u1", Relations.CorefPred, "B", 1L), // same span, second class
      ("u1", Relations.CorefPred, "C", 2L))) // tokens 7 and 8, both -> C
  }
}
