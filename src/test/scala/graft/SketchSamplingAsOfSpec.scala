package graft

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{AsOf, Sampling, Sketch, TextOps}

/** KMV distinct sketch, consistent sampling, and as-of joins: property
  * oracles (declarative recomputation, scalar estimator, crafted temporal
  * cases) plus the plan shapes the 100-TB arguments rest on. */
class SketchSamplingAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp =
    Timestamp.from(Instant.parse(s))

  // ---- KMV sketch -------------------------------------------------------

  test("KMV aggregator == declarative bottom-k recomputation (seeded data)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(_ => (s"g${rnd.nextInt(3)}", s"u${rnd.nextInt(900)}"))
    val df = rows.toDF("grp", "v")
    val got = Sketch.kmvDistinct(df, "grp", "v", k = 64).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // declarative twin: k smallest DISTINCT hashes per group via a window
    val kth = df.select(col("grp"), Sketch.hash60(col("v")).as("h")).distinct()
      .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("h")))
      .filter(col("rn") <= 64)
      .groupBy("grp").agg(count(lit(1)).as("n"), max("h").as("kth"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = df.groupBy("grp").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === kth.keySet)
    for ((g, (est, ex)) <- got) {
      val (n, k64) = kth(g)
      val want =
        if (n < 64) n.toDouble
        else math.rint(63.0 * math.pow(2, 60) / k64.toDouble * 1e4) / 1e4
      assert(est === want, g)
      assert(ex === exact(g), g)
      // the whole point: the estimate is close to the truth
      assert(math.abs(est - ex) / ex <= 0.5, s"$g: est=$est exact=$ex")
    }
  }

  test("HLL: register recompute via scalar ranks, estimate near truth, " +
       "partitioning-invariant, linear-counting branch on tiny groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map(_ => (s"g${rnd.nextInt(3)}", s"u${rnd.nextInt(900)}")) ++
      (0 until 40).map(i => ("tiny", s"t${i % 7}")) // 7 distinct → linear counting
    val df = rows.toDF("grp", "v")
    val got = Sketch.hllDistinct(df, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // scalar twin: registers from hash60Scalar on the driver
    val regs = scala.collection.mutable.Map.empty[(String, Long), Int]
    for ((g, v) <- rows.distinct) {
      val h = Sketch.hash60Scalar(v)
      val (b, rem) = (h % 64, h / 64)
      val rank = if (rem == 0) 55 else 54 - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      regs((g, b)) = math.max(regs.getOrElse((g, b), 0), rank)
    }
    for ((g, (est, ex)) <- got) {
      val present = regs.keys.filter(_._1 == g).toSeq
      val sInt = present.map(k => 1L << (55 - regs(k))).sum +
        (64L - present.size) * (1L << 55)
      val raw = Sketch.HllRawNum / sInt.toDouble
      val v0 = 64 - present.size
      val want = if (raw <= 160.0 && v0 > 0) 64.0 * math.log(64.0 / v0) else raw
      assert(math.abs(est - math.rint(want * 1e4) / 1e4) < 1e-9, s"$g: $est vs $want")
      // the whole point: close to truth (1.04/sqrt(64) ≈ 13% std error)
      assert(math.abs(est - ex) / ex <= 0.5, s"$g: est=$est exact=$ex")
    }
    // tiny group exercised the linear-counting branch
    assert(got("tiny")._2 === 7L)
    // merge = elementwise max ⇒ partitioning-invariant
    val one = Sketch.hllDistinct(df.repartition(1), "grp", "v").collect()
    val many = Sketch.hllDistinct(df.repartition(13), "grp", "v").collect()
    assert(one.map(_.toSeq).toSet === many.map(_.toSeq).toSet)
  }

  test("KMV is partitioning-invariant (merge = set union)") {
    import spark.implicits._
    val df = (0 until 2000).map(i => ("g", s"v${i % 333}")).toDF("grp", "v")
    val one = Sketch.kmvDistinct(df.repartition(1), "grp", "v").collect()
    val many = Sketch.kmvDistinct(df.repartition(13), "grp", "v").collect()
    assert(one.map(_.toSeq).toSet === many.map(_.toSeq).toSet)
  }

  test("KMV exact branch below k; estimator formula at k") {
    assert(Sketch.estimate(Array(5L, 9L, 12L), k = 64) === 3.0)
    val full = (1L to 64L).map(_ * 1000L).toArray
    assert(Sketch.estimate(full, 64) === 63.0 * math.pow(2, 60) / 64000.0)
  }

  test("count-min never under-counts; exact when the matrix is collision-free") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vals = (0 until 2000).map(_ => s"tok${rnd.nextInt(50)}").toDF("v")
    val exact = vals.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tight matrix (w=64): collisions likely — estimates may only inflate
    val est64 = graft.ops.Sketch.countMinEstimate(
        graft.ops.Sketch.countMin(vals, "v", w = 64), vals, "v", w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est64.keySet === exact.keySet)
    est64.foreach { case (k, e) => assert(e >= exact(k), s"$k under-counted") }
    // wide matrix (w=8192 ≫ 50 distinct): whp no row collides → exact
    val sketchWide = graft.ops.Sketch.countMin(vals, "v", w = 8192)
    val estWide = graft.ops.Sketch.countMinEstimate(
        sketchWide, vals, "v", w = 8192)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estWide === exact)
    // a value ABSENT from the build stream: any untouched bucket ⇒ 0 (the
    // left-join/coalesce contract — an inner join would drop or inflate it)
    val ghost = graft.ops.Sketch.countMinEstimate(
        sketchWide, Seq("never-seen-value").toDF("v"), "v", w = 8192)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ghost === Map("never-seen-value" -> 0L))
  }

  test("bm25 == scalar reference; docs without query terms are absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark"),     // tf(spark)=2, tf(join)=1, len 3
      (2L, "data data data data"),  // tf(data)=4, len 4
      (3L, "other words only here") // no query term → no row
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(docs, Seq("spark", "join", "data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(3L))
    val n = 3.0; val avg = (3.0 + 4.0 + 4.0) / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, len: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avg))
    val exp1 = idf(1) * w(2, 3) + idf(1) * w(1, 3)
    val exp2 = idf(1) * w(4, 4)
    assert(math.abs(got(1L) - exp1) < 1e-6, s"${got(1L)} vs $exp1")
    assert(math.abs(got(2L) - exp2) < 1e-6, s"${got(2L)} vs $exp2")
  }

  test("qlm == scalar reference; docs WITHOUT query terms still score via the prior") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark"),     // tf(spark)=2, tf(join)=1, len 3
      (2L, "data data data data"),  // tf(data)=4, len 4
      (3L, "other words only here") // no query term → prior-only row
    ).toDF("doc_id", "text")
    val got = TextOps.qlm(docs, Seq("spark", "join", "data"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the defining QL property bm25 lacks: every doc scores
    assert(got.keySet === Set(1L, 2L, 3L))
    val mu = 300.0; val nToks = 11.0
    val cf = Map("spark" -> 2.0, "join" -> 1.0, "data" -> 4.0)
    def score(tfs: Map[String, Double], len: Double) =
      cf.keys.map { t =>
        math.log((tfs.getOrElse(t, 0.0) + mu * cf(t) / nToks) / (len + mu))
      }.sum
    val exp = Map(
      1L -> score(Map("spark" -> 2.0, "join" -> 1.0), 3.0),
      2L -> score(Map("data" -> 4.0), 4.0),
      3L -> score(Map.empty, 4.0))
    exp.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-5, s"doc $id: ${got(id)} vs $e") }
    // prior-only doc ranks strictly below any doc holding a query term
    assert(got(3L) < got(1L) && got(3L) < got(2L))
  }

  test("rm3Weights: hand-checked rank-weighted relevance model; " +
       "rm3 with no expansion == qlm") {
    import spark.implicits._
    val docs = Seq(
      (1L, "q x x"),   // holds q; len 3
      (2L, "q y"),     // holds q; len 2 → ranks FIRST (smaller prior denom)
      (3L, "z z z")    // no q → prior-only, outside the top-2 feedback set
    ).toDF("doc_id", "text")
    val w = TextOps.rm3Weights(docs, Seq("q"), fbDocs = 2, fbTerms = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fb = {d2 rank 1 (wd 1), d1 rank 2 (wd 0.5)}; q itself excluded:
    // w(y) = 1·(1/2) = 0.5, w(x) = 0.5·(2/3) = 0.333333 (ROUND 6)
    assert(w === Map("y" -> 0.5, "x" -> 0.333333))
    // fbTerms = 0 → empty expansion → the reranker IS first-pass QL
    val noExp = TextOps.rm3(docs, Seq("q"), fbTerms = 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ql = TextOps.qlm(docs, Seq("q")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(noExp === ql)
    // with expansion, every feedback term pulls its holder up: d1 (two
    // x's) must still rank among the top 2 and all 3 docs still score
    val reranked = TextOps.rm3(docs, Seq("q"), fbDocs = 2, fbTerms = 2)
      .collect().map(_.getLong(0))
    assert(reranked.length === 3 && reranked.take(2).contains(1L))
  }

  test("hllOverlap: identical groups read identical estimates, partial " +
       "overlap tracks exact, disjoint pairs coalesce to 0") {
    import spark.implicits._
    val rows =
      (1 to 100).map(i => ("A", i)) ++
        (51 to 150).map(i => ("B", i)) ++   // |A∩B| = 50
        (1 to 100).map(i => ("C", i)) ++    // C == A
        (1000 to 1099).map(i => ("D", i))   // disjoint from everything
    val got = graft.ops.Sketch
      .hllOverlap(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    // identical sets → identical registers: union == single estimates and
    // the inclusion–exclusion overlap equals them exactly
    val (ea, ec, eu, eo, exact) = got(("A", "C"))
    assert(ea === ec && ea === eu && ea === eo && exact === 100L)
    // partial overlap: exact 50; the m=64 sketch estimate lands in a wide
    // but meaningful band (relative standard error ~1.04/√64 ≈ 13 %)
    val ab = got(("A", "B"))
    assert(ab._5 === 50L && ab._4 > 0.0 && ab._4 < 150.0)
    // disjoint pair still emits a row, exact coalesces to 0
    assert(got(("A", "D"))._5 === 0L)
    assert(got.size === 6)
  }

  test("rrfFuse: hand-checked union fusion — absent docs contribute " +
       "nothing, ranks come from (score desc, doc_id)") {
    import spark.implicits._
    val run1 = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("doc_id", "score")
    val run2 = Seq((2L, 5.0)).toDF("doc_id", "score")
    val got = TextOps.rrfFuse(Seq(run1, run2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // d2: rank 2 in run1 + rank 1 in run2; d1: rank 1 in run1; d3: rank 3
    assert(got === Array(
      (2L, 2L, r6(1.0 / 62 + 1.0 / 61)),
      (1L, 1L, r6(1.0 / 61)),
      (3L, 1L, r6(1.0 / 63))))
  }

  test("mixSample: Hamilton apportionment hand values, remainder " +
       "tie-break, and the without-replacement source cap") {
    import spark.implicits._
    // token sums 16/4/4 → sqrt weights 4/2/2 → 0.5/0.25/0.25; N = 10 →
    // floors 5/2/2, one leftover seat → remainder tie (0.5, 0.5) breaks
    // to the smaller source name: quotas A=5, B=3, C=2. B only HAS 2 docs
    // → capped; A and C fill their quotas exactly.
    val docs =
      (0 until 8).map(i => (i.toLong, "t t", "A")) ++
        Seq((100L, "t t", "B"), (101L, "t t", "B")) ++
        (200 until 204).map(i => (i.toLong, "t", "C"))
    val got = TextOps.mixSample(docs.toDF("doc_id", "text", "source"),
        nDocs = 10).collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(got === Map("A" -> 5, "B" -> 2, "C" -> 2))
  }

  test("amsF2: single-key stream is estimated EXACTLY; partitioning-" +
       "invariant; even rows rejected") {
    import spark.implicits._
    // one key repeated n times: every line has a single ±n counter, so
    // every line estimate is n² — the median equals the exact F2
    val n = 37L
    val one = Seq.fill(n.toInt)("k").toDF("key")
    val r = graft.ops.Sketch.amsF2(one, "key").collect().head
    assert(r.getLong(0) === n * n && r.getLong(1) === n * n &&
      r.getDouble(2) === 0.0)
    // signed counter sums are commutative — any partitioning gives the
    // same sketch
    val mixed = (Seq.fill(20)("a") ++ Seq.fill(5)("b") ++ Seq("c"))
      .toDF("key")
    val s1 = graft.ops.Sketch.amsF2(mixed, "key").collect().head
    val s2 = graft.ops.Sketch.amsF2(mixed.repartition(7), "key")
      .collect().head
    assert(s1.getLong(0) === 426L) // 400 + 25 + 1
    assert(s1.getLong(1) === s2.getLong(1) && s1.getDouble(2) === s2.getDouble(2))
    intercept[IllegalArgumentException] {
      graft.ops.Sketch.amsF2(mixed, "key", rows = 4)
    }
  }

  test("heapsLaw: two-bucket hand values; two-point OLS slope is the " +
       "exact log-log secant") {
    import spark.implicits._
    val docs = Seq((0L, "a b a"), (1L, "a c b c")).toDF("doc_id", "text")
    val got = TextOps.heapsLaw(docs, buckets = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // bucket 0: 3 tokens, bigram vocab {a b, b a}; bucket 1: +4 tokens,
    // +{a c, c b, b c} → cumulative (3, 2) then (7, 5)
    val beta = math.rint(math.log(5.0 / 2) / math.log(7.0 / 3) * 1e6) / 1e6
    assert(got === Map(0L -> ((3L, 2L, beta)), 1L -> ((7L, 5L, beta))))
  }

  test("approx_percentile stays within its accuracy bound of exact percentile") {
    // the 100-TB ungrouped-quantile path: approx_percentile with the
    // default accuracy; bound its rank error vs the exact sort on a
    // deterministic skewed distribution
    import spark.implicits._
    val xs = (1 to 20000).map(i => (i.toLong * i)).toDF("x")
    val r = xs.agg(
      expr("percentile(x, 0.9)").as("exact"),
      expr("approx_percentile(x, 0.9, 10000)").as("approx")).collect()(0)
    val (ex, ap) = (r.getDouble(0), r.getLong(1).toDouble)
    // rank-space error: |rank(approx) - 0.9*n| <= n/accuracy * some slack
    val rank = math.sqrt(ap) // inverse of i² on this data
    assert(math.abs(rank - 0.9 * 20000) <= 20000.0 / 10000 * 10 + 1,
      s"exact=$ex approx=$ap rank=$rank")
  }

  // ---- consistent sampling ---------------------------------------------

  test("consistent samples nest: pct=10 ⊆ pct=20 ⊆ pct=100") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s10 = Sampling.consistentSample(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s20 = Sampling.consistentSample(docs, "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = Sampling.consistentSample(docs, "doc_id", 100).count()
    assert(s10.subsetOf(s20))
    assert(all === docs.count())
    // rates land near nominal (hash uniformity on 500 ids)
    assert(math.abs(s10.size / 500.0 - 0.10) < 0.05)
    assert(math.abs(s20.size / 500.0 - 0.20) < 0.06)
  }

  test("stratified sampling applies per-stratum rates off the same hash") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 10), defaultPct = 50)
    // every kept row individually satisfies its stratum's bucket predicate,
    // and the kept set per stratum equals that stratum's consistent sample
    val en = Sampling.consistentSample(docs.filter(col("lang") === "en"), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rest = Sampling.consistentSample(docs.filter(col("lang") =!= "en"), "doc_id", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet === (en ++ rest))
  }

  test("split: disjoint, exhaustive, stable under corpus growth") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = Sampling.split(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.size === docs.count()) // every doc gets exactly one split
    assert(s1.values.toSet === Set("train", "val", "test"))
    val frac = s1.values.groupBy(identity).view
      .mapValues(_.size.toDouble / s1.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06)
    assert(math.abs(frac("val") - 0.1) < 0.05)
    // growth stability: splitting HALF the corpus assigns the same splits
    val s2 = Sampling.split(docs.filter(col("doc_id") < 250), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    s2.foreach { case (id, sp) => assert(s1(id) === sp, id) }
  }

  test("vocab: frequency-descending dense ids with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "b a a c b a"), (2L, "c d b")).toDF("doc_id", "text")
    val got = TextOps.vocab(docs, topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // freqs: a=3, b=3, c=2, d=1 → ties break by token string
    assert(got.sortBy(_._3).toSeq === Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("sampling is map-only: no Exchange in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Sampling.stratifiedSample(docs, "doc_id", "lang",
      rates = Map("en" -> 10), defaultPct = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- bucketized range join -------------------------------------------

  test("pairsWithinGap == brute-force inequality join on seeded data") {
    import spark.implicits._
    import graft.ops.RangeJoin
    val rnd = new scala.util.Random(13)
    val rows = (0 until 400).map(i =>
      (i.toLong, s"u${rnd.nextInt(8)}", rnd.nextInt(5000).toLong))
    val df = rows.toDF("event_id", "user_id", "tsec")
      .withColumn("ts", col("tsec").cast("timestamp")).drop("tsec")
    val got = RangeJoin.pairsWithinGap(df, "user_id", "event_id", "ts", 300)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = (for {
      (ia, ka, ta) <- rows; (ib, kb, tb) <- rows
      if ka == kb && tb - ta >= 0 && tb - ta <= 300 &&
        (ta < tb || (ta == tb && ia < ib))
    } yield (ka, ia, ib, tb - ta)).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // boundary-straddling pairs (different bins) must be present
    assert(want.exists { case (_, a, b, _) =>
      val ta = rows(a.toInt)._3; val tb = rows(b.toInt)._3
      ta / 300 != tb / 300
    })
  }

  test("pairsWithinGap plan has no nested-loop/cartesian join") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = graft.ops.RangeJoin
      .pairsWithinGap(events, "user_id", "event_id", "ts", 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ---- as-of joins ------------------------------------------------------

  test("withVersionAsOf: boundary, between, and before-first semantics") {
    import spark.implicits._
    val versions = Seq(ts("2024-01-03T00:00:00Z") -> "v1",
      ts("2024-01-10T00:00:00Z") -> "v2")
    val rows = Seq(
      ("before", ts("2024-01-02T23:59:59Z")),
      ("at_v1", ts("2024-01-03T00:00:00Z")),
      ("mid", ts("2024-01-07T12:00:00Z")),
      ("at_v2", ts("2024-01-10T00:00:00Z")),
      ("after", ts("2024-06-01T00:00:00Z"))).toDF("name", "t")
    val got = AsOf.withVersionAsOf(rows, "t", versions).collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(got === Map("before" -> None, "at_v1" -> Some("v1"),
      "mid" -> Some("v1"), "at_v2" -> Some("v2"), "after" -> Some("v2")))
  }

  test("withVersionAsOf keeps sub-second boundaries exact (microsecond compare)") {
    import spark.implicits._
    val versions = Seq(
      Timestamp.from(Instant.parse("2024-01-08T00:00:00.700Z")) -> "v2",
      ts("2024-01-01T00:00:00Z") -> "v1")
    val rows = Seq(
      ("just_before", Timestamp.from(Instant.parse("2024-01-08T00:00:00.699999Z"))),
      ("at_boundary", Timestamp.from(Instant.parse("2024-01-08T00:00:00.700Z"))))
      .toDF("name", "t")
    val got = AsOf.withVersionAsOf(rows, "t", versions).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got === Map("just_before" -> "v1", "at_boundary" -> "v2"))
  }

  test("withVersionAsOf rejects tied effective timestamps") {
    import spark.implicits._
    val dup = Seq(ts("2024-01-03T00:00:00Z") -> "a", ts("2024-01-03T00:00:00Z") -> "b")
    val e = intercept[IllegalArgumentException] {
      AsOf.withVersionAsOf(Seq(("x", ts("2024-01-04T00:00:00Z"))).toDF("n", "t"), "t", dup)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("withVersionAsOf is map-only: no Exchange, no Join in the plan") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = AsOf.withVersionAsOf(events, "ts", SparkEntry.DictSnapshots)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("lastPrecedingWhere: strict precedence, NULL when none, id tie-break") {
    import spark.implicits._
    val events = Seq(
      (1L, 100L, "u", "click"),
      (2L, 100L, "u", "view"),  // same ts as the click: id order ⇒ click precedes
      (3L, 200L, "u", "view"),
      (4L, 300L, "u", "click"),
      (5L, 400L, "u", "view"),
      (6L, 50L, "w", "view"))   // other key, no click ever
      .toDF("event_id", "tsec", "user_id", "event_type")
      .withColumn("t", col("tsec").cast("timestamp"))
      .withColumn("is_click", col("event_type") === "click")
    val got = AsOf.lastPrecedingWhere(events, "user_id", "t", "event_id",
        "is_click", "event_id", "prev_click_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(6))).toMap
    assert(got === Map(1L -> None, 2L -> Some(1L), 3L -> Some(1L),
      4L -> Some(1L), 5L -> Some(4L), 6L -> None))
  }

  test("lastPrecedingWhere: exactly one Exchange (the key shuffle), no join") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("is_click", col("event_type") === "click")
    val plan = AsOf.lastPrecedingWhere(events, "user_id", "ts", "event_id",
      "is_click", "event_id", "prev").queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
