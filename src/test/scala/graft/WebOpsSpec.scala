package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.WebOps

/** Web-corpus ops: URL canonicalization unit cases, the synthetic-URL
  * collision structure, canonical-URL dedup accounting, per-domain stats,
  * and C4-style chunk dedup on handcrafted chunk overlaps. */
class WebOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def syntheticDocs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"tok$i text", 10L + i % 7))
      .toDF("doc_id", "text", "n_chars")
  }

  test("canonicalUrl: case fold, www strip, utm drop, param sort, fragment, trailing slash") {
    import spark.implicits._
    val cases = Seq(
      ("https://WWW.Example.COM/path/?utm_campaign=z&b=2&a=1#sec",
       "https://example.com/path?a=1&b=2"),
      ("http://example.org/x", "https://example.org/x"), // scheme normalized
      ("https://example.org/p/1", "https://example.org/p/1"),
      ("https://example.org/?utm_only=1", "https://example.org"),
      ("https://News.Example.com/p/3?ref=x&id=3", "https://news.example.com/p/3?id=3&ref=x"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), WebOps.canonicalUrl(col("url")).as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) === want, in) }
  }

  test("synthetic URLs collide under canonicalization exactly when designed to") {
    // doc 0 (example.org, utm query) and doc 240 (www.example.org, utm
    // query, #frag) differ as raw URLs but share path 0 mod 40 and query
    // class 0 mod 3 → same canonical URL
    val canon = WebOps.canonicalize(syntheticDocs(300)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(canon(0L)._1 !== canon(240L)._1, "raw URLs must differ")
    assert(canon(0L)._2 === canon(240L)._2, "canonical URLs must collide")
    assert(canon(0L)._2 === "https://example.org/p/0?id=0")
  }

  test("urlDedup: counts account for every doc; representative is the min raw URL") {
    val docs = syntheticDocs(600)
    val out = WebOps.urlDedup(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.map(_._2).sum === 600L)
    val canon = WebOps.canonicalize(docs).collect()
      .map(r => (r.getString(2), r.getString(1)))
    val byCanon = canon.groupBy(_._1)
    out.foreach { case (cu, n, keep) =>
      assert(n === byCanon(cu).size.toLong, cu)
      assert(keep === byCanon(cu).map(_._2).min, cu)
    }
  }

  test("domainStats: the 7 raw hosts collapse to 4 canonical domains") {
    val out = WebOps.domainStats(syntheticDocs(140)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet === Set("example.org", "news.example.com",
      "blog.example.net", "shop.example.io"))
    // indices 0,2,4 of 7 → example.org; 1,6 → news; 3 → blog; 5 → shop
    assert(out("example.org") === 60L)
    assert(out("news.example.com") === 40L)
    assert(out("blog.example.net") === 20L)
    assert(out("shop.example.io") === 20L)
  }

  test("chunkDedup: first corpus-wide occurrence survives, docs rebuild in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),  // both chunks first occurrences
      (2L, "a b c x y z"),  // first chunk duplicates doc 1 → only "x y z"
      (3L, "a b c"),        // all chunks duplicate → empty
      (4L, "d e f a b c"),  // both chunks seen (doc 1) → empty
      (5L, "q q q q q q"))  // within-doc duplicate: second chunk dropped
      .toDF("doc_id", "text")
    val got = WebOps.chunkDedup(docs, chunkTokens = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a b c d e f", 2L -> "x y z",
      3L -> "", 4L -> "", 5L -> "q q q"))
  }

  test("chunkDedup: no text rides the chunk-keyed exchanges (hashed keys)") {
    import spark.implicits._
    val docs = (0L to 49L).map(i => (i, s"w$i x$i y$i a b c d e f " * 3))
      .toDF("doc_id", "text")
    val out = WebOps.chunkDedup(docs, chunkTokens = 3)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted explain lists each Exchange's payload as "Input [n]: [...]"
    val blocks = """\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\s*\nArguments: ([^\n]*)""".r
      .findAllMatchIn(plan).toSeq
    assert(blocks.nonEmpty, plan.take(3000))
    blocks.foreach { m =>
      val (payload, args) = (m.group(1), m.group(2))
      assert(!payload.contains("chunk#"),
        s"chunk text in exchange payload: $payload | $args")
      // only the doc_id-keyed rebuild join may carry the doc text
      if (payload.contains("text#"))
        assert(args.contains("doc_id#"),
          s"text in a non-doc-keyed exchange: $payload | $args")
    }
  }

  test("domainQuota: cap enforced per host; selection is hash-deterministic") {
    import org.apache.spark.sql.functions._
    val docs = syntheticDocs(200)
    val got = WebOps.domainQuota(docs, quota = 10)
    // no host above quota, and ties on the hash resolved so reruns agree
    val perHost = got.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost.values.forall(_ <= 10))
    assert(perHost.values.sum < 200) // the cap actually bit
    val again = WebOps.domainQuota(docs, quota = 10).collect()
      .map(_.getLong(0)).sorted
    assert(again.toSeq === got.collect().map(_.getLong(0)).sorted.toSeq)
    // selection = the quota smallest by (hash60(canon_url), doc_id) per host
    val ranked = WebOps.canonicalize(docs)
      .withColumn("host", WebOps.canonicalHost(col("url")))
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    val expect = ranked.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (id, cu, _) =>
        (graft.ops.Sketch.hash60Scalar(cu), id) }.take(10).toSeq
    }.map(_._1).sorted
    assert(again.toSeq === expect)
  }

  test("domainQuotaTwoPhase == domainQuota, incl. a skewed host and forced underflow") {
    // the synthesis sends 3/7 of all docs to canonical host example.org —
    // at 500 docs and quota 7 that host is ~30× over quota (the skew leg)
    val docs = syntheticDocs(500)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val one = asSet(WebOps.domainQuota(docs, quota = 7))
    assert(asSet(WebOps.domainQuotaTwoPhase(docs, quota = 7)) === one)
    // margin ≈ 0 starves the prefilter for every over-quota host → the
    // fallback leg must take over and the result must STILL be exact
    assert(asSet(WebOps.domainQuotaTwoPhase(docs, quota = 7, margin = 1e-9)) === one)
    // quota above every host's count: both return everything
    val all = asSet(WebOps.domainQuota(docs, quota = 1000))
    assert(asSet(WebOps.domainQuotaTwoPhase(docs, quota = 1000)) === all)
  }

  test("urlFilter: blocklisted hosts dropped, others kept; trap regex fires on crafted urls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val kept = WebOps.urlFilter(syntheticDocs(200))
    val hosts = kept.select("host").distinct().collect().map(_.getString(0)).toSet
    assert(WebOps.BlockedHosts.forall(h => !hosts.contains(h)))
    assert(hosts.nonEmpty)
    // expected survivor count by the same congruence arithmetic as the synthesis:
    // hosts 5 (shop.example.io) and 3 (blog.example.net) are blocked
    val expect = (0 until 200).count(i => i % 7 != 5 && i % 7 != 3)
    assert(kept.count() === expect)
    // the pattern leg never fires on synthetic urls — prove it on crafted ones
    val crafted = Seq(
      "https://ok.example/page", "https://ok.example/img/photo.JPG",
      "https://ok.example/file.pdf?dl=1", "https://ok.example/calendar/2024/01",
      "https://ok.example/not-a-trap/jpg").toDF("u")
    val fired = crafted.withColumn("hit", col("u").rlike(WebOps.BlockedUrlRe))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(fired("https://ok.example/page") === false)
    assert(fired("https://ok.example/img/photo.JPG") === true)  // (?i) + $ leg
    assert(fired("https://ok.example/file.pdf?dl=1") === true)  // [?#] leg
    assert(fired("https://ok.example/calendar/2024/01") === true)
    assert(fired("https://ok.example/not-a-trap/jpg") === false) // no dot
  }

  test("crawlMerge: latest capture per canonical URL wins; captures counted") {
    import spark.implicits._
    val snaps = Seq(
      // two raw spellings of the same canonical URL across two snapshots
      (1L, "https://www.a.org/p/1", 1, 100L),
      (2L, "https://A.ORG/p/1", 1, 200L),
      (1L, "https://www.a.org/p/1", 2, 900L), // the winner
      // a URL captured once
      (3L, "https://b.org/x", 1, 50L))
      .toDF("doc_id", "url", "snapshot", "fetch_epoch")
    val got = WebOps.crawlMerge(snaps).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(got === Map(
      "https://a.org/p/1" -> ((3L, 900L, 2, 1L)),
      "https://b.org/x" -> ((1L, 50L, 1, 3L))))
  }

  test("resolveRedirects: chains resolve, terminals absorb, cycles flag looped") {
    import spark.implicits._
    val edges = Seq(
      // a 3-hop chain to a landing page
      ("r3", "r2"), ("r2", "r1"), ("r1", "https://final.org/a"),
      // a 2-cycle, plus a chain feeding into it
      ("c1", "c2"), ("c2", "c1"), ("c3", "c1"),
      // a chain longer than maxHops=4: over budget → looped
      ("l5", "l4"), ("l4", "l3"), ("l3", "l2"), ("l2", "l1"),
      ("l1", "l0"), ("l0", "https://final.org/b"))
      .toDF("src", "dst")
    val got = WebOps.resolveRedirects(edges, maxHops = 4).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got("r3") === (("https://final.org/a", false)))
    assert(got("r2") === (("https://final.org/a", false)))
    // cycle members and feeders end ON a redirect src → looped
    assert(got("c1")._2 && got("c2")._2 && got("c3")._2)
    // l5 needs 6 hops; after 4 it still sits on a redirect src
    assert(got("l5")._2 === true)
    assert(got("l1") === (("https://final.org/b", false)))
    // raising the budget resolves the long chain (doubling: 8 >= 6)
    val more = WebOps.resolveRedirects(edges, maxHops = 8).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(more("l5") === (("https://final.org/b", false)))
  }

  test("boilerplateStrip: host templates vanish, rare lines survive, minDocs guards tiny hosts") {
    import spark.implicits._
    val pages = Seq(
      // host a: 4 pages, nav on all (→ stripped), promo on 2 of 4
      // (= 0.5 ≥ minFrac → stripped), unique content kept
      (1L, "https://a.org/1", "nav\ncontent one\npromo"),
      (2L, "https://a.org/2", "nav\ncontent two\npromo"),
      (3L, "https://a.org/3", "nav\ncontent three"),
      (4L, "https://a.org/4", "nav"),            // fully templated → ''
      // host b: a single page — its lines can't reach minDocs=2
      (5L, "https://b.org/1", "nav\nsolo"))
      .toDF("doc_id", "url", "text")
    val got = WebOps.boilerplateStrip(pages).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "content one", 2L -> "content two", 3L -> "content three",
      4L -> "", 5L -> "nav\nsolo"))
  }

  test("mirrorHosts: containment, minShared floor, hot-hash cap") {
    import spark.implicits._
    val pages = Seq(
      // host a serves 3 texts; host b mirrors 2 of them (and nothing else)
      ("https://a.org/1", "t1"), ("https://a.org/2", "t2"),
      ("https://a.org/3", "t3"),
      ("https://b.org/1", "t1"), ("https://b.org/2", "t2"),
      // host c shares only ONE text with a → below minShared=2, dropped
      ("https://c.org/1", "t1"),
      // a boilerplate text served by MANY hosts: excluded by the hash cap,
      // so it creates no pairs among d0..d9 and adds nothing to a/b
      ("https://a.org/bp", "boiler"), ("https://b.org/bp", "boiler")) ++
      (0 until 10).map(i => (s"https://d$i.org/bp", "boiler"))
    val got = WebOps.mirrorHosts(pages.toDF("url", "text"),
        minShared = 2, maxHostsPerHash = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // b has 3 distinct texts (t1, t2, boiler); min(|a|=4, |b|=3) = 3
    assert(got.toSeq === Seq(("a.org", "b.org", 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    // same-text URL variants on ONE host count once: no self pair emitted
    val one = WebOps.mirrorHosts(
      Seq(("https://a.org/1", "t"), ("https://a.org/2", "t")).toDF("url", "text"),
      minShared = 1).collect()
    assert(one.isEmpty)
  }

  test("urlTemplates: digit/hex segments generalize, distinct-URL support") {
    import spark.implicits._
    val urls = Seq(
      // three distinct ids under one template (query params don't split it)
      "https://a.org/item/123", "https://a.org/item/456?x=1",
      "https://a.org/item/789",
      // session-id space: ≥8 hex chars → {hex}; 'beef' (4) stays literal
      "https://a.org/s/deadbeefcafe0123/view", "https://a.org/s/0123456789abcdef/view",
      // www. folds into the same host as a.org
      "https://www.a.org/item/42",
      // a singleton template: below minUrls=2, dropped
      "https://a.org/about",
      // short non-hex segment survives literally
      "https://b.org/beef/1", "https://b.org/beef/2").toDF("url")
    val got = WebOps.urlTemplates(urls).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("a.org", "/item/{d}", 4L),
      ("a.org", "/s/{hex}/view", 2L),
      ("b.org", "/beef/{d}", 2L)))
  }

  test("robotsFilter: longest prefix wins, Allow beats Disallow on ties, no match allows") {
    import spark.implicits._
    // doc_id → host = Domains(id % 7) canonicalized, path = /p/(id % 40)
    val docs = Seq(12L, 13L, 25L, 33L, 5L).toDF("doc_id")
    val got = WebOps.robotsFilter(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getBoolean(3),
          Option(r.getString(4)))).toMap
    // 12 → shop.example.io /p/12: Allow /p/12 (len 5) beats Disallow /p/1
    assert(got(12L) === ("shop.example.io", "/p/12", true, Some("/p/12")))
    // 13 → news.example.com /p/13: only Disallow /p/1 matches
    assert(got(13L) === ("news.example.com", "/p/13", false, Some("/p/1")))
    // 25 → example.org /p/25: the host-specific Disallow /p/2 fires
    assert(got(25L) === ("example.org", "/p/25", false, Some("/p/2")))
    // 33 → shop.example.io /p/33: no rule matches → allowed
    assert(got(33L) === ("shop.example.io", "/p/33", true, None))
    // 5 → shop.example.io /p/5: shop's host-specific Disallow /p/5
    assert(got(5L) === ("shop.example.io", "/p/5", false, Some("/p/5")))
  }

  test("pld: multi-label public suffixes keep three labels, others two, bare host passes") {
    import spark.implicits._
    val got = Seq("news.example.co.uk", "example.co.uk", "co.uk",
      "shop.news.example.com", "example.org", "localhost", "a.b.ac.uk")
      .toDF("h").select(WebOps.pld(col("h"))).as[String].collect()
    assert(got === Array("example.co.uk", "example.co.uk", "co.uk",
      "example.com", "example.org", "localhost", "b.ac.uk"))
  }

  test("pageChains: 3-page chains merge in order, singletons stay, tails truncate clean") {
    import spark.implicits._
    // ids 0..12: chains {1,2,3} and {11,12} (12 -> 13 suppressed by the
    // max-id guard; 12 still chains to 11), singletons elsewhere
    val docs = (0L to 12L).map(i => (i, s"t$i", 1L))
      .toDF("doc_id", "text", "n_chars")
    val got = WebOps.pageChains(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val singles = Set(0L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
      .map(i => (s"doc://$i", 1L, s"t$i"))
    assert(got === singles +
      (("doc://1", 3L, "t1 t2 t3")) + (("doc://11", 2L, "t11 t12")))
    // totals conserved: every page lands in exactly one chain
    assert(got.toSeq.map(_._2).sum === 13L)
  }

  test("soft404: shared template across URLs flags, same-URL recrawl and singletons don't") {
    import spark.implicits._
    val pages = Seq(
      // host a: error template at 3 distinct URLs -> flagged
      (0L, "https://a.com/x", "404 oops"),
      (1L, "https://a.com/y", "404 oops"),
      (2L, "https://a.com/z", "404 oops"),
      // host a: same text at ONE canonical URL twice (recrawl) -> not flagged
      (3L, "https://a.com/p?utm_source=f", "real article"),
      (4L, "https://a.com/p", "real article"),
      // host b: the same template text but only one URL -> not flagged
      (5L, "https://b.com/x", "404 oops"))
      .toDF("doc_id", "url", "text")
    val got = WebOps.soft404(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a.com", "404 oops", 3L, 3L)))
    // structural contract: one aggregation, no join, no window
    val plan = WebOps.soft404(pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }

  test("changeRate: naive fraction + Cho-GM lambda, frozen page at 0, all-change capped") {
    import spark.implicits._
    // one URL, 4 captures, hashes h0 h0 h1 h1 -> n=3, X=1
    val hist = Seq(
      (0L, "https://a.com/x", 0, 100L, "h0"),
      (0L, "https://a.com/x", 1, 200L, "h0"),
      (0L, "https://a.com/x", 2, 300L, "h1"),
      (0L, "https://a.com/x", 3, 400L, "h1"),
      // frozen page: n=2, X=0 -> both rates 0
      (1L, "https://a.com/y", 0, 100L, "g0"),
      (1L, "https://a.com/y", 1, 200L, "g0"),
      (1L, "https://a.com/y", 2, 300L, "g0"),
      // churner: every capture differs, n=2, X=2 -> lambda finite via +0.5
      (2L, "https://a.com/z", 0, 100L, "k0"),
      (2L, "https://a.com/z", 1, 200L, "k1"),
      (2L, "https://a.com/z", 2, 300L, "k2"))
      .toDF("doc_id", "url", "visit", "fetch_epoch", "content_hash")
    val got = WebOps.changeRate(hist, intervalDays = 7.0).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def lam(n: Int, x: Int) =
      BigDecimal(-math.log((n - x + 0.5) / (n + 0.5)) / 7.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("https://a.com/x") === ((3L, 1L, 0.333333, lam(3, 1))))
    assert(got("https://a.com/y") === ((2L, 0L, 0.0, 0.0)))
    assert(got("https://a.com/z") === ((2L, 2L, 1.0, lam(2, 2))))
  }

  test("sitemapGap: listed = crawled ∪ ghost tail, accounting exact per host") {
    val docs = syntheticDocs(21) // ids 0..20; ghost tail 21..41
    val got = WebOps.sitemapGap(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // invariants: per host n_listed = n_crawled + n_new; the ghost tail
    // must surface uncrawled urls somewhere
    assert(got.nonEmpty)
    got.foreach { case (h, (listed, crawled, nw)) =>
      assert(listed === crawled + nw, s"$h accounting")
    }
    assert(got.values.map(_._3).sum > 0, "ghost tail produced no new urls")
    // cross-check exactly: canonical urls of ids 0..41 vs crawled 0..20
    def canon(ids: Seq[Int]) = {
      val sess = docs.sparkSession
      import sess.implicits._
      ids.toDF("id")
        .select(WebOps.canonicalUrl(WebOps.syntheticUrl(col("id"))).as("u"),
          WebOps.canonicalHost(WebOps.syntheticUrl(col("id"))).as("h"))
        .collect().map(r => (r.getString(0), r.getString(1)))
    }
    val all = canon(0 to 41)
    val crawledSet = canon(0 to 20).map(_._1).toSet
    val byHost = all.groupBy(_._2).map { case (h, us) =>
      val locs = us.map(_._1).distinct
      h -> ((locs.size.toLong, locs.count(crawledSet).toLong,
        locs.count(u => !crawledSet(u)).toLong))
    }
    assert(got === byHost)
  }
}
