package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.LinkGraph

/** Hyperlink extraction: anchor-tag parsing from crafted HTML, relative-href
  * resolution, canonicalization of the target, host-graph conventions, and
  * the anchor-text ranking contract. */
class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pagesDf(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("url", "html")
  }

  test("extraction: hrefs + anchors, relative resolution, canonicalized targets") {
    val pages = pagesDf(
      ("https://www.Site.org/a/",
        """<html><body><p>x</p><a href="https://Other.net/p?utm_source=z&id=3">first</a><a href="/p/7">second</a></body></html>"""),
      ("https://plain.org/none", "<html><body><p>no links</p></body></html>"))
    val got = LinkGraph.links(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got === Set(
      // absolute href: host lowercased, utm_ param dropped, id kept
      ("https://www.Site.org/a/", "https://Other.net/p?utm_source=z&id=3",
        "first", "https://other.net/p?id=3"),
      // relative href: resolved against the SOURCE's canonical host (www. gone)
      ("https://www.Site.org/a/", "/p/7", "second", "https://site.org/p/7")))
    // the no-anchor page contributes no rows (covered by the exact set)
  }

  test("hreflangClusters: declared alternates group under least(page, min(target))") {
    import spark.implicits._
    val pages = Seq(
      // two declared alternates; the de target canonicalizes below the page
      (1L, "https://www.A.org/x/",
        """<html><link rel="alternate" hreflang="fr" href="https://a.org/fr/x">""" +
          """<link rel="alternate" hreflang="de" href="https://A.org/de/x?utm_source=t"></html>"""),
      // no alternates → contributes no rows (declared clusters only)
      (2L, "https://b.org/y", "<html>plain</html>"),
      // page url sorts below its only target → the page anchors the cluster
      (3L, "https://aa.org/a",
        """<html><link rel="alternate" hreflang="fr" href="https://zz.org/b"></html>"""))
      .toDF("doc_id", "url", "html")
    val got = LinkGraph.hreflangClusters(pages)
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(
      ("https://a.org/x", "fr", "https://a.org/fr/x", "https://a.org/de/x"),
      ("https://a.org/x", "de", "https://a.org/de/x", "https://a.org/de/x"),
      ("https://aa.org/a", "fr", "https://zz.org/b", "https://aa.org/a")))
  }

  test("synthetic pages: link count is doc_id % 4; zero-link docs drop out") {
    import spark.implicits._
    val docs = (0L to 19L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val links = LinkGraph.links(LinkGraph.pages(docs))
    assert(links.count() === (0L to 19L).map(_ % 4).sum)
    // slot-3 host- and path-relative links resolve against the SOURCE's
    // canonical host (protocol-relative `//host/...` legitimately hops host)
    val rel = links.filter(
        (col("href").startsWith("/") && !col("href").startsWith("//"))
          || col("href").startsWith(".") || col("href").startsWith("r/"))
      .select(graft.ops.WebOps.canonicalHost(col("src_url")).as("sh"),
        graft.ops.WebOps.canonicalHost(col("dst_url")).as("dh"))
      .collect()
    assert(rel.nonEmpty && rel.forall(r => r.getString(0) === r.getString(1)))
    // the synthesis emits all four relative forms across a big enough range
    val forms = LinkGraph.links(LinkGraph.pages(
      (0L to 99L).map(i => (i, s"text $i")).toDF("doc_id", "text")))
      .select("href").collect().map(_.getString(0))
    assert(forms.exists(h => h.startsWith("/") && !h.startsWith("//")))
    assert(forms.exists(_.startsWith("../")))
    assert(forms.exists(_.startsWith("//")))
    assert(forms.exists(_.startsWith("./")))
    assert(forms.exists(_.startsWith("?page=")))
  }

  test("resolveHref: all four RFC 3986 reference forms + dot-segment removal") {
    val pages = pagesDf(
      ("https://www.Site.org/a/b/c?x=1", List(
        "https://abs.example/p",        // absolute: untouched
        "//CDN.example/img/../x",        // protocol-relative + dots
        "/p/./q/../r",                   // host-relative + dots
        "../up",                         // path-relative: pops b/c's dir
        "./same/z",                      // same-dir
        "plain/deep/../y?k=2",           // merged + dots + query survives
        "../../../overpop",              // .. beyond root clamps at root
        "?page=2",                       // query-only: FULL base path kept
        "#sec")                          // fragment-only: base path + query kept
        .map(h => s"""<a href="$h">a</a>""").mkString))
    val got = LinkGraph.links(pages).collect()
      .map(r => r.getString(1) -> r.getString(3)).toMap
    assert(got("https://abs.example/p") === "https://abs.example/p")
    assert(got("//CDN.example/img/../x") === "https://cdn.example/x")
    assert(got("/p/./q/../r") === "https://site.org/p/r")
    // base dir of /a/b/c is /a/b/ → ../up = /a/up
    assert(got("../up") === "https://site.org/a/up")
    assert(got("./same/z") === "https://site.org/a/b/same/z")
    assert(got("plain/deep/../y?k=2") === "https://site.org/a/b/plain/y?k=2")
    assert(got("../../../overpop") === "https://site.org/overpop")
    // query-only pagination: the LAST path segment of the base survives
    // (canonicalUrl sorts the query params, hence page=2 after the sort)
    assert(got("?page=2") === "https://site.org/a/b/c?page=2")
    // fragment-only: base path AND query survive; canonicalUrl drops the frag
    assert(got("#sec") === "https://site.org/a/b/c?x=1")
  }

  test("links is map-only: no Exchange, generator inside codegen") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"t $i")).toDF("doc_id", "text")
    val plan = LinkGraph.links(LinkGraph.pages(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("DeserializeToObject"), plan) // no object-mode island
    assert(plan.contains("Generate"), plan)
  }

  test("domainQuota plans a map-side WindowGroupLimit below the exchange") {
    import spark.implicits._
    val docs = (0L to 99L).map(i => (i, s"t $i", 10L)).toDF("doc_id", "text", "n_chars")
    val plan = graft.ops.WebOps.domainQuota(docs, 5)
      .queryExecution.executedPlan.toString
    // Spark 4's rank-limit pushdown: a partial WindowGroupLimit on the map
    // side means only ≤ quota rows per host per partition reach the shuffle
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.indexOf("WindowGroupLimit") != plan.lastIndexOf("WindowGroupLimit"),
      s"expected partial+final WindowGroupLimit pair:\n$plan")
  }

  test("hostGraph drops intra-host links and counts pairs") {
    val pages = pagesDf(
      ("https://a.org/1",
        """<a href="https://a.org/2">self</a><a href="https://b.org/x">b1</a><a href="https://b.org/y">b2</a>"""))
    val got = LinkGraph.hostGraph(LinkGraph.links(pages)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("a.org", "b.org", 2L)))
  }

  test("anchorText: top-k by count desc then anchor asc, rank bounded") {
    val html = """<a href="https://t.org/p">alpha</a><a href="https://t.org/p">alpha</a>""" +
      """<a href="https://t.org/p">beta</a><a href="https://t.org/p">aaa</a>""" +
      """<a href="https://t.org/p">zzz</a>"""
    val got = LinkGraph.anchorText(
        LinkGraph.links(pagesDf(("https://s.org/", html))), topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    // alpha(2) first; ties at 1 break alphabetically: aaa, beta; zzz cut
    assert(got.toSeq === Seq(("alpha", 2L, 1), ("aaa", 1L, 2), ("beta", 1L, 3)))
  }

  test("coCitation: shared-source pairs, minCo floor, hub cap") {
    import spark.implicits._
    val links = (Seq(
      // two sources each cite {a, b} → pair count 2
      ("https://s1.org/", "https://x.org/a"),
      ("https://s1.org/", "https://x.org/b"),
      ("https://s2.org/", "https://x.org/a"),
      ("https://s2.org/", "https://x.org/b"),
      // one source cites {a, c} once → below minCo=2
      ("https://s3.org/", "https://x.org/a"),
      ("https://s3.org/", "https://x.org/c")) ++
      // a 5-out-link hub also citing a and b: over maxOut=4, so it must
      // NOT lift (a, b) to 3
      (Seq("a", "b", "h1", "h2", "h3")
        .map(p => ("https://hub.org/", s"https://x.org/$p"))))
      .toDF("src_url", "dst_url")
    val got = LinkGraph.coCitation(links, maxOut = 4, minCo = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("https://x.org/a", "https://x.org/b") -> 2L))
  }

  test("bibCoupling: shared-target pairs, minShared floor, in-degree cap") {
    import spark.implicits._
    val links = (Seq(
      // s1 and s2 both cite {a, b} → coupled with 2 shared refs
      ("https://s1.org/p", "https://x.org/a"),
      ("https://s1.org/p", "https://x.org/b"),
      ("https://s2.org/p", "https://x.org/a"),
      ("https://s2.org/p", "https://x.org/b"),
      // s3 shares only {a} with s1/s2 → below minShared=2
      ("https://s3.org/p", "https://x.org/a"),
      ("https://s3.org/p", "https://x.org/c")) ++
      // a universally-linked home page (in-degree 5 > maxIn=4) must not
      // lift (s1, s2) to 3 shared refs
      Seq("s1", "s2", "s3", "s4", "s5")
        .map(s => (s"https://$s.org/p", "https://x.org/home")))
      .toDF("src_url", "dst_url")
    val got = LinkGraph.bibCoupling(links, maxIn = 4, minShared = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("https://s1.org/p", "https://s2.org/p") -> 2L))
    // duality: coupling on the transposed edge list == co-citation
    val transposed = links.select(col("dst_url").as("src_url"),
      col("src_url").as("dst_url"))
    val dual = LinkGraph.coCitation(transposed, maxOut = 4, minCo = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(dual === got)
  }

  test("linkFarms: reciprocal pairs only, ordered once, min/max ratio") {
    import spark.implicits._
    val hostEdges = Seq(
      ("a.org", "b.org", 4L), // reciprocal with b→a
      ("b.org", "a.org", 1L),
      ("a.org", "c.org", 7L), // one-way: no c→a row → excluded
      ("d.org", "e.org", 3L), // perfectly symmetric farm
      ("e.org", "d.org", 3L))
      .toDF("src_host", "dst_host", "n_links")
    val got = LinkGraph.linkFarms(hostEdges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === Set(
      ("a.org", "b.org", 4L, 1L, 0.25),
      ("d.org", "e.org", 3L, 3L, 1.0)))
    // minLinks floors BOTH directions, not the sum
    val floored = LinkGraph.linkFarms(hostEdges, minLinks = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored === Set(("d.org", "e.org")))
  }

  test("reciprocity: mutual pair + one-way edge → 2/3; post-agg join cannot fan out") {
    import spark.implicits._
    // a⇄b mutual, a→c one-way: 3 directed edges, 2 reciprocated
    val hostEdges = Seq(
      ("a.org", "b.org", 4L), ("b.org", "a.org", 1L), ("a.org", "c.org", 2L))
      .toDF("src_host", "dst_host", "n_links")
    val got = LinkGraph.reciprocity(hostEdges).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 3L && got.head.getLong(1) === 2L)
    assert(got.head.getDouble(2) ===
      BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a pure ring reads 1.0, a pure DAG 0.0
    val ring = Seq(("x", "y", 1L), ("y", "x", 1L)).toDF("src_host", "dst_host", "n_links")
    assert(LinkGraph.reciprocity(ring).collect().head.getDouble(2) === 1.0)
    val dag = Seq(("x", "y", 1L), ("y", "z", 1L)).toDF("src_host", "dst_host", "n_links")
    assert(LinkGraph.reciprocity(dag).collect().head.getDouble(2) === 0.0)
  }

  test("trustRank: unreachable-from-seeds hosts carry full spam mass") {
    import spark.implicits._
    // trusted cluster a→b; spam ring c⇄d unreachable from the seed
    val hostEdges = Seq(
      ("a.org", "b.org", 2L),
      ("c.org", "d.org", 5L), ("d.org", "c.org", 5L))
      .toDF("src_host", "dst_host", "n_links")
    val got = LinkGraph.trustRank(hostEdges, Seq("a.org").toDF("node"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === Set("a.org", "b.org", "c.org", "d.org"))
    // zero trust reaches the ring: relative spam mass is exactly 1.0
    assert(got("c.org")._3 === 1.0)
    assert(got("d.org")._3 === 1.0)
    assert(got("c.org")._2 === 0.0)
    // the seed and its outlink hold trust ≥ their uniform rank share
    assert(got("a.org")._3 < 0.0) // trust-rich: negative relative mass
    assert(got("b.org")._3 < 1.0)
    // both rank vectors are probability distributions (6dp rounding slack)
    val sums = got.values.foldLeft((0.0, 0.0)) {
      case ((p, t), (pr, tr, _)) => (p + pr, t + tr)
    }
    assert(math.abs(sums._1 - 1.0) < 1e-4 && math.abs(sums._2 - 1.0) < 1e-4)
  }

  test("partitionLp: cliques coalesce to one partition each; locality beats hash") {
    import spark.implicits._
    // two 16-node cliques joined by one bridge — the clustered shape a hash
    // layout scatters (expected local fraction ~1/P) and LP must recover
    val clique = (base: String) => for {
      i <- 0 until 16; j <- 0 until 16 if i < j
    } yield (s"$base$i", s"$base$j", 1L)
    val edges = (clique("a") ++ clique("b") ++ Seq(("a0", "b0", 1L)))
      .toDF("src", "dst", "n_links")
    val out = LinkGraph.partitionLp(edges, partitions = 4, rounds = 3)
      .collect()
    // every edge except possibly the bridge is local: >= 240/241 of mass
    val (e, l) = out.foldLeft((0L, 0L)) { (acc, r) =>
      (acc._1 + (if (r.isNullAt(2)) 0L else r.getLong(2)),
       acc._2 + (if (r.isNullAt(3)) 0L else r.getLong(3)))
    }
    assert(e === 241L)
    assert(l >= 240L, s"cliques failed to coalesce: $l/$e local")
    // vs the hash baseline on the same edges (P=4): LP must strictly win
    val hash = LinkGraph.edgeCutStats(edges, partitions = 4).collect()
    val hl = hash.map(_.getLong(2)).sum
    assert(l > hl, s"LP ($l local) did not beat hash ($hl local)")
    // deterministic: a second run is EXACTLY equal
    val again = LinkGraph.partitionLp(edges, partitions = 4, rounds = 3)
      .collect()
    assert(again.map(_.toString).sorted.toSeq ===
      out.map(_.toString).sorted.toSeq)
  }
}
