package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hyperlink-graph construction over a Common-Crawl-style page table — the
  * web-native leg of KG construction: extract `<a href>` edges from the raw
  * HTML, resolve relative links against the source page, canonicalize both
  * endpoints with [[WebOps.canonicalUrl]], then aggregate to a host-level
  * graph, a directed page-level PageRank input, and a per-target anchor-text
  * table (the classic entity-linking / page-title signal: what OTHER pages
  * call this page).
  *
  * Everything is map-only column expressions until the aggregations — the
  * extraction itself is `regexp_extract_all` + `posexplode`, whole-stage
  * codegen'd, no UDF — and every regex lives in the Java∩RE2-identical
  * subset so the DuckDB oracle runs the same pattern verbatim.
  *
  * The driver corpus carries no HTML, so [[syntheticHtml]] wraps each doc's
  * text with a deterministic trailer of 0–3 anchor tags (targets derived
  * from `doc_id` arithmetic, mirrored literally in the oracle SQL — same
  * single-source-of-truth discipline as [[WebOps.syntheticUrl]]). Link 3 is
  * emitted host-RELATIVE (`/p/NN`) so the resolution leg is genuinely
  * exercised; docs with `doc_id % 4 == 0` get no links, so the no-match
  * explode leg and PageRank's dangling-mass leg are exercised too.
  */
object LinkGraph {

  /** The anchor-tag pattern — group 1 = href, group 2 = anchor text. No
    * lookaround/backrefs (Java∩RE2 subset): the oracle runs it verbatim. */
  val LinkRe = "<a href=\"([^\"]*)\">([^<]*)</a>"

  // ---- deterministic page synthesis (single source of truth w/ oracle) ---

  /** Link target id for slot `j` (1-based) of `docId`: spread over 0..96 so
    * targets cover all host/path/query congruence classes. */
  private def targetId(docId: Column, j: Column): Column =
    (docId * 13 + j.cast("long") * 7) % 97

  /** Anchor-text lead words — dictionary-matchable surfaces (incl. THREE
    * LOOM-ambiguous labels: "hash join", "merge sort", "key value" each
    * map to 2 classes across ONT1/ONT2) so the anchor table is
    * ENTITY-LINKABLE; the oracle inlines the same list. */
  val AnchorWords: Seq[String] =
    Seq("data", "hash join", "batch", "merge sort", "key value")

  private def anchorWord(t: Column): Column =
    element_at(array(AnchorWords.map(lit): _*), (t % 5).cast("int") + 1)

  /** Deterministic HTML page: the doc text plus `doc_id % 4` anchor tags.
    * Slots 1–2 are absolute [[WebOps.syntheticUrl]]s; slot 3 cycles through
    * the five RELATIVE reference forms of RFC 3986 by `t % 5` — 0:
    * host-relative `/p/N`, 1: dot-segmented path-relative `../q/N`, 2:
    * protocol-relative `//host/p/N`, 3: same-dir path-relative `./r/N`, 4:
    * query-only `?page=N` — so every [[resolveHref]] CASE leg is exercised
    * by the fixture (and by the oracle, which rebuilds this HTML in SQL). */
  def syntheticHtml(docId: Column, text: Column): Column = {
    val all = transform(sequence(lit(1), lit(3)), j => {
      val t = targetId(docId, j)
      val n = (t % 40).cast("string")
      val rel = when(t % 5 === 0, concat(lit("/p/"), n))
        .when(t % 5 === 1, concat(lit("../q/"), n))
        .when(t % 5 === 2, concat(lit("//"),
          element_at(array(WebOps.Domains.map(lit): _*), (t % 7).cast("int") + 1),
          lit("/p/"), n))
        .when(t % 5 === 3, concat(lit("./r/"), n))
        .otherwise(concat(lit("?page="), n))
      val href = when(j === 3, rel).otherwise(WebOps.syntheticUrl(t))
      concat(lit("<a href=\""), href, lit("\">"), anchorWord(t), lit(" "),
        (t % 40).cast("string"), lit("</a>"))
    })
    concat(lit("<html><body><p>"), text, lit("</p>"),
      array_join(slice(all, lit(1), (docId % 4).cast("int")), ""),
      lit("</body></html>"))
  }

  /** docs → the canonical page shape `(doc_id, url, html)`. */
  def pages(docs: DataFrame): DataFrame =
    WebOps.withUrls(docs).select(col("doc_id"), col("url"),
      syntheticHtml(col("doc_id"), col("text")).as("html"))

  // ---- extraction --------------------------------------------------------

  /** RFC 3986 §5.2.4 "remove dot segments" over a path that starts with `/`
    * (or is empty): a string-accumulator fold over the `/`-split segments —
    * `.` and empty segments drop (this also collapses `//` runs and strips a
    * trailing slash, the same normal form [[WebOps.canonicalUrl]] lands on),
    * `..` pops the last accumulated segment (a no-op at the root, per the
    * RFC), anything else appends. Fully general — no unroll depth cap — and
    * the DuckDB twin is the SAME fold via `list_reduce` (the leading empty
    * segment of a `/`-rooted path is exactly list_reduce's seed). */
  private def removeDotSegments(path: Column): Column = {
    val folded = aggregate(split(path, "/"), lit(""), (acc, seg) =>
      when(seg === "" || seg === ".", acc)
        .when(seg === "..", regexp_replace(acc, "/[^/]*$", ""))
        .otherwise(concat(acc, lit("/"), seg)))
    when(folded === "", lit("/")).otherwise(folded)
  }

  /** Resolve an href against its source page (RFC 3986 §5.2, http(s)
    * profile — the four forms a real crawl sees):
    *  - absolute (`scheme:` prefix) → pass through;
    *  - protocol-relative (`//host/path`) → source scheme (https — the
    *    canonical-URL normal form) + authority + dot-fixed path;
    *  - host-relative (`/path`) → source canonical host + dot-fixed path;
    *  - path-relative (`a/b`, `../a`, `./a`) → merged against the source
    *    path's base directory (§5.3: everything up to the last `/`), then
    *    dot-fixed.
    * Query/fragment of the href survive untouched (dot removal applies to
    * the path component only); the downstream [[WebOps.canonicalUrl]] does
    * its usual fragment/utm/sort normalization. Empty-PATH references
    * follow §5.3 exactly: a query-only href (`?page=2` — real-crawl
    * pagination) keeps the FULL base path with the new query; a
    * fragment-only href (`#sec`) keeps base path AND base query. */
  def resolveHref(srcUrl: Column, href: Column): Column = {
    val relPath = regexp_extract(href, "^[^?#]*", 0)
    val relSuffix = regexp_extract(href, "[?#].*$", 0) // '' when absent
    val srcHost = WebOps.canonicalHost(srcUrl)
    val srcPath = regexp_extract(srcUrl, WebOps.PathRe, 1)
    val srcQuery = regexp_extract(srcUrl, "(\\?[^#]*)", 1) // '' when absent
    // '/a/b' → '/a/'; an empty source path (bare host) merges from '/'
    val baseDir = when(srcPath === "", lit("/"))
      .otherwise(regexp_replace(srcPath, "/[^/]*$", "/"))
    when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), href)
      .when(href.startsWith("//"),
        concat(lit("https://"), regexp_extract(href, "^//([^/?#]*)", 1),
          removeDotSegments(regexp_extract(href, "^//[^/?#]*([^?#]*)", 1)),
          relSuffix))
      .when(href.startsWith("/"),
        concat(lit("https://"), srcHost, removeDotSegments(relPath), relSuffix))
      .when(href.startsWith("#"), // fragment-only: keep base path + query
        concat(lit("https://"), srcHost, srcPath, srcQuery, href))
      .when(relPath === "", // query-only: keep the FULL base path
        concat(lit("https://"), srcHost, srcPath, relSuffix))
      .otherwise(
        concat(lit("https://"), srcHost,
          removeDotSegments(concat(baseDir, relPath)), relSuffix))
  }

  /** The link table: one row per anchor tag —
    * `(src_url, href, anchor, dst_url)` with `dst_url` resolved +
    * canonicalized. Pure map-side explode over the page scan (zero
    * shuffles); at 10^12 pages this runs as wide as the corpus scan. */
  def links(pages: DataFrame): DataFrame = {
    val hrefs = regexp_extract_all(col("html"), lit(LinkRe), lit(1))
    val anchors = regexp_extract_all(col("html"), lit(LinkRe), lit(2))
    pages
      .select(col("url").as("src_url"), posexplode(hrefs).as(Seq("i", "href")),
        anchors.as("anchors"))
      .select(col("src_url"), col("href"),
        element_at(col("anchors"), col("i") + 1).as("anchor"),
        WebOps.canonicalUrl(resolveHref(col("src_url"), col("href")))
          .as("dst_url"))
  }

  /** Host-level link graph: `(src_host, dst_host, n_links)` over canonical
    * hosts, intra-host links dropped (the usual host-graph convention —
    * navigation chrome would otherwise dominate). ONE hash aggregation on
    * short host-pair keys; no page bytes in the shuffle. */
  def hostGraph(links: DataFrame): DataFrame =
    links
      .select(WebOps.canonicalHost(col("src_url")).as("src_host"),
        WebOps.canonicalHost(col("dst_url")).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))

  /** Log2-bucketed in/out degree histogram of the host graph — the
    * power-law sanity check every web-graph release gets (a crawl whose
    * out-degree histogram loses its tail got truncated by the fetcher; an
    * in-degree spike at one bucket is a link farm). bucket = floor(log2
    * (degree)) computed EXACTLY as `length(bin(degree)) - 1` — bit-length
    * arithmetic, no float log at bucket boundaries — identical in DuckDB.
    * Two short-key aggs over the already-aggregated host edges, then a
    * histogram agg over host-table-sized input. */
  def degreeDist(hostEdges: DataFrame): DataFrame = {
    val outd = hostEdges.groupBy(col("src_host").as("host"))
      .agg(count(lit(1)).as("deg")).withColumn("direction", lit("out"))
    val ind = hostEdges.groupBy(col("dst_host").as("host"))
      .agg(count(lit(1)).as("deg")).withColumn("direction", lit("in"))
    outd.unionByName(ind)
      .select(col("direction"), (length(bin(col("deg"))) - 1).as("bucket"))
      .groupBy("direction", "bucket")
      .agg(count(lit(1)).as("n_hosts"))
  }

  /** Host graph rolled up to pay-level domains (eTLD+1): the registrable-
    * domain edge list crawl policy ranks and quotas against — subdomain
    * shards (news./shop./blog.) collapse into one node, intra-PLD edges
    * (which host graphs keep when a site links across its own subdomains)
    * drop. [[WebOps.pld]] is map-side; the rollup is ONE short-key
    * aggregation over the already-aggregated host edges — strictly
    * smaller than its input at any scale. */
  def pldGraph(hostEdges: DataFrame): DataFrame =
    hostEdges
      .select(WebOps.pld(col("src_host")).as("src_pld"),
        WebOps.pld(col("dst_host")).as("dst_pld"), col("n_links"))
      .filter(col("src_pld") =!= col("dst_pld"))
      .groupBy("src_pld", "dst_pld")
      .agg(sum(col("n_links")).as("n_links"))

  /** Edge reciprocity of the directed host graph: the fraction of host
    * edges whose reverse edge also exists — the link-farm / partnership
    * signal at graph level (organic web graphs sit near 0.2–0.3; a farm
    * ring pushes toward 1, a pure spam-target shape toward 0). One
    * self-join of the already-aggregated host edge list on the reversed
    * key (host-pair keys are unique post-aggregation, so the left join
    * cannot fan out), then a single 1-row count/sum aggregate; division
    * order mirrored by the oracle, 6dp. Host-table-scale — page bytes
    * never enter. */
  def reciprocity(hostEdges: DataFrame): DataFrame = {
    val e = hostEdges.select(col("src_host"), col("dst_host"))
    val rev = e.select(col("dst_host").as("src_host"),
      col("src_host").as("dst_host")).withColumn("rev", lit(1L))
    e.join(rev, Seq("src_host", "dst_host"), "left")
      .agg(count(lit(1)).as("n_edges"),
        sum(coalesce(col("rev"), lit(0L))).as("n_reciprocal"))
      .select(col("n_edges"), col("n_reciprocal"),
        round(col("n_reciprocal") / col("n_edges"), 6).as("reciprocity"))
  }

  /** Directed page-level edge list `(src, dst, n_links)` on canonical URLs
    * — the [[graft.graph.KgGraph.pageRankDirected]] input. Self-edges kept:
    * a page linking to itself is real rank flow, and PR handles it. */
  def pageEdges(links: DataFrame): DataFrame =
    links
      .select(WebOps.canonicalUrl(col("src_url")).as("src"),
        col("dst_url").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n_links"))

  /** Partition count the edge-cut pre-flight models — the triple/graph
    * sink's layout width (32 here to match the session's shuffle width; a
    * production run passes its real partition count). */
  val EdgeCutPartitions = 32

  /** Hash-layout edge-cut pre-flight: under a `hash(node) % P` placement
    * (the sink's subject layout), how much of each partition's out-edge
    * mass stays LOCAL? Per partition: edge count, locally-closed edge
    * count, local fraction — the number that decides whether an iterative
    * graph op (PageRank, components) can skip its per-round exchange by
    * co-partitioning, and whether the layout is balanced enough to try.
    * Map-only projection + ONE hash aggregation on the partition id (P
    * groups); the hash is the portable md5-60 form so the oracle's
    * arithmetic is identical. */
  def edgeCutStats(edges: DataFrame,
                   partitions: Int = EdgeCutPartitions): DataFrame = {
    val p = lit(partitions.toLong)
    val local = (pmod(Sketch.hash60(col("src")), p) ===
      pmod(Sketch.hash60(col("dst")), p)).cast("long")
    edges
      .select(pmod(Sketch.hash60(col("src")), p).as("part"), local.as("l"))
      .groupBy("part")
      .agg(count(lit(1)).as("n_edges"), sum(col("l")).as("n_local"),
        round(sum(col("l")) / count(lit(1)), 6).as("pct_local"))
  }

  /** [[partitionLp]] knobs — SINGLE SOURCE shared with the oracle SQL.
    * 8 parts (not the sink's 32) so partitions hold real neighborhoods at
    * test SFs; 3 synchronous rounds (Spinner converges in a handful);
    * alpha weights the balance penalty (a full partition repels by alpha ×
    * its load fraction); the stickiness bonus keeps a node home on ties
    * (and beats a 1-neighbor pull against the penalty gradient). */
  val LpParts = 8
  val LpRounds = 3
  val LpAlpha = 8.0
  val LpSticky = 0.25

  /** Spinner-style label-propagation partitioning (Martella et al. 2017 —
    * LP with a balance penalty, the practical near-METIS layout for graphs
    * too big to partition exactly): labels start at the hash placement
    * [[edgeCutStats]] prices, then each synchronous round every node
    * adopts the partition with score `round(nbrCount − alpha·loadFrac, 6)
    * (+ sticky if it is the current label)`, ties to the smallest label —
    * fully deterministic, no probabilistic moves, so the oracle unrolls
    * the same rounds. Output: the [[edgeCutStats]] rollup per partition
    * (node count, out-edge count, locally-closed count, local fraction) —
    * directly comparable with the hash baseline.
    *
    * Scale shape per round: ONE adjacency join against the label table +
    * one (node, part) count agg, a P-row load table broadcast back, one
    * argmax agg per node (`max(struct)` — map-side partials), labels
    * pinned + truncated per round (the iterative-op lineage rule). Edge
    * direction is ignored for propagation (union both ways once, pinned);
    * isolated and self-loop-only nodes keep their hash label. */
  def partitionLp(edges: DataFrame, partitions: Int = LpParts,
                  rounds: Int = LpRounds): DataFrame = {
    require(partitions >= 2 && rounds >= 1,
      s"partitionLp needs >= 2 parts and >= 1 round, got $partitions/$rounds")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // read every round
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    var labels = nodes
      .withColumn("part", pmod(Sketch.hash60(col("node")), lit(partitions.toLong)))
      .localCheckpoint()
    val n = labels.count().toDouble // scalar once; the penalty denominator
    for (_ <- 1 to rounds) {
      val nbrCnt = und
        .join(labels.select(col("node").as("b"), col("part")), "b")
        .groupBy(col("a").as("node"), col("part"))
        .agg(count(lit(1)).as("cnt"))
      val loads = labels.groupBy("part").agg(count(lit(1)).as("load"))
      val cur = labels.select(col("node"), col("part").as("cur"))
      val scored = nbrCnt
        .join(broadcast(loads), "part")
        .join(cur, "node")
        .withColumn("s",
          round(col("cnt") - lit(LpAlpha) * col("load") / lit(n), 6) +
            when(col("part") === col("cur"), lit(LpSticky)).otherwise(lit(0.0)))
      val best = scored.groupBy("node")
        .agg(max(struct(col("s"), (-col("part")).as("np"))).as("k"))
        .select(col("node"), (-col("k.np")).as("best_part"))
      labels = cur.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("best_part"), col("cur")).as("part"))
        .localCheckpoint()
    }
    val withParts = edges
      .join(labels.select(col("node").as("src"), col("part").as("ps")), "src")
      .join(labels.select(col("node").as("dst"), col("part").as("pd")), "dst")
    val edgeStats = withParts.groupBy(col("ps").as("part"))
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("ps") === col("pd"), lit(1L)).otherwise(lit(0L)))
          .as("n_local"))
    labels.groupBy("part").agg(count(lit(1)).as("n_nodes"))
      .join(edgeStats, Seq("part"), "left")
      .select(col("part"), col("n_nodes"), col("n_edges"), col("n_local"),
        round(col("n_local") / col("n_edges"), 6).as("pct_local"))
  }

  /** Per-target anchor-text table: the `topK` most frequent anchor strings
    * pointing at each canonical URL (count desc, anchor asc — fully
    * deterministic). The window partitions by dst_url (millions of keys at
    * crawl scale — no single-partition window), after a count aggregation
    * that partial-aggregates map-side, so hot targets (home pages) cost one
    * combine, not one task. */
  def anchorText(links: DataFrame, topK: Int = 3): DataFrame = {
    val counts = links.groupBy(col("dst_url"), col("anchor"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("dst_url").orderBy(col("n").desc, col("anchor"))))
      .filter(col("rank") <= topK)
  }

  /** Co-citation similarity (Small 1973, the web-IR relatedness signal):
    * page pairs LINKED FROM the same source page, counted over distinct
    * (src, dst) edges — pages repeatedly cited together are topically
    * related, a link-structure analogue of the annotation co-occurrence
    * votes in entity disambiguation.
    *
    * Scale shape: sources with out-degree > `maxOut` are dropped BEFORE the
    * self-join (directory/sitemap pages would contribute O(degree²) pairs —
    * the same hub cap as Adamic–Adar and the LSH bucket guard); the join is
    * a TRUE self-join of one plan, so ReuseExchange computes the capped
    * edge set once; the pair aggregation shuffles short URL-pair keys. */
  def coCitation(links: DataFrame, maxOut: Int = 100,
                 minCo: Long = 2): DataFrame = {
    val pe = links.select(WebOps.canonicalUrl(col("src_url")).as("src"),
      col("dst_url").as("dst")).distinct()
    val capped = pe
      .withColumn("d", count(lit(1)).over(Window.partitionBy("src")))
      .filter(col("d") <= maxOut).drop("d")
    capped.alias("l")
      .join(capped.alias("r"),
        col("l.src") === col("r.src") && col("l.dst") < col("r.dst"))
      .groupBy(col("l.dst").as("page_a"), col("r.dst").as("page_b"))
      .agg(count(lit(1)).as("n_cociting"))
      .filter(col("n_cociting") >= minCo)
  }

  /** Bibliographic coupling (Kessler 1963) — the dual of [[coCitation]]:
    * page pairs LINKING TO the same target, counted over distinct
    * (src, dst) edges. Where co-citation needs an audience to accumulate
    * (old pages win), coupling is available the moment a page is crawled —
    * the freshness-robust relatedness signal, which is why retrieval
    * systems pair the two.
    *
    * Scale shape: the mirror of [[coCitation]]'s guard — targets with
    * in-degree > `maxIn` are dropped BEFORE the self-join (a universally
    * linked home page would contribute O(indegree²) source pairs); the
    * self-join is one plan on both sides (ReuseExchange), and the pair
    * aggregation shuffles short URL-pair keys only. */
  def bibCoupling(links: DataFrame, maxIn: Int = 100,
                  minShared: Long = 2): DataFrame = {
    val pe = links.select(WebOps.canonicalUrl(col("src_url")).as("src"),
      col("dst_url").as("dst")).distinct()
    val capped = pe
      .withColumn("d", count(lit(1)).over(Window.partitionBy("dst")))
      .filter(col("d") <= maxIn).drop("d")
    capped.alias("l")
      .join(capped.alias("r"),
        col("l.dst") === col("r.dst") && col("l.src") < col("r.src"))
      .groupBy(col("l.src").as("page_a"), col("r.src").as("page_b"))
      .agg(count(lit(1)).as("n_shared_refs"))
      .filter(col("n_shared_refs") >= minShared)
  }

  /** Reciprocal-link (link-farm) detection — the classic link-spam signal
    * (TrustRank-era web hygiene): host pairs linking each other in BOTH
    * directions, with `reciprocity = min(a→b, b→a) / max(a→b, b→a)` (1.0 =
    * perfectly symmetric exchange, the farm signature; organic links are
    * highly asymmetric). Input: [[hostGraph]] output.
    *
    * Scale shape: the host graph is already aggregated (one row per host
    * pair), so this is one self-join on ordered host-pair keys — each side
    * filters to one triangle of the matrix first, halving the join input;
    * no page bytes, no fan-out. */
  def linkFarms(hostEdges: DataFrame, minLinks: Long = 1): DataFrame = {
    val f = hostEdges.filter(col("src_host") < col("dst_host"))
      .select(col("src_host").as("host_a"), col("dst_host").as("host_b"),
        col("n_links").as("ab"))
    val r = hostEdges.filter(col("src_host") > col("dst_host"))
      .select(col("dst_host").as("host_a"), col("src_host").as("host_b"),
        col("n_links").as("ba"))
    f.join(r, Seq("host_a", "host_b")) // inner: both directions must exist
      .filter(col("ab") >= minLinks && col("ba") >= minLinks)
      .select(col("host_a"), col("host_b"), col("ab"), col("ba"),
        round(least(col("ab"), col("ba")).cast("double") /
          greatest(col("ab"), col("ba")).cast("double"), 6).as("reciprocity"))
  }

  /** TrustRank + relative spam mass (Gyöngyi, Garcia-Molina & Pedersen
    * 2004; Gyöngyi et al. 2006) over the host graph: `pagerank` = uniform-
    * teleport PageRank, `trust` = the same walk with teleport AND dangling
    * mass restricted to a hand-picked trusted seed set, and
    * `rel_spam_mass = (pagerank − trust) / pagerank` — the fraction of a
    * host's rank NOT attributable to the trusted core. Near 1.0 = rank
    * earned entirely outside trusted reach (the spam signature); NEGATIVE
    * values are faithful to the paper: hosts closer to the seeds than their
    * raw rank warrants accumulate trust above their PageRank.
    *
    * `seeds` is QUERY INPUT (the human-vetted whitelist — tiny by
    * definition); callers pass a small pinned frame, same contract as
    * [[graft.graph.KgGraph.pageRankPersonalized]]. Scale shape: the host
    * graph (orders of magnitude smaller than the page graph) is pinned
    * HERE — both PR loops and their seed/node scans read the materialized
    * edge set, so the upstream page-synthesis → extraction → aggregation
    * lineage runs ONCE, not once per consumer; then two runs of the shared
    * directed-PR loop + one node-keyed join — nothing touches page bytes. */
  def trustRank(hostEdges: DataFrame, seeds: DataFrame,
                iters: Int = 5): DataFrame = {
    val e = hostEdges.select(col("src_host").as("src"),
      col("dst_host").as("dst"), col("n_links")).localCheckpoint()
    // the two walks are INDEPENDENT chains over the same pinned edge set;
    // their loop construction is eager (per-round checkpoints), so running
    // them on two driver threads lets each loop's per-round barrier overlap
    // the other's work instead of serializing 2×iters driver round-trips
    // (the optimization guide's overlap-independent-jobs pattern; Spark
    // schedules concurrent jobs FIFO, back-filling idle executors)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val prF = Future(graft.graph.KgGraph.pageRankDirected(e, iters)
      .select(col("page").as("host"), col("pagerank")))
    val trF = Future(graft.graph.KgGraph.pageRankPersonalized(e, seeds, iters)
      .select(col("page").as("host"), col("pagerank").as("trust")))
    val pr = Await.result(prF, Duration.Inf)
    val tr = Await.result(trF, Duration.Inf)
    // both loops emit 6dp-rounded DOUBLEs; the mass ratio is computed ON
    // the rounded values (deterministic cross-engine) and re-rounded
    pr.join(tr, "host")
      .select(col("host"), col("pagerank"), col("trust"),
        round((col("pagerank") - col("trust")) / col("pagerank"), 6)
          .as("rel_spam_mass"))
  }

  /** Crawl frontier: canonical URLs that are LINKED TO but never crawled —
    * the next fetch list a crawler derives from each batch. One anti-join
    * of two deduped short-key sets (the link targets minus the crawled
    * set); both sides partial-aggregate before the shuffle. */
  def frontier(pages: DataFrame, links: DataFrame): DataFrame =
    links.select(col("dst_url").as("page")).distinct()
      .join(pages.select(WebOps.canonicalUrl(col("url")).as("page")).distinct(),
        Seq("page"), "left_anti")

  // ---- oracle-SQL builders (same constants/regexes as the Column code) ---

  /** rel=canonical declaration synthesis: every 9th page (doc_id % 9 == 2)
    * declares the mod-40 base URL as its canonical — the page-declared dup
    * signal (syndication copies, session-id variants) that URL
    * canonicalization alone cannot see. Mirrored in the oracle SQL. */
  def withCanonicalLink(pages: DataFrame): DataFrame =
    pages.withColumn("html", concat(col("html"),
      when(col("doc_id") % 9 === 2,
        concat(lit("<link rel=\"canonical\" href=\""),
          WebOps.syntheticUrl(col("doc_id") % 40), lit("\">")))
        .otherwise(lit(""))))

  /** rel=canonical RESOLUTION — per page, the canonical target it should
    * fold into: the declared `<link rel="canonical">` href (canonicalized)
    * when present, else the page's own canonical URL. Entirely MAP-ONLY
    * (one regexp_extract + the canonicalizer expressions — no joins, no
    * shuffles); downstream crawl-dedup groups by `canonical_target` exactly
    * as it groups by canon_url today. */
  def relCanonical(pages: DataFrame): DataFrame = {
    val decl = regexp_extract(col("html"),
      "<link rel=\"canonical\" href=\"([^\"]*)\"", 1)
    pages.select(col("doc_id"), col("url"), decl.as("decl"))
      .select(col("doc_id"),
        WebOps.canonicalUrl(col("url")).as("page_url"),
        when(col("decl") === "", WebOps.canonicalUrl(col("url")))
          .otherwise(WebOps.canonicalUrl(col("decl"))).as("canonical_target"),
        (col("decl") =!= "").as("declared"))
  }

  /** Append declared language-alternate tags (`<link rel="alternate"
    * hreflang=… href=…>`) to every 7th page — the multilingual-site signal
    * hreflang clustering consumes; the SQL synthesis twin is inlined in the
    * `web_hreflang_clusters` oracle with the SAME index arithmetic. */
  def withHreflangLinks(pages: DataFrame): DataFrame =
    pages.withColumn("html", concat(col("html"),
      when(col("doc_id") % 7 === 3,
        concat(
          lit("<link rel=\"alternate\" hreflang=\"fr\" href=\""),
          WebOps.syntheticUrl((col("doc_id") * 3 + 1) % 97), lit("\">"),
          lit("<link rel=\"alternate\" hreflang=\"de\" href=\""),
          WebOps.syntheticUrl((col("doc_id") * 5 + 2) % 97), lit("\">")))
        .otherwise(lit(""))))

  private val HreflangPattern =
    "<link rel=\"alternate\" hreflang=\"([a-z-]+)\" href=\"([^\"]*)\""

  /** hreflang ALTERNATE clusters — the page-declared language-variant
    * grouping (the dedup/quota unit for multilingual sites: one logical
    * document, N language editions). Extraction is map-only
    * (regexp_extract_all × two capture groups, zipped and exploded); the
    * cluster key is `least(page, min(alternate))` over the page's declared
    * set — declared clusters are one hop by construction (each page lists
    * its own alternates), so no iterative components pass is needed. The
    * single exchange is the per-page window, keyed by doc_id — the layout
    * the page table already has at rest. */
  def hreflangClusters(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = regexp_extract_all(col("html"), lit(HreflangPattern), lit(1))
    val hrefs = regexp_extract_all(col("html"), lit(HreflangPattern), lit(2))
    val edges = pages
      .select(col("doc_id"), WebOps.canonicalUrl(col("url")).as("page_url"),
        explode(arrays_zip(langs.as("l"), hrefs.as("h"))).as("a"))
      .select(col("doc_id"), col("page_url"), col("a.l").as("hreflang"),
        WebOps.canonicalUrl(col("a.h")).as("target_url"))
    val w = Window.partitionBy("doc_id")
    edges
      .withColumn("cluster_key",
        least(col("page_url"), min(col("target_url")).over(w)))
      .select("page_url", "hreflang", "target_url", "cluster_key")
  }

  /** CTE chain `pages(doc_id, url, html)` — the synthesis twin (string_agg
    * ordered by slot; LEFT JOIN keeps the zero-link docs). */
  def pagesCteSql: String =
    s"""urls AS (SELECT doc_id, text, ${WebOps.urlSqlExpr} AS url FROM documents),
        slots AS (SELECT doc_id, j, (doc_id * 13 + j * 7) % 97 AS t
                  FROM documents, (SELECT unnest(generate_series(1, 3)) AS j)
                  WHERE j <= doc_id % 4),
        atags AS (SELECT doc_id, j,
            '<a href="'
            || CASE WHEN j = 3 THEN
                 CASE WHEN t % 5 = 0 THEN '/p/' || CAST(t % 40 AS VARCHAR)
                      WHEN t % 5 = 1 THEN '../q/' || CAST(t % 40 AS VARCHAR)
                      WHEN t % 5 = 2 THEN '//'
                        || ([${WebOps.domainsSqlList}])[CAST(t % 7 AS INT) + 1]
                        || '/p/' || CAST(t % 40 AS VARCHAR)
                      WHEN t % 5 = 3 THEN './r/' || CAST(t % 40 AS VARCHAR)
                      ELSE '?page=' || CAST(t % 40 AS VARCHAR) END
                    ELSE ${WebOps.urlSqlExprOf("t")} END
            || '">'
            || ([${AnchorWords.map(w => s"'${w.replace("'", "''")}'").mkString(", ")}])[CAST(t % 5 AS INT) + 1]
            || ' ' || CAST(t % 40 AS VARCHAR) || '</a>' AS a
          FROM slots),
        pages AS (SELECT u.doc_id, u.url,
            '<html><body><p>' || u.text || '</p>' || COALESCE(t.links, '')
              || '</body></html>' AS html
          FROM urls u LEFT JOIN (SELECT doc_id, string_agg(a, '' ORDER BY j)
                                 AS links FROM atags GROUP BY doc_id) t
            USING (doc_id))"""

  /** DuckDB twin of [[removeDotSegments]] over a `/`-rooted (or empty) path
    * expression `p`: the SAME string-accumulator fold — `list_reduce`'s
    * seed is the list's first element, which for a `/`-rooted path is the
    * empty leading segment, i.e. exactly Spark `aggregate`'s `lit("")` zero
    * (and the lambda is identity on further empty segments, so the two
    * engines' seed conventions coincide). */
  private def dotsSqlOf(p: String): String = {
    val fold =
      s"""list_reduce(string_split($p, '/'), (acc, seg) ->
            CASE WHEN seg = '' OR seg = '.' THEN acc
                 WHEN seg = '..' THEN regexp_replace(acc, '/[^/]*$$', '')
                 ELSE acc || '/' || seg END)"""
    s"COALESCE(NULLIF($fold, ''), '/')"
  }

  /** CTE chain `... , lnk(src_url, href, anchor, dst_url)` — the extraction
    * twin: DuckDB's regexp_extract_all over the SAME pattern, then the same
    * RFC 3986 resolve (all four reference forms, [[resolveHref]]'s CASE
    * order) + canonicalize expressions. */
  def linksCteSql: String = {
    val baseDir =
      """CASE WHEN src_path = '' THEN '/'
              ELSE regexp_replace(src_path, '/[^/]*$', '/') END"""
    val resolved =
      s"""CASE
          WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN href
          WHEN starts_with(href, '//') THEN 'https://'
            || COALESCE(regexp_extract(href, '^//([^/?#]*)', 1), '')
            || ${dotsSqlOf("COALESCE(regexp_extract(href, '^//[^/?#]*([^?#]*)', 1), '')")}
            || rel_suffix
          WHEN starts_with(href, '/') THEN 'https://'
            || ${WebOps.canonHostSqlOf("src_url")}
            || ${dotsSqlOf("rel_path")} || rel_suffix
          WHEN starts_with(href, '#') THEN 'https://'
            || ${WebOps.canonHostSqlOf("src_url")} || src_path || src_query || href
          WHEN rel_path = '' THEN 'https://'
            || ${WebOps.canonHostSqlOf("src_url")} || src_path || rel_suffix
          ELSE 'https://' || ${WebOps.canonHostSqlOf("src_url")}
            || ${dotsSqlOf(s"($baseDir) || rel_path")} || rel_suffix
          END"""
    s"""$pagesCteSql,
        ext AS (SELECT doc_id, url,
            regexp_extract_all(html, '$LinkRe', 1) AS hrefs,
            regexp_extract_all(html, '$LinkRe', 2) AS anchs
          FROM pages),
        idx AS (SELECT doc_id, url, hrefs, anchs,
            unnest(generate_series(1, len(hrefs))) AS i FROM ext),
        raw AS (SELECT url AS src_url, hrefs[i] AS href, anchs[i] AS anchor
                FROM idx),
        rres AS (SELECT src_url, href, anchor,
            COALESCE(regexp_extract(href, '^[^?#]*', 0), '') AS rel_path,
            COALESCE(regexp_extract(href, '[?#].*$$', 0), '') AS rel_suffix,
            COALESCE(regexp_extract(src_url, '${WebOps.PathRe}', 1), '') AS src_path,
            COALESCE(regexp_extract(src_url, '(\\?[^#]*)', 1), '') AS src_query
          FROM raw),
        rslv AS (SELECT src_url, href, anchor, $resolved AS resolved FROM rres),
        lnk AS (SELECT src_url, href, anchor,
                  ${WebOps.canonUrlSqlOf("resolved")} AS dst_url FROM rslv)"""
  }
}
