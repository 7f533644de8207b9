package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.annotate.{Corpus, Expand, Filters, Scan, Scoring}
import graft.dict.{AnnotatorModel, AutomatonBuild, DictBuild}
import graft.emit.Triples
import graft.fixture.OntologyFixture
import graft.graph.Closure
import graft.ops.{AsOf, Dedup, LinkGraph, Multimodal, RangeJoin, Sampling, Similarity, Sketch, TextOps, WebOps}
import graft.streaming.EventStream

import graft.SparkEntry._

/** web-tier slice of the driver registry —
  * moved verbatim out of SparkEntry (round-5 hygiene split; the Seq→Map
  * assembly, duplicate gate and 1:1 queries↔oracles check stay in
  * [[SparkEntry]]). Shared helpers live on SparkEntry as
  * `private[graft]` members. 62 queries / 62 oracles. */
private[graft] object WebTier {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // per-language corpus datasheet: docs, token mass, mean quality — the
    // "datasheets for datasets" stratification report (lang-keyed hash agg
    // over per-doc map-side stats)
    // declared-vs-detected language confusion matrix: map-only detection
    // riding the corpus scan, one (declared, detected) hash agg, share
    // window over the langs²-row matrix
    "web_lang_consistency" -> ((s, dir) =>
      TextOps.langConsistency(docsTable(s, dir))),

    // URL canonicalization map over synthetic (deterministic) URLs
    "web_canonical" -> ((s, dir) => WebOps.canonicalize(docsTable(s, dir))),

    // crawl first-pass dedup: one hash aggregation on the canonical URL
    "web_url_dedup" -> ((s, dir) => WebOps.urlDedup(docsTable(s, dir))),

    // same-canonical-URL content conflicts (cloaking/staleness signal,
    // urlDedup's inconsistency report): canonical urls serving >1
    // distinct text — one agg with a two-phase countDistinct
    "web_url_conflicts" -> ((s, dir) =>
      WebOps.urlConflicts(docsTable(s, dir))),

    // per-domain corpus mix report (count / distinct pages / chars)
    "web_domain_stats" -> ((s, dir) => WebOps.domainStats(docsTable(s, dir))),

    // C4-style repeated-passage removal: first corpus-wide occurrence of
    // each token chunk survives; docs rebuilt from surviving chunks
    "web_chunk_dedup" -> ((s, dir) => WebOps.chunkDedup(docsTable(s, dir))),

    // hyperlink extraction from raw HTML: regexp_extract_all + posexplode,
    // relative hrefs resolved against the source host, both ends
    // canonicalized — the web-native KG-construction edge source
    "web_links" -> ((s, dir) =>
      LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))),

    // rel=canonical resolution: the page-DECLARED dup signal folded onto
    // canonical targets (map-only; the crawl-dedup key upgrade)
    "web_rel_canonical" -> ((s, dir) =>
      LinkGraph.relCanonical(
        LinkGraph.withCanonicalLink(LinkGraph.pages(docsTable(s, dir))))),

    // host-level link graph (canonical hosts, intra-host links dropped)
    "web_host_graph" -> ((s, dir) =>
      LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))),

    // Broder bow-tie decomposition of the page graph: CORE/IN/OUT/TENDRIL/
    // DISCONNECTED via three BFS fixpoints from a deterministic max-degree
    // probe (convergence require licenses the recursive-CTE oracle)
    "web_bowtie" -> ((s, dir) =>
      graft.graph.KgGraph.bowtie(
        LinkGraph.pageEdges(
          LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // ANF distance distribution of the host graph: FM-sketch neighborhood
    // function per radius (bit_or union — order-free, exactly deterministic);
    // the effective-diameter release-QA curve
    "web_anf" -> ((s, dir) =>
      graft.graph.KgGraph.anf(
        LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
          .select(col("src_host").as("src"), col("dst_host").as("dst")))),

    // one-row edge reciprocity of the host graph (link-farm rings → 1,
    // pure spam-target shapes → 0; organic webs sit in between)
    "web_reciprocity" -> ((s, dir) =>
      LinkGraph.reciprocity(
        LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // pay-level-domain (eTLD+1) rollup of the host graph: subdomain shards
    // collapse into registrable domains — the node set crawl quota/ranking
    // policy actually operates on
    "web_pld_graph" -> ((s, dir) =>
      LinkGraph.pldGraph(
        LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // log2-bucketed in/out degree histogram — the power-law sanity check
    // (bit-length bucketing, no float log at boundaries)
    "web_degree_dist" -> ((s, dir) =>
      LinkGraph.degreeDist(
        LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // per-TLD crawl-mix stats (page + distinct-host counts) — the coarsest
    // crawl-composition dashboard row; one short-key agg over canonical
    // hosts, map-only before it
    "web_tld_stats" -> ((s, dir) =>
      LinkGraph.pages(docsTable(s, dir))
        .select(WebOps.canonicalHost(col("url")).as("host"))
        .select(col("host"),
          element_at(split(col("host"), "\\."), -1).as("tld"))
        .groupBy("tld")
        .agg(count(lit(1)).as("n_pages"),
          countDistinct(col("host")).as("n_hosts"))),

    // per-target anchor-text table: top-3 anchors per canonical URL
    "web_anchor_text" -> ((s, dir) =>
      LinkGraph.anchorText(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))),

    // anchor-text ENTITY LINKING: the web leg meets the ontology leg — the
    // dictionary automaton annotates each distinct (dst_url, anchor) pair,
    // tagging pages with the concepts OTHER pages call them by
    "web_anchor_entities" -> ((s, dir) => {
      val anchors = LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))
        .select(col("dst_url").as("url"), col("anchor").as("text")).distinct()
      graft.annotate.NativeAnnotate.annotateMatches(anchors, model(s))
        .select(col("url").as("dst_url"), col("class_iri"), col("ont"))
        .distinct()
    }),

    // DIRECTED PageRank over the page-level link graph, dangling mass
    // redistributed per round (the oracle unrolls the same 5 rounds
    // including each round's dangling scalar)
    "web_pagerank" -> ((s, dir) =>
      graft.graph.KgGraph.pageRankDirected(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // FULL coreness decomposition of the page graph via h-index iteration
    // (kg_kcore answers one k; this emits every node's core number) —
    // exact-convergence loop licenses the oracle's fixed unroll
    "web_coreness" -> ((s, dir) =>
      graft.graph.KgGraph.coreness(LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // crawl-snapshot merge: latest capture per canonical URL across two
    // deterministic snapshots — one argmax hash aggregation (max(struct)),
    // never a window
    "web_crawl_merge" -> ((s, dir) =>
      WebOps.crawlMerge(WebOps.crawlSnapshots(docsTable(s, dir)))),

    // snapshot-to-snapshot diff: added / removed / changed / unchanged per
    // canonical URL (two argmax aggs + one full-outer join, hash-vs-hash)
    "web_crawl_diff" -> ((s, dir) =>
      WebOps.crawlDiff(WebOps.crawlSnapshotsWithContent(docsTable(s, dir)))),

    // reciprocal-link farms: host pairs linking BOTH ways, reciprocity =
    // min/max of the two directed counts
    "web_link_farms" -> ((s, dir) =>
      LinkGraph.linkFarms(LinkGraph.hostGraph(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // TrustRank + relative spam mass over the host graph; the 3 trusted
    // seed hosts are QUERY INPUT (a human-vetted whitelist), pinned
    // deterministically as the alphabetically-first hosts and collected
    // driver-side (same contract as web_ppr's seed set)
    "web_trustrank" -> ((s, dir) => {
      import s.implicits._
      // pinned: the seed collect below and trustRank's two PR loops all
      // read the materialized host graph, not the page-extraction lineage
      val hosts = LinkGraph.hostGraph(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      val seedNames = hosts.select(col("src_host").as("node"))
        .unionAll(hosts.select(col("dst_host").as("node"))).distinct()
        .orderBy("node").limit(3).collect().map(_.getString(0)).toSeq
      LinkGraph.trustRank(hosts, seedNames.toDF("node"))
    }),

    // threshold-sieved SimRank over the PAGE graph (Jeh & Widom 2002:
    // "similar pages are pointed at by similar pages") — 3 synchronous
    // rounds from the identity, hub cap 64, sieve 0.001, diagonal pinned;
    // canonical page_a < page_b off-diagonal pairs. The page graph, not
    // the host graph: this synthesis' host graph is a complete K4, where
    // SimRank degenerates to a uniform constant (the same reason
    // web_betweenness runs on pages)
    "web_simrank" -> ((s, dir) => {
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
        .select(col("src"), col("dst")).localCheckpoint()
      graft.graph.KgGraph.simRank(edges)
        .select(col("a").as("page_a"), col("b").as("page_b"), col("simrank"))
    }),

    // bounded-horizon Brandes betweenness from the 3 pinned sources (the
    // trustrank seed contract), over the PAGE graph — the host graph is
    // diameter-1 on this synthesis (betweenness degenerates to 0); pages
    // have real 4-hop structure (web_shortest_paths' levels). The seed
    // collect reads the pinned edge list, not the extraction lineage
    "web_betweenness" -> ((s, dir) => {
      import s.implicits._
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
        .select(col("src"), col("dst")).localCheckpoint()
      val seedNames = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst"))).distinct()
        .orderBy("node").limit(3).collect().map(_.getString(0)).toSeq
      graft.graph.KgGraph.betweenness(edges, seedNames.toDF("node"))
    }),

    // discrete power-law exponent MLE over page in-degree (Clauset,
    // Shalizi & Newman 2009, eq. 3.7 with xmin = 1): α̂ = 1 + n/Σ ln(2d) —
    // the scale-free-ness scalar every web-graph release card reports;
    // one degree agg + one 1-row fold
    "web_powerlaw" -> ((s, dir) => {
      val deg = LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(
          docsTable(s, dir))))
        .groupBy("dst").agg(count(lit(1)).as("d"))
      deg.agg(count(lit(1)).as("n_tail"),
          sum(log(col("d").cast("double") / lit(0.5))).as("s"))
        .select(col("n_tail"), lit(1).as("xmin"),
          round(lit(1.0) + col("n_tail").cast("double") / col("s"), 6)
            .as("alpha"))
    }),

    // 3-truss of the page graph (every surviving edge closes ≥1 triangle
    // after the cascading peel) — the EDGE-level community core next to
    // kg_kcore's node peeling; convergence-asserted fixpoint
    "web_ktruss" -> ((s, dir) =>
      graft.graph.KgGraph.ktruss(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(
          docsTable(s, dir)))).select(col("src"), col("dst")), k = 3)),

    // URL path templates over the extracted link targets (the crawler-trap
    // detector feeding per-host fetch budgets)
    "web_url_templates" -> ((s, dir) =>
      WebOps.urlTemplates(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))
        .select(col("dst_url").as("url")))),

    // co-citation: page pairs cited by the same source page (≥2 sources),
    // out-degree cap before the self-join
    "web_cocitation" -> ((s, dir) =>
      LinkGraph.coCitation(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))),

    // bibliographic coupling (Kessler 1963): the dual — source pairs
    // sharing ≥2 link targets, in-degree cap before the self-join
    "web_bibcoupling" -> ((s, dir) =>
      LinkGraph.bibCoupling(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))),

    // sitemap.xml vs crawl: per-host declared-URL gap (n_listed /
    // n_crawled / n_new) — the discovery complement of the link frontier
    "web_sitemap_gap" -> ((s, dir) =>
      graft.ops.WebOps.sitemapGap(docsTable(s, dir))),

    // rel=next pagination-chain reassembly: pointer doubling with position
    // accumulation (list ranking), one root-keyed merge agg
    "web_page_chains" -> ((s, dir) =>
      graft.ops.WebOps.pageChains(docsTable(s, dir))),

    // soft-404 / parked-template detection: identical text at >= 2 distinct
    // canonical URLs on one host — one (host, text) agg over the injected
    // error-template synthesis
    "web_soft404" -> ((s, dir) =>
      graft.ops.WebOps.soft404(
        graft.ops.WebOps.withSoft404(docsTable(s, dir)))),

    // Cho–Garcia-Molina change-rate estimation over an 8-visit capture
    // history: per-URL lag window + one agg; λ̂ via the +0.5 continuity
    // correction
    "web_change_rate" -> ((s, dir) =>
      graft.ops.WebOps.changeRate(
        graft.ops.WebOps.crawlHistory(docsTable(s, dir)))),

    // redirect-chain resolution by pointer doubling: maxHops=8 in three
    // self-joins; the 2-cycle at ids ≡ 21 (mod 50) must come back looped
    "web_redirects" -> ((s, dir) =>
      WebOps.resolveRedirects(WebOps.redirectEdges(docsTable(s, dir)))),

    // CCNet-style per-host template strip: the synthesized nav + copyright
    // lines (100% of each host's pages) vanish, the promo line (~1/3)
    // and the content lines survive
    "web_boilerplate" -> ((s, dir) =>
      WebOps.boilerplateStrip(WebOps.withNavLines(docsTable(s, dir)))),

    // mirror-host detection: host pairs serving ≥2 identical texts (the
    // synthesis serves every fourth text from a second, shifted host), a
    // hot-hash cap before the self-join, containment vs the smaller host
    "web_mirror_hosts" -> ((s, dir) =>
      WebOps.mirrorHosts(WebOps.withMirrors(docsTable(s, dir)))),

    // hash-layout edge-cut pre-flight over the page link graph: per
    // partition, how much out-edge mass stays local under hash(node) % P —
    // the co-partitioning decision input for the iterative graph tier
    "web_edge_cut" -> ((s, dir) =>
      LinkGraph.edgeCutStats(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // Spinner-style label-propagation partitioning: 3 deterministic
    // balance-penalized LP rounds from the hash placement, rolled up as
    // the same per-partition locality stats as web_edge_cut — the layout
    // IMPROVER next to the pre-flight that prices it
    "web_partition_lp" -> ((s, dir) =>
      LinkGraph.partitionLp(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // DeepWalk-style deterministic walk corpus over the page graph — the
    // graph-embedding training-data prep
    "web_walks" -> ((s, dir) =>
      graft.graph.KgGraph.randomWalks(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))),
        length = 4)),

    // node2vec second-order biased walks (p=4, q=1/4 as exact ×4 integer
    // weights) — step 1 uniform, then cumulative-weight-interval picks
    // under the portable hash draw; DeepWalk's sibling walk corpus
    "web_node2vec" -> ((s, dir) =>
      graft.graph.KgGraph.node2vecWalks(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))),
        length = 4)),

    // skip-gram (center, context) pairs from the walk corpus, window 2 —
    // what actually feeds word2vec-style embedding training. Walks pinned
    // once; ONE self-join per walk id with the step-distance band in the
    // join condition (each walk is ≤ length+1 rows, so the band join is
    // bounded per key)
    "web_walk_pairs" -> ((s, dir) => {
      val w = graft.graph.KgGraph.randomWalks(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))),
        length = 4).localCheckpoint()
      val a = w.select(col("start"), col("step").as("si"), col("node").as("center"))
      val b = w.select(col("start"), col("step").as("sj"), col("node").as("context"))
      a.join(b, Seq("start"))
        .filter(col("si") =!= col("sj") &&
          abs(col("si") - col("sj")) <= 2)
        .groupBy("center", "context").agg(count(lit(1)).as("n_pairs"))
    }),

    // one full-batch SGNS step over the walk-pair corpus — the word2vec
    // trainer the DeepWalk prep exists FOR (walks → pairs → embedding
    // update, end-to-end), per-center softplus loss before/after; the
    // "it learns" direction is gated in KgGraphSpec
    "web_sgns_step" -> ((s, dir) =>
      graft.ops.KgEmbed.sgnsStep(SparkEntry.queries("web_walk_pairs")(s, dir))),

    // crawl politeness scheduling: per-host fetch slots at a fixed delay —
    // slot rank is a PER-HOST window (deterministic by canonical URL), so
    // the frontier turns into a time-stamped fetch plan with no global sort
    "web_fetch_schedule" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("host").orderBy("canon_url")
      WebOps.urlDedup(docsTable(s, dir))
        .select(col("canon_url"),
          WebOps.canonicalHost(col("canon_url")).as("host"))
        .select(col("host"), col("canon_url"),
          (row_number().over(w) - 1).as("slot"))
        .select(col("host"), col("canon_url"), col("slot"),
          (col("slot") * 15L).as("fetch_offset_sec"))
    }),

    // neighborhood-function probe (the HyperANF shape — Boldi, Rosa &
    // Vigna 2011: per-node reachable-set sizes via mergeable cardinality
    // sketches): |distinct nodes within ≤2 out-hops| per page, computed
    // EXACTLY alongside the HLL++ estimate and gated in-plan (10 % or ±1 —
    // the q_distinct_approx contract). At 10^12 nodes the exact distinct
    // is infeasible and the sketch column IS the algorithm; here the exact
    // side doubles as the oracle's pin. One self-join (2-hop expansion,
    // dst-keyed) + one src-keyed distinct agg
    "web_neighborhood" -> ((s, dir) => {
      val e = LinkGraph.pageEdges(
          LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
        .select(col("src"), col("dst")).localCheckpoint()
      val twoHop = e.select(col("src"), col("dst").as("mid"))
        .join(e.select(col("src").as("mid"), col("dst").as("hop2")),
          Seq("mid"))
        .select(col("src"), col("hop2").as("n"))
      val reach = e.select(col("src"), col("dst").as("n")).unionAll(twoHop)
      reach.groupBy("src")
        .agg(count_distinct(col("n")).as("exact_n"),
          approx_count_distinct(col("n"), 0.02).as("est"))
        .select(col("src"), col("exact_n"),
          (abs(col("est") - col("exact_n")) <=
            greatest(lit(1.0), lit(0.10) * col("exact_n")))
            .as("within_bound"))
    }),

    // incremental PageRank maintenance: cold 5-round v1 run → publish →
    // edge churn (hash-selected 10% of edges gain a reverse link, counts
    // merged) → 2 warm rounds resumed from the published ranks. e1 pinned
    // (feeds the delta, the union, and the cold run)
    "web_pagerank_warm" -> ((s, dir) => {
      val e1 = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      val delta = e1.filter(pmod(graft.ops.Sketch.hash60(
          concat(col("src"), lit("|"), col("dst"))), lit(10)) === 0)
        .select(col("dst").as("src"), col("src").as("dst"), col("n_links"))
      val e2 = e1.unionAll(delta).groupBy("src", "dst")
        .agg(sum(col("n_links")).as("n_links"))
      graft.graph.KgGraph.pageRankWarmStart(e2,
        graft.graph.KgGraph.pageRankDirected(e1, iters = 5), iters = 2)
    }),

    // personalized PageRank: teleport + dangling mass to the 5
    // lexicographically-first pages — rank concentrates near the seeds
    "web_ppr" -> ((s, dir) => {
      import s.implicits._
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
      // seeds are QUERY INPUT (an entity set); collecting the 5 names to
      // the driver keeps the corpus-sized extraction lineage out of the
      // seed frame (which pageRankPersonalized evaluates twice)
      val seedNames = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
        .orderBy("node").limit(5).collect().map(_.getString(0)).toSeq
      graft.graph.KgGraph.pageRankPersonalized(edges, seedNames.toDF("node"))
    }),

    // crawl frontier: link targets minus the crawled set — one anti-join
    "web_frontier" -> ((s, dir) => {
      val pages = LinkGraph.pages(docsTable(s, dir))
      LinkGraph.frontier(pages, LinkGraph.links(pages))
    }),

    // PRIORITIZED frontier (the OPIC idea): each uncrawled target scored by
    // the summed PageRank of its distinct linking pages — the fetch-order
    // artifact a crawler scheduler consumes. Rank mass rides as EXACT
    // micro-PR integers (round(pr·10⁶) per source, summed as longs), so the
    // score is partitioning-independent; the PR table is node-keyed and the
    // contrib join is the link table's own key — no new shuffle shapes.
    "web_frontier_scored" -> ((s, dir) => {
      val pages = LinkGraph.pages(docsTable(s, dir))
      val links = LinkGraph.links(pages)
      val fr = LinkGraph.frontier(pages, links)
      val pr = graft.graph.KgGraph.pageRankDirected(
        LinkGraph.pageEdges(links), iters = 5)
      // semi-join the contribution stream down to frontier targets BEFORE
      // the per-target aggregation: crawled pages are most link targets on
      // a real graph, and their distinct+sum work would be discarded by
      // the final inner join anyway (result-identical)
      val contrib = links
        .select(WebOps.canonicalUrl(col("src_url")).as("src"),
          col("dst_url").as("page")).distinct()
        .join(fr, Seq("page"), "left_semi")
        .join(pr.select(col("page").as("src"), col("pagerank")), Seq("src"))
        .groupBy("page")
        .agg(countDistinct(col("src")).as("n_inlinks"),
          sum(round(col("pagerank") * lit(1000000.0), 0).cast("long"))
            .as("priority_micro"))
      fr.join(contrib, Seq("page"))
        .select(col("page"), col("n_inlinks"), col("priority_micro"))
    }),

    // HITS hubs/authorities over the same directed page graph (L1-normalized
    // per half-round; the oracle unrolls both halves of all 5 rounds)
    "web_hits" -> ((s, dir) =>
      graft.graph.KgGraph.hits(
        LinkGraph.pageEdges(LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // SALSA in Najork's closed form over the HOST graph: authority =
    // component-share-weighted in-degree within each bipartite support
    // component — one component labeling + two degree aggs, no
    // mutual-reinforcement rounds (and no TKC drift on link farms)
    "web_salsa" -> ((s, dir) =>
      graft.graph.KgGraph.salsa(
        LinkGraph.hostGraph(LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
          .select(col("src_host").as("src"), col("dst_host").as("dst")))),

    // multi-source BFS crawl-depth: min hops from the seed set (canonical
    // /p/0 pages) over the directed page-link graph, bounded depth 4
    "web_shortest_paths" -> ((s, dir) => {
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
      val seeds = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
        .filter(col("node").rlike("/p/1($|\\?)"))
      graft.graph.KgGraph.shortestPaths(edges, seeds, maxDepth = 4)
    }),

    // targeted-attack robustness curve (Albert, Jeong & Barabási, Nature
    // 2000): remove the top-k in-degree hubs (k = 0/5/10), re-run
    // connected components, report the giant-component fraction — the
    // web-graph release stat that says how hub-dependent connectivity is.
    // The hub list is QUERY INPUT (top-10 collect, the PPR seed
    // contract); each k is one star-contraction run over the hub-filtered
    // edge set; isolated survivors count as singletons
    "web_robustness" -> ((s, dir) =>
      graft.graph.KgGraph.attackRobustness(LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // the AJB FAILURE curve: the same protocol with hash-ordered (i.e.
    // deterministic-uniform) removal — the attack-vs-failure gap is the
    // scale-free signature, read next to web_robustness
    "web_robustness_random" -> ((s, dir) =>
      graft.graph.KgGraph.attackRobustness(LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))),
        random = true)),

    // rich-club coefficient curve (Colizza 2006): edge density among
    // nodes of degree > k for k = 1/2/4/8 — do hubs preferentially
    // interlink; one degree agg + broadcast thresholds, exact counts
    "web_rich_club" -> ((s, dir) =>
      graft.graph.KgGraph.richClub(LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // landmark distance estimation audit (Potamias 2009 — the production
    // pairwise-distance path at 10^12 nodes): per-(source, node) exact
    // bounded-depth distance vs min_l d(s,l)+d(l,v) upper bound + stretch;
    // sources = the /p/1 seed rule, landmarks = the /p/2 rule
    "web_landmark_dist" -> ((s, dir) => {
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      val nodes = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
      graft.graph.KgGraph.landmarkDistances(edges,
        nodes.filter(col("node").rlike("/p/1($|\\?)")),
        nodes.filter(col("node").rlike("/p/2($|\\?)")))
    }),

    // seed-sampled harmonic centrality estimate (Eppstein–Wang shape) over
    // the same seed rule — per-seed BFS, reciprocals summed as exact
    // integers (lcm-12 trick), one division at the end
    "web_harmonic" -> ((s, dir) => {
      // pinned (the web_landmark_dist precedent): the seed filter and the
      // BFS's own edge pin otherwise EACH evaluate the page-extraction
      // lineage — one full corpus pass per consumer
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      val seeds = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
        .filter(col("node").rlike("/p/1($|\\?)"))
      graft.graph.KgGraph.harmonicFromSeeds(edges, seeds, maxDepth = 4)
    }),

    // fetch-list hygiene: blocklisted hosts + trap/binary URL patterns
    "web_url_filter" -> ((s, dir) => WebOps.urlFilter(docsTable(s, dir))),

    // RFC 9309 robots verdicts: longest-matching-prefix rule, Allow wins
    // length ties, no match → allowed (broadcast rules + one argmax agg)
    "web_robots" -> ((s, dir) => WebOps.robotsFilter(docsTable(s, dir))),

    // per-domain page quota: ≤50 pages per canonical host, selected by
    // portable hash of the canonical URL (unbiased + cross-engine stable)
    "web_domain_quota" -> ((s, dir) =>
      WebOps.domainQuota(docsTable(s, dir), quota = 50)),

    // same contract, mega-host-safe plan: count → hash-threshold prefilter
    // → broadcast underflow fallback → exact window top-up over survivors;
    // ONE oracle proves both forms equal
    "web_domain_quota2" -> ((s, dir) =>
      WebOps.domainQuotaTwoPhase(docsTable(s, dir), quota = 50)),

    // hreflang alternate clusters: the page-DECLARED language-variant
    // grouping (one logical document, N language editions) — extraction is
    // map-only, the cluster key needs exactly one per-page window
    "web_hreflang_clusters" -> ((s, dir) =>
      LinkGraph.hreflangClusters(
        LinkGraph.withHreflangLinks(LinkGraph.pages(docsTable(s, dir))))),
  )

  val oracles: Seq[(String, String)] = Seq(
    // canonical-host TLD rollup over the synthesized page urls
    "web_tld_stats" ->
      s"""WITH ${graft.ops.LinkGraph.pagesCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("url")} AS host
                    FROM pages)
          SELECT string_split(host, '.')[-1] AS tld,
                 CAST(COUNT(*) AS BIGINT) AS n_pages,
                 CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
          FROM hosts GROUP BY 1""",

    "web_canonical" ->
      s"""WITH ${WebOps.canonCteSql}
          SELECT doc_id, url, canon_url FROM canon""",

    "web_url_dedup" ->
      s"""WITH ${WebOps.canonCteSql}
          SELECT canon_url, COUNT(*) AS n_docs, MIN(url) AS keep_url
          FROM canon GROUP BY 1""",

    "web_url_conflicts" ->
      s"""WITH cu AS (SELECT ${WebOps.urlSqlExpr} AS url, text
                      FROM documents),
          cc AS (SELECT ${WebOps.canonUrlSqlOf("url")} AS canon_url, text
                 FROM cu)
          SELECT canon_url, COUNT(*) AS n_docs,
            CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts
          FROM cc GROUP BY 1
          HAVING COUNT(DISTINCT text) >= 2""",

    "web_domain_stats" ->
      s"""WITH ${WebOps.canonCteSql}
          SELECT host AS domain, COUNT(*) AS n_docs,
                 COUNT(DISTINCT canon_url) AS n_pages,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM canon GROUP BY 1""",

    // chunking mirrored with list_slice windows; "first occurrence" via a
    // row_number window (the oracle may be lazy where the engine must not);
    // docs whose every chunk occurred earlier elsewhere rebuild to ''
    "web_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          n AS (SELECT doc_id, t,
                       CAST(ceil(len(t) / CAST(20 AS DOUBLE)) AS INT) AS nc
                FROM toks),
          ch AS (SELECT doc_id, i AS pos,
                        array_to_string(list_slice(t, i*20 + 1, i*20 + 20), ' ') AS chunk
                 FROM (SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS i
                       FROM n)),
          fst AS (SELECT chunk, doc_id, pos FROM (
                    SELECT chunk, doc_id, pos,
                           ROW_NUMBER() OVER (PARTITION BY chunk
                                              ORDER BY doc_id, pos) AS rn
                    FROM ch) WHERE rn = 1),
          kept AS (SELECT ch.doc_id, ch.pos, ch.chunk
                   FROM ch JOIN fst ON fst.chunk = ch.chunk
                     AND fst.doc_id = ch.doc_id AND fst.pos = ch.pos),
          rb AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS text_dedup
                 FROM kept GROUP BY 1)
          SELECT d.doc_id, COALESCE(rb.text_dedup, '') AS text_dedup
          FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id""",

    // pages twin + the same link-tag append, extraction via the same
    // regex, both legs canonicalized by the shared expression builders
    "web_rel_canonical" ->
      s"""WITH ${graft.ops.LinkGraph.pagesCteSql},
          p2 AS (SELECT doc_id, url,
              html || CASE WHEN doc_id % 9 = 2
                THEN '<link rel="canonical" href="'
                  || ${graft.ops.WebOps.urlSqlExprOf("doc_id % 40")} || '">'
                ELSE '' END AS html
            FROM pages),
          x AS (SELECT doc_id, url,
              regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1) AS decl
            FROM p2)
          SELECT doc_id, ${graft.ops.WebOps.canonUrlSqlOf("url")} AS page_url,
            CASE WHEN decl IS NULL OR decl = ''
                 THEN ${graft.ops.WebOps.canonUrlSqlOf("url")}
                 ELSE ${graft.ops.WebOps.canonUrlSqlOf("decl")} END AS canonical_target,
            (decl IS NOT NULL AND decl <> '') AS declared
          FROM x""",

    // HTML rebuilt by the synthesis twin, then DuckDB's own
    // regexp_extract_all over the SAME pattern + the same resolve/canon
    // expressions — cross-checks the whole extraction leg
    "web_links" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql}
          SELECT src_url, href, anchor, dst_url FROM lnk""",

    "web_host_graph" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src_host,
                           ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst_host
                    FROM lnk)
          SELECT src_host, dst_host, COUNT(*) AS n_links
          FROM hosts WHERE src_host <> dst_host GROUP BY 1, 2""",

    "web_anf" -> anfOracleSql(rounds = 4, trials = 8),

    // same probe rule (max degree, node tie-break); reaches as TRUE
    // recursive CTEs — the Spark side's empty-frontier fixpoint must land
    // on exactly this transitive closure
    "web_coreness" -> corenessOracleSql(iters = 30),

    "web_bowtie" ->
      s"""WITH RECURSIVE ${graft.ops.LinkGraph.linksCteSql},
          e0 AS (SELECT ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                        dst_url AS dst FROM lnk),
          e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
          nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          deg AS (SELECT node, COUNT(*) AS d FROM
            (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
            GROUP BY 1),
          seed AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
          fwd AS (SELECT node FROM seed
                  UNION SELECT e.dst FROM fwd JOIN e ON e.src = fwd.node),
          bwd AS (SELECT node FROM seed
                  UNION SELECT e.src FROM bwd JOIN e ON e.dst = bwd.node),
          ue AS (SELECT src, dst FROM e
                 UNION SELECT dst AS src, src AS dst FROM e),
          fb AS (SELECT node FROM fwd UNION SELECT node FROM bwd),
          wk AS (SELECT node FROM fb
                 UNION SELECT ue.dst FROM wk JOIN ue ON ue.src = wk.node)
          SELECT n.node,
            CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'CORE'
                 WHEN b.node IS NOT NULL THEN 'IN'
                 WHEN f.node IS NOT NULL THEN 'OUT'
                 WHEN t.node IS NOT NULL THEN 'TENDRIL'
                 ELSE 'DISCONNECTED' END AS cls
          FROM nodes n
          LEFT JOIN fwd f ON n.node = f.node
          LEFT JOIN bwd b ON n.node = b.node
          LEFT JOIN wk t ON n.node = t.node""",

    // host-graph chain → reversed-key self left-join (post-agg keys are
    // unique, no fan-out) → 1-row moments; division order mirrored, 6dp
    "web_reciprocity" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src_host,
                           ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst_host
                    FROM lnk),
          hg AS (SELECT src_host, dst_host FROM hosts
                 WHERE src_host <> dst_host GROUP BY 1, 2),
          agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                    CAST(SUM(CASE WHEN r.src_host IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal
                  FROM hg e LEFT JOIN hg r
                    ON e.src_host = r.dst_host AND e.dst_host = r.src_host)
          SELECT n_edges, n_reciprocal,
                 ROUND(n_reciprocal / n_edges, 6) AS reciprocity
          FROM agg""",

    // host-graph chain → shared PLD CASE expression on both endpoints →
    // intra-PLD drop → one short-key rollup
    "web_pld_graph" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src_host,
                           ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst_host
                    FROM lnk),
          hg AS (SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
                 FROM hosts WHERE src_host <> dst_host GROUP BY 1, 2),
          pe AS (SELECT ${graft.ops.WebOps.pldSqlOf("src_host")} AS src_pld,
                        ${graft.ops.WebOps.pldSqlOf("dst_host")} AS dst_pld,
                        n_links
                 FROM hg)
          SELECT src_pld, dst_pld, CAST(SUM(n_links) AS BIGINT) AS n_links
          FROM pe WHERE src_pld <> dst_pld GROUP BY 1, 2""",

    "web_anchor_text" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          cnt AS (SELECT dst_url, anchor, COUNT(*) AS n FROM lnk GROUP BY 1, 2),
          r AS (SELECT dst_url, anchor, n,
                  ROW_NUMBER() OVER (PARTITION BY dst_url
                                     ORDER BY n DESC, anchor) AS rank
                FROM cnt)
          SELECT dst_url, anchor, n, CAST(rank AS INT) AS rank
          FROM r WHERE rank <= 3""",

    "web_pagerank" -> pageRankDirectedOracleSql(iters = 5),

    // the dictionary regexp twin over the distinct anchor strings — the
    // same directCte shape applied to anchors instead of documents
    "web_anchor_entities" ->
      s"""WITH $dictCte, ${graft.ops.LinkGraph.linksCteSql},
          aset AS (SELECT DISTINCT dst_url, anchor FROM lnk)
          SELECT DISTINCT a.dst_url, d.class_iri, d.ont
          FROM aset a, dict d
          WHERE regexp_matches(upper(a.anchor), '\\b' || d.term || '\\b')""",

    "web_hits" -> hitsOracleSql(iters = 5),

    // closed-form SALSA twin: bipartite support components via a TRUE
    // recursive reach CTE (host graph — tiny), then the Najork
    // component-share-weighted degree formula with the SAME left-assoc
    // double arithmetic ((n_c/t)*deg)/s_c, 6dp
    "web_salsa" ->
      s"""WITH RECURSIVE ${graft.ops.LinkGraph.linksCteSql},
          he AS (SELECT DISTINCT
              ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src,
              ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst
            FROM lnk
            WHERE ${graft.ops.WebOps.canonHostSqlOf("src_url")}
               <> ${graft.ops.WebOps.canonHostSqlOf("dst_url")}),
          und AS (SELECT 'h:' || src AS a, 'a:' || dst AS b FROM he
                  UNION SELECT 'a:' || dst, 'h:' || src FROM he),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component
                   FROM reach GROUP BY a),
          adeg AS (SELECT dst AS node, COUNT(*) AS deg FROM he GROUP BY 1),
          hdeg AS (SELECT src AS node, COUNT(*) AS deg FROM he GROUP BY 1),
          aj AS (SELECT d.node, d.deg, c.component
                 FROM adeg d JOIN comp c ON c.node = 'a:' || d.node),
          hj AS (SELECT d.node, d.deg, c.component
                 FROM hdeg d JOIN comp c ON c.node = 'h:' || d.node),
          atot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM aj),
          htot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM hj),
          aper AS (SELECT component, CAST(COUNT(*) AS DOUBLE) AS n_c,
                     CAST(SUM(deg) AS DOUBLE) AS s_c FROM aj GROUP BY 1),
          hper AS (SELECT component, CAST(COUNT(*) AS DOUBLE) AS n_c,
                     CAST(SUM(deg) AS DOUBLE) AS s_c FROM hj GROUP BY 1),
          ascore AS (SELECT aj.node, aper.n_c / atot.t * aj.deg / aper.s_c AS a
                     FROM aj JOIN aper USING (component), atot),
          hscore AS (SELECT hj.node, hper.n_c / htot.t * hj.deg / hper.s_c AS h
                     FROM hj JOIN hper USING (component), htot)
          SELECT COALESCE(h.node, a.node) AS page,
                 ROUND(COALESCE(h.h, CAST(0 AS DOUBLE)), 6) AS salsa_hub,
                 ROUND(COALESCE(a.a, CAST(0 AS DOUBLE)), 6) AS salsa_authority
          FROM hscore h FULL OUTER JOIN ascore a ON a.node = h.node""",

    "web_ppr" -> pprOracleSql(iters = 5, nSeeds = 5),

    "web_pagerank_warm" -> warmPrOracleSql(itersCold = 5, itersWarm = 2),

    "web_walks" -> walksOracleSql(length = 4),

    "web_node2vec" -> node2vecOracleSql(length = 4),

    "web_neighborhood" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          pedges AS MATERIALIZED (SELECT DISTINCT
              ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
              dst_url AS dst FROM lnk),
          twohop AS (SELECT a.src, b.dst AS n
            FROM pedges a JOIN pedges b ON b.src = a.dst),
          reach AS (SELECT src, dst AS n FROM pedges
                    UNION ALL SELECT src, n FROM twohop)
          SELECT src, COUNT(DISTINCT n) AS exact_n, true AS within_bound
          FROM reach GROUP BY 1""",

    "web_walk_pairs" ->
      s"""WITH walks AS MATERIALIZED (
            SELECT * FROM (${walksOracleSql(length = 4)}) w)
          SELECT a.node AS center, b.node AS context, COUNT(*) AS n_pairs
          FROM walks a JOIN walks b
            ON b.start = a.start AND b.step <> a.step
            AND ABS(a.step - b.step) <= 2
          GROUP BY 1, 2""",

    "web_sgns_step" -> sgnsStepOracleSql,

    "web_fetch_schedule" ->
      s"""WITH ${graft.ops.WebOps.canonCteSql},
          du AS (SELECT DISTINCT canon_url FROM canon),
          hu AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("canon_url")} AS host,
                        canon_url FROM du)
          SELECT host, canon_url,
            CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY canon_url) - 1
              AS INT) AS slot,
            CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY canon_url) - 1)
              * 15 AS BIGINT) AS fetch_offset_sec
          FROM hu""",

    "web_frontier" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql}
          SELECT DISTINCT dst_url AS page FROM lnk
          EXCEPT
          SELECT DISTINCT ${graft.ops.WebOps.canonUrlSqlOf("url")} AS page
          FROM pages""",

    // the PR chain (exact web_pagerank scaffold) + the frontier EXCEPT +
    // per-target micro-PR integer sums over distinct linking sources
    "web_frontier_scored" ->
      s"""WITH $pageEdgesPrScaffoldSql,
          nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
          unodes AS MATERIALIZED (SELECT node,
              CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
          pr0 AS (SELECT node, t AS pr FROM unodes),
          ${prRoundsCtesSql(5, "pr", "unodes")},
          prt AS (SELECT node, ROUND(pr, 6) AS pagerank FROM pr5),
          crawled AS (SELECT DISTINCT ${graft.ops.WebOps.canonUrlSqlOf("url")}
                        AS page FROM pages),
          fr AS (SELECT DISTINCT dst_url AS page FROM lnk
                 WHERE dst_url NOT IN (SELECT page FROM crawled)),
          contrib AS (SELECT DISTINCT
                        ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                        dst_url AS page
                      FROM lnk),
          sc AS (SELECT c.page,
                   CAST(COUNT(DISTINCT c.src) AS BIGINT) AS n_inlinks,
                   CAST(SUM(CAST(ROUND(p.pagerank * 1000000, 0) AS BIGINT))
                     AS BIGINT) AS priority_micro
                 FROM contrib c JOIN prt p ON p.node = c.src GROUP BY 1)
          SELECT f.page, sc.n_inlinks, sc.priority_micro
          FROM fr f JOIN sc ON sc.page = f.page""",

    "web_crawl_merge" ->
      s"""WITH s1 AS (SELECT doc_id, ${graft.ops.WebOps.urlSqlExpr} AS url,
              1 AS snapshot, 1700000000 + doc_id * 60 AS fetch_epoch
            FROM documents),
          snaps AS (SELECT * FROM s1 UNION ALL
            SELECT doc_id, url, 2 AS snapshot, fetch_epoch + 604800
            FROM s1 WHERE doc_id % 3 = 0),
          c AS (SELECT ${graft.ops.WebOps.canonUrlSqlOf("url")} AS canon_url,
                  doc_id, snapshot, fetch_epoch FROM snaps),
          r AS (SELECT canon_url, doc_id, snapshot, fetch_epoch,
                  ROW_NUMBER() OVER (PARTITION BY canon_url
                    ORDER BY fetch_epoch DESC, snapshot DESC, doc_id DESC) AS rn,
                  COUNT(*) OVER (PARTITION BY canon_url) AS n_captures
                FROM c)
          SELECT canon_url, n_captures, fetch_epoch AS last_epoch,
                 snapshot AS last_snapshot, doc_id AS keep_doc
          FROM r WHERE rn = 1""",

    // snapshot synthesis twin (content hashes + fresh-host additions), two
    // latest-capture windows, full-outer status CASE
    "web_crawl_diff" ->
      s"""WITH d1 AS (SELECT doc_id, ${graft.ops.WebOps.urlSqlExpr} AS url, text
            FROM documents),
          s AS (SELECT doc_id, url, 1 AS snapshot,
                  1700000000 + doc_id * 60 AS fetch_epoch,
                  md5(text) AS content_hash FROM d1
                UNION ALL
                SELECT doc_id, url, 2, 1700000000 + doc_id * 60 + 604800,
                  md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2' ELSE text END)
                FROM d1 WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 'https://fresh.example/p/' || doc_id, 2,
                  1700000000 + doc_id * 60 + 604800, md5(text)
                FROM d1 WHERE doc_id % 11 = 1),
          c AS (SELECT ${graft.ops.WebOps.canonUrlSqlOf("url")} AS canon_url,
                  snapshot, fetch_epoch, doc_id, content_hash FROM s),
          l1 AS (SELECT canon_url, content_hash AS h_a FROM
                  (SELECT canon_url, content_hash, ROW_NUMBER() OVER
                     (PARTITION BY canon_url
                      ORDER BY fetch_epoch DESC, doc_id DESC) AS rn
                   FROM c WHERE snapshot = 1) WHERE rn = 1),
          l2 AS (SELECT canon_url, content_hash AS h_b FROM
                  (SELECT canon_url, content_hash, ROW_NUMBER() OVER
                     (PARTITION BY canon_url
                      ORDER BY fetch_epoch DESC, doc_id DESC) AS rn
                   FROM c WHERE snapshot = 2) WHERE rn = 1)
          SELECT COALESCE(l1.canon_url, l2.canon_url) AS canon_url,
                 CASE WHEN l2.canon_url IS NULL THEN 'removed'
                      WHEN l1.canon_url IS NULL THEN 'added'
                      WHEN h_a = h_b THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM l1 FULL OUTER JOIN l2 ON l1.canon_url = l2.canon_url""",

    // per-host content-hash sets, hot-hash cap, host-pair self-join — the
    // same md5 keys, cap, and containment arithmetic
    "web_mirror_hosts" ->
      s"""WITH u AS (SELECT ${graft.ops.WebOps.urlSqlExpr} AS url, text
                     FROM documents
                     UNION ALL
                     SELECT 'https://'
                       || ([${graft.ops.WebOps.domainsSqlList}])[CAST((doc_id + 3) % 7 AS INT) + 1]
                       || '/m/' || CAST(doc_id % 40 AS VARCHAR), text
                     FROM documents WHERE doc_id % 4 = 1),
          hh AS (SELECT DISTINCT ${graft.ops.WebOps.canonHostSqlOf("url")} AS host,
                   md5(text) AS h FROM u),
          capped AS (SELECT host, h FROM
                      (SELECT host, h, COUNT(*) OVER (PARTITION BY h) AS nh FROM hh)
                     WHERE nh <= 50),
          tot AS (SELECT host, COUNT(*) AS n FROM hh GROUP BY 1),
          sh AS (SELECT l.host AS host_a, r.host AS host_b, COUNT(*) AS shared
                 FROM capped l JOIN capped r ON l.h = r.h AND l.host < r.host
                 GROUP BY 1, 2)
          SELECT s.host_a, s.host_b, s.shared,
            ROUND(CAST(s.shared AS DOUBLE) / CAST(LEAST(ta.n, tb.n) AS DOUBLE), 6)
              AS containment
          FROM sh s JOIN tot ta ON ta.host = s.host_a
                    JOIN tot tb ON tb.host = s.host_b
          WHERE s.shared >= 2""",

    "web_edge_cut" -> edgeCutOracleSql,

    "web_partition_lp" -> partitionLpOracleSql,

    "web_link_farms" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          hg AS (SELECT sh AS src_host, dh AS dst_host, COUNT(*) AS n
                 FROM (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS sh,
                              ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dh
                       FROM lnk)
                 WHERE sh <> dh GROUP BY 1, 2),
          f AS (SELECT src_host AS host_a, dst_host AS host_b, n AS ab
                FROM hg WHERE src_host < dst_host),
          r AS (SELECT dst_host AS host_a, src_host AS host_b, n AS ba
                FROM hg WHERE src_host > dst_host)
          SELECT f.host_a, f.host_b, f.ab, r.ba,
            ROUND(CAST(LEAST(f.ab, r.ba) AS DOUBLE)
              / CAST(GREATEST(f.ab, r.ba) AS DOUBLE), 6) AS reciprocity
          FROM f JOIN r USING (host_a, host_b)
          WHERE f.ab >= 1 AND r.ba >= 1""",

    "web_trustrank" -> trustRankOracleSql(iters = 5, nSeeds = 3),

    "web_simrank" ->
      simRankOracleSql(iters = 3, c = 0.8, degCap = 64, minScore = 0.001),

    "web_betweenness" -> betweennessOracleSql(maxDepth = 4, nSeeds = 3),

    "web_ktruss" -> ktrussOracleSql(k = 3, iters = 6),

    // CSN eq. 3.7 twin: same in-degree agg, ln(d/0.5) sums, 6dp on α only
    "web_powerlaw" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          pe AS (SELECT DISTINCT
              ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS a, dst_url AS b
            FROM lnk),
          deg AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS d FROM pe GROUP BY 1)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_tail, 1 AS xmin,
            ROUND(CAST(1 AS DOUBLE)
              + COUNT(*) / SUM(ln(CAST(d AS DOUBLE) / 0.5)), 6) AS alpha
          FROM deg""",

    "web_url_templates" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          t AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS host,
                       ${graft.ops.WebOps.canonUrlSqlOf("dst_url")} AS canon_url,
                       ${graft.ops.WebOps.pathTemplateSqlOf("dst_url")} AS path_template
                FROM lnk)
          SELECT host, path_template, COUNT(DISTINCT canon_url) AS n_urls
          FROM t GROUP BY 1, 2 HAVING COUNT(DISTINCT canon_url) >= 2""",

    "web_cocitation" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          pe AS (SELECT DISTINCT ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                   dst_url AS dst FROM lnk),
          capped AS (SELECT src, dst FROM
                      (SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS d
                       FROM pe)
                     WHERE d <= 100)
          SELECT l.dst AS page_a, r.dst AS page_b, COUNT(*) AS n_cociting
          FROM capped l JOIN capped r ON l.src = r.src AND l.dst < r.dst
          GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    // the role-swapped twin of the web_cocitation oracle: cap on the
    // TARGET's in-degree, pair the SOURCES
    "web_bibcoupling" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          pe AS (SELECT DISTINCT ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                   dst_url AS dst FROM lnk),
          capped AS (SELECT src, dst FROM
                      (SELECT src, dst, COUNT(*) OVER (PARTITION BY dst) AS d
                       FROM pe)
                     WHERE d <= 100)
          SELECT l.src AS page_a, r.src AS page_b, COUNT(*) AS n_shared_refs
          FROM capped l JOIN capped r ON l.dst = r.dst AND l.src < r.src
          GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    "web_sitemap_gap" -> graft.ops.WebOps.sitemapGapSql,

    "web_page_chains" -> graft.ops.WebOps.pageChainsSql,

    "web_soft404" -> graft.ops.WebOps.soft404Sql,

    "web_change_rate" -> graft.ops.WebOps.changeRateSql,

    // the same pointer-doubling unroll: 3 materialized rounds = 8 hops,
    // terminals absorb via LEFT JOIN + COALESCE, loop flag = final URL
    // still has an outgoing redirect
    "web_redirects" ->
      s"""WITH redges AS MATERIALIZED (
            SELECT 'https://go.example/r/' || CAST(doc_id AS VARCHAR) AS src,
              CASE WHEN doc_id % 50 = 21
                     THEN 'https://go.example/r/' || CAST(doc_id + 1 AS VARCHAR)
                   WHEN doc_id % 4 <> 0
                     THEN 'https://go.example/r/' || CAST(doc_id - 1 AS VARCHAR)
                   ELSE ${graft.ops.WebOps.urlSqlExpr} END AS dst
            FROM documents),
          r1 AS MATERIALIZED (SELECT a.src, COALESCE(b.dst, a.dst) AS dst
            FROM redges a LEFT JOIN redges b ON a.dst = b.src),
          r2 AS MATERIALIZED (SELECT a.src, COALESCE(b.dst, a.dst) AS dst
            FROM r1 a LEFT JOIN r1 b ON a.dst = b.src),
          r3 AS MATERIALIZED (SELECT a.src, COALESCE(b.dst, a.dst) AS dst
            FROM r2 a LEFT JOIN r2 b ON a.dst = b.src),
          srcs AS (SELECT DISTINCT src FROM redges)
          SELECT r3.src, r3.dst AS final_url, (s.src IS NOT NULL) AS looped
          FROM r3 LEFT JOIN srcs s ON r3.dst = s.src""",

    // synthesis (nav + 6-token content lines + promo + copyright) rebuilt
    // in SQL, then the strip recomputed on RAW lines (re-proving the
    // engine's hashed 128-bit line keys)
    "web_boilerplate" ->
      s"""WITH hostd AS (SELECT doc_id, text,
              ${graft.ops.WebOps.canonHostSqlOf(graft.ops.WebOps.urlSqlExpr)} AS host
            FROM documents),
          toks AS (SELECT doc_id, host, string_split(text, ' ') AS t FROM hostd),
          cl AS (SELECT doc_id, i,
                   array_to_string(t[i*6+1:i*6+6], ' ') AS line
                 FROM (SELECT *, unnest(generate_series(0,
                         CAST(ceil(len(t) / 6.0) AS INT) - 1)) AS i FROM toks)),
          body AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS b
                   FROM cl GROUP BY doc_id),
          pg AS (SELECT t.doc_id, t.host,
                   'home about contact ' || t.host || chr(10) || b.b
                   || CASE WHEN t.doc_id % 3 = 0
                           THEN chr(10) || 'subscribe to our newsletter'
                           ELSE '' END
                   || chr(10) || 'copyright ' || t.host AS text
                 FROM toks t JOIN body b USING (doc_id)),
          ln AS (SELECT doc_id, host, i - 1 AS pos, l[i] AS line
                 FROM (SELECT doc_id, host,
                         string_split(text, chr(10)) AS l,
                         unnest(generate_series(1,
                           len(string_split(text, chr(10))))) AS i
                       FROM pg)),
          df AS (SELECT host, line, COUNT(DISTINCT doc_id) AS on_docs
                 FROM ln GROUP BY 1, 2),
          hd AS (SELECT host, COUNT(DISTINCT doc_id) AS host_docs
                 FROM pg GROUP BY 1),
          boiler AS (SELECT host, line FROM df JOIN hd USING (host)
                     WHERE on_docs >= 2
                       AND CAST(on_docs AS DOUBLE) / CAST(host_docs AS DOUBLE) >= 0.5),
          keep AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean
                   FROM ln ANTI JOIN boiler USING (host, line)
                   GROUP BY doc_id)
          SELECT p.doc_id, COALESCE(k.text_clean, '') AS text_clean
          FROM pg p LEFT JOIN keep k USING (doc_id)""",

    "web_shortest_paths" -> shortestPathsOracleSql(depth = 4),

    "web_landmark_dist" -> landmarkOracleSql(depth = 4),

    // per k: hub removal by the same (in-degree desc, node) rank, the
    // recursive reach closure, min-label components, giant fraction
    "web_robustness" -> robustnessOracleSql(random = false),

    // the failure curve: same chain, removal by the portable hash order
    "web_robustness_random" -> robustnessOracleSql(random = true),

    // one degree agg over the canonical undirected set, thresholds as a
    // literal CTE crossed in — per-k conditional counts in one pass
    "web_rich_club" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          pe AS (SELECT DISTINCT
                   ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                   dst_url AS dst FROM lnk),
          ce AS (SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b FROM pe WHERE src <> dst),
          deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
                    (SELECT a AS node FROM ce
                     UNION ALL SELECT b FROM ce) u GROUP BY 1),
          thr AS (SELECT unnest([1, 2, 4, 8]) AS k),
          nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
                 FROM deg, thr WHERE deg > k GROUP BY 1),
          ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
                 FROM ce
                 JOIN deg da ON da.node = ce.a
                 JOIN deg db ON db.node = ce.b
                 CROSS JOIN thr
                 WHERE LEAST(da.deg, db.deg) > k GROUP BY 1)
          SELECT t.k, COALESCE(nk.n_nodes, 0) AS n_nodes,
            COALESCE(ek.n_edges, 0) AS n_edges,
            CASE WHEN COALESCE(nk.n_nodes, 0) < 2 THEN NULL
                 ELSE ROUND(CAST(2.0 AS DOUBLE) * COALESCE(ek.n_edges, 0)
                   / CAST(nk.n_nodes * (nk.n_nodes - 1) AS DOUBLE), 6)
            END AS phi
          FROM thr t
          LEFT JOIN nk ON nk.k = t.k
          LEFT JOIN ek ON ek.k = t.k""",

    "web_harmonic" -> harmonicOracleSql(depth = 4),

    // degree histogram via exact bit-length bucketing (length(bin(x)) - 1)
    "web_degree_dist" ->
      s"""WITH ${graft.ops.LinkGraph.linksCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src_host,
                           ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst_host
                    FROM lnk),
          hg AS (SELECT src_host, dst_host FROM hosts
                 WHERE src_host <> dst_host GROUP BY 1, 2),
          degs AS (SELECT 'out' AS direction, src_host AS host,
                     CAST(COUNT(*) AS BIGINT) AS deg FROM hg GROUP BY 2
                   UNION ALL
                   SELECT 'in' AS direction, dst_host AS host,
                     CAST(COUNT(*) AS BIGINT) AS deg FROM hg GROUP BY 2)
          SELECT direction, CAST(length(bin(deg)) - 1 AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_hosts
          FROM degs GROUP BY 1, 2""",

    // same canonCteSql + the SAME blocklist/pattern constants interpolated
    // from the single WebOps source
    "web_url_filter" ->
      s"""WITH ${graft.ops.WebOps.canonCteSql}
          SELECT doc_id, host, canon_url FROM canon
          WHERE host NOT IN (${graft.ops.WebOps.BlockedHosts.map(h => s"'$h'").mkString(", ")})
            AND NOT regexp_matches(canon_url, '${graft.ops.WebOps.BlockedUrlRe}')""",

    // same rules VALUES, prefix match by substr, winner by the same
    // (length, allow, prefix) order the engine's struct-argmax encodes
    "web_robots" ->
      s"""WITH rules(r_host, allow, prefix) AS (
            SELECT * FROM (VALUES ${graft.ops.WebOps.robotsRulesSqlValues}) v(a, b, c)),
          ${graft.ops.WebOps.canonCteSql},
          u AS (SELECT doc_id, host, path FROM parts),
          m AS (SELECT u.doc_id, u.host, u.path, r.allow, r.prefix
                FROM u JOIN rules r ON r.r_host = u.host
                  AND substr(u.path, 1, length(r.prefix)) = r.prefix),
          w AS (SELECT doc_id, host, path, allow, prefix,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY length(prefix) DESC,
                      CASE WHEN allow THEN 1 ELSE 0 END DESC,
                      prefix DESC) AS rn
                FROM m)
          SELECT u.doc_id, u.host, u.path,
            COALESCE(w.allow, true) AS allowed, w.prefix AS matched_prefix
          FROM u LEFT JOIN w ON w.doc_id = u.doc_id AND w.rn = 1""",

    "web_domain_quota" -> domainQuotaOracleSql,

    // the two-phase engine form must land on the SAME rows (prefilter is a
    // prefix of the hash order + exact fallback) — one oracle, two plans
    "web_domain_quota2" -> domainQuotaOracleSql,

    // per-language corpus datasheet: docs, token mass, mean quality — the
    // "datasheets for datasets" stratification report
    // the same stopword-density CASE as text_langid (single source:
    // TextOps.langPred), confusion counts + per-declared share window
    "web_lang_consistency" ->
      """WITH p AS (SELECT lang AS lang_declared,
             CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                  / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
                  THEN 'en' ELSE 'und' END AS lang_pred
           FROM documents),
         conf AS (SELECT lang_declared, lang_pred, COUNT(*) AS n_docs
                  FROM p GROUP BY 1, 2)
         SELECT lang_declared, lang_pred, n_docs,
           ROUND(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY lang_declared)
                               AS DOUBLE), 6) AS share,
           lang_declared <> lang_pred AS mismatch
         FROM conf""",

    // pages twin + the same hreflang-tag append (shared index arithmetic +
    // url builders), extraction via the same two-group pattern, cluster key
    // = least(page, min(target)) over the per-doc declared set
    "web_hreflang_clusters" ->
      s"""WITH ${graft.ops.LinkGraph.pagesCteSql},
          p2 AS (SELECT doc_id, url,
              html || CASE WHEN doc_id % 7 = 3
                THEN '<link rel="alternate" hreflang="fr" href="'
                  || ${graft.ops.WebOps.urlSqlExprOf("(doc_id * 3 + 1) % 97")} || '">'
                  || '<link rel="alternate" hreflang="de" href="'
                  || ${graft.ops.WebOps.urlSqlExprOf("(doc_id * 5 + 2) % 97")} || '">'
                ELSE '' END AS html
            FROM pages),
          x AS (SELECT doc_id, ${graft.ops.WebOps.canonUrlSqlOf("url")} AS page_url,
              regexp_extract_all(html, '<link rel="alternate" hreflang="([a-z-]+)" href="([^"]*)"', 1) AS ls,
              regexp_extract_all(html, '<link rel="alternate" hreflang="([a-z-]+)" href="([^"]*)"', 2) AS hs
            FROM p2),
          e AS (SELECT doc_id, page_url, ls[CAST(i AS INT)] AS hreflang,
                  ${graft.ops.WebOps.canonUrlSqlOf("hs[CAST(i AS INT)]")} AS target_url
                FROM x, (SELECT unnest(generate_series(1, 2)) AS i)
                WHERE i <= len(ls))
          SELECT page_url, hreflang, target_url,
                 LEAST(page_url, MIN(target_url) OVER (PARTITION BY doc_id)) AS cluster_key
          FROM e""",
  )
}
