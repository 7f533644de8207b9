package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus operators for a Common-Crawl-style pipeline: URL
  * canonicalization, canonical-URL dedup, per-domain stats, and C4-style
  * repeated-passage removal. All map-only or single-shuffle column
  * expressions (whole-stage codegen, no UDFs) with exact DuckDB oracle
  * equivalents.
  *
  * The driver corpus carries no web URLs (`doc://<id>` only), so
  * [[syntheticUrl]] derives a deterministic, collision-rich URL from
  * `doc_id` — same arithmetic in the oracle SQL, so the canonicalizer is
  * exercised as a real string op in both engines. No wall clock, no RNG.
  */
object WebOps {

  /** Host pool for the synthetic URLs. Deliberately collision-rich under
    * canonicalization: indices 0/2/4 all canonicalize to `example.org`
    * (case fold + `www.` strip), 1/6 to `news.example.com`. */
  val Domains: Seq[String] = Seq(
    "example.org", "News.Example.com", "www.example.org", "blog.example.net",
    "EXAMPLE.org", "shop.example.io", "www.News.example.com")

  /** Deterministic URL from doc_id: host (mod 7), path (mod 40), a query
    * class (mod 3: tracking-params / reordered-params / none), a fragment
    * (mod 5). Mirrored literally in the oracle SQL. */
  def syntheticUrl(docId: Column): Column = {
    val p = (docId % 40).cast("string")
    concat(
      lit("https://"),
      element_at(array(Domains.map(lit): _*), (docId % 7).cast("int") + 1),
      lit("/p/"), p,
      when(docId % 3 === 0, concat(lit("?utm_source=feed&id="), p))
        .when(docId % 3 === 1, concat(lit("?ref=x&id="), p))
        .otherwise(lit("")),
      when(docId % 5 === 0, lit("#frag")).otherwise(lit("")))
  }

  /** docs + a synthetic `url` column. */
  def withUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", syntheticUrl(col("doc_id")))

  /** The canonicalizer's regexes — ONE definition feeding both the Spark
    * Column code and the DuckDB oracle SQL (Java∩RE2-identical subset: no
    * lookaround, no backrefs, so both engines run the same patterns). */
  val HostRe = "^https?://([^/?#]+)"
  val PathRe = "^https?://[^/?#]+([^?#]*)"
  val QueryRe = "\\?([^#]*)"
  val WwwRe = "^www\\."
  val TrailSlashRe = "/$"

  /** RFC 3986-flavored canonical URL (the crawl-dedup normal form, public
    * norms — e.g. Apache Nutch/StormCrawler basic URL normalizers):
    * lowercase scheme+host, strip a leading `www.`, drop the fragment, drop
    * `utm_*` tracking params, sort the remaining query params, strip a
    * trailing slash. Pure regexp/array column expressions in the
    * Java∩RE2-identical pattern subset (no lookaround, no backrefs), so the
    * DuckDB oracle runs the same regexes. */
  def canonicalUrl(url: Column): Column = {
    val host = canonicalHost(url)
    val path = regexp_replace(
      regexp_extract(url, PathRe, 1), TrailSlashRe, "")
    val rawq = regexp_extract(url, QueryRe, 1)
    // split("") yields [""]; the p =!= "" filter makes the no-query and
    // empty-query cases collapse to the same empty array
    val q = array_join(
      array_sort(filter(split(rawq, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(lit("https://"), host, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Canonical host alone (the per-domain aggregation key). */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), WwwRe, "")

  // ---- oracle-SQL builders (same constants/regexes as the Column code) ---

  /** The [[Domains]] pool as a DuckDB list literal (shared by the URL
    * synthesis and [[LinkGraph]]'s protocol-relative href synthesis). */
  def domainsSqlList: String = Domains.map(d => s"'$d'").mkString(", ")

  /** DuckDB SQL expression for [[syntheticUrl]] over any integer-typed SQL
    * expression `id` (parameterized so [[LinkGraph]]'s synthetic link
    * targets reuse the same single source of truth). */
  def urlSqlExprOf(id: String): String = {
    val doms = domainsSqlList
    s"""'https://' || ([$doms])[CAST(($id) % 7 AS INT) + 1]
        || '/p/' || CAST(($id) % 40 AS VARCHAR)
        || CASE WHEN ($id) % 3 = 0
                THEN '?utm_source=feed&id=' || CAST(($id) % 40 AS VARCHAR)
                WHEN ($id) % 3 = 1
                THEN '?ref=x&id=' || CAST(($id) % 40 AS VARCHAR)
                ELSE '' END
        || CASE WHEN ($id) % 5 = 0 THEN '#frag' ELSE '' END"""
  }

  /** DuckDB SQL expression for [[syntheticUrl]] over a `doc_id` column. */
  def urlSqlExpr: String = urlSqlExprOf("doc_id")

  /** DuckDB SQL expression for [[canonicalHost]] over any URL-typed SQL
    * expression `u`. */
  def canonHostSqlOf(u: String): String =
    s"regexp_replace(lower(regexp_extract($u, '$HostRe', 1)), '$WwwRe', '')"

  /** Multi-label public suffixes recognized by [[pld]] — a deliberately
    * small snapshot standing in for the Mozilla Public Suffix List (the
    * full list is a data file a production deploy would broadcast; the
    * LOGIC — longest-matching-suffix, then one extra label — is what's
    * under test). Single source of truth for the Column expression AND
    * the oracle SQL. */
  val MultiLabelSuffixes: Seq[String] = Seq("co.uk", "ac.uk", "com.au")

  /** Pay-level domain (eTLD+1) of an already-canonical host: the
    * registrable-domain aggregation key crawl policy actually wants —
    * host-level rollups overcount sites that shard across subdomains
    * (news./shop./blog.example.com are ONE site). Rule: if the last two
    * labels form a known multi-label public suffix and a third label
    * exists, keep three labels; otherwise keep two (or the bare host when
    * it has no dot). Pure map-side array arithmetic, no join — the suffix
    * set compiles into the expression (the RuleTagger single-source
    * discipline). */
  def pld(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(n <= lit(1), host)
      .when(lastTwo.isin(MultiLabelSuffixes: _*) && n >= lit(3), lastThree)
      .otherwise(lastTwo)
  }

  /** DuckDB SQL twin of [[pld]] over any host-typed SQL expression `h`. */
  def pldSqlOf(h: String): String = {
    val sufs = MultiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split($h, '.')) <= 1 THEN $h
         WHEN list_contains([$sufs],
                string_split($h, '.')[-2] || '.' || string_split($h, '.')[-1])
              AND len(string_split($h, '.')) >= 3
         THEN string_split($h, '.')[-3] || '.' ||
              string_split($h, '.')[-2] || '.' || string_split($h, '.')[-1]
         ELSE string_split($h, '.')[-2] || '.' || string_split($h, '.')[-1]
         END"""
  }

  /** DuckDB SQL expression for [[canonicalUrl]] over any URL-typed SQL
    * expression `u` (same regex constants; the empty-vs-missing-query
    * collapse mirrors canonCteSql's CASE). */
  def canonUrlSqlOf(u: String): String = {
    val q = s"""array_to_string(list_sort(list_filter(
          string_split(regexp_extract($u, '$QueryRe', 1), '&'),
          p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')"""
    s"""'https://' || ${canonHostSqlOf(u)}
        || regexp_replace(regexp_extract($u, '$PathRe', 1), '$TrailSlashRe', '')
        || CASE WHEN length($q) > 0 THEN '?' || $q ELSE '' END"""
  }

  /** DuckDB CTE chain `urls` → `canon(doc_id, n_chars, url, host,
    * canon_url)` mirroring [[canonicalize]] (regexes shared verbatim; on a
    * no-query URL DuckDB's regexp_extract misses → NULL query list, which
    * the length(q)>0 CASE collapses to the same '' suffix as Spark's
    * empty-string miss). */
  def canonCteSql: String =
    s"""urls AS (SELECT doc_id, n_chars, $urlSqlExpr AS url FROM documents),
        parts AS (SELECT doc_id, n_chars, url,
          regexp_replace(lower(regexp_extract(url, '$HostRe', 1)), '$WwwRe', '') AS host,
          regexp_replace(regexp_extract(url, '$PathRe', 1), '$TrailSlashRe', '') AS path,
          array_to_string(list_sort(list_filter(
            string_split(regexp_extract(url, '$QueryRe', 1), '&'),
            p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q
          FROM urls),
        canon AS (SELECT doc_id, n_chars, url, host,
          'https://' || host || path
            || CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END AS canon_url
          FROM parts)"""

  /** (doc_id, url, canon_url) — the canonicalization map itself. */
  def canonicalize(docs: DataFrame): DataFrame =
    withUrls(docs).select(col("doc_id"), col("url"),
      canonicalUrl(col("url")).as("canon_url"))

  /** Deterministic robots rules per canonical host (ONE definition feeding
    * the Column code and the oracle VALUES): every host disallows the
    * `/p/1` prefix (which string-matches /p/1 and /p/10…/p/19 — the classic
    * prefix subtlety) but allows the more specific `/p/12`; each host also
    * blocks one host-specific prefix. (host, allow, prefix). */
  val RobotsRules: Vector[(String, Boolean, String)] = {
    val hosts = Vector("example.org", "news.example.com",
      "blog.example.net", "shop.example.io")
    hosts.zipWithIndex.flatMap { case (h, i) =>
      Vector((h, false, "/p/1"), (h, true, "/p/12"),
        (h, false, s"/p/${2 + i}"))
    }
  }

  def robotsRulesSqlValues: String =
    RobotsRules.map { case (h, a, p) => s"('$h', $a, '$p')" }.mkString(", ")

  /** ROBOTS EXCLUSION (RFC 9309) verdict per page — crawl-politeness
    * filtering next to [[urlFilter]]'s trap hygiene: a URL's verdict is the
    * rule with the LONGEST matching path prefix; on a length tie Allow
    * wins (the RFC rule); no matching rule → allowed.
    *
    * Scale shape: the rules table is robots-corpus-sized (rules × hosts —
    * small even for the real web) → broadcast; the corpus side is one
    * map-side prefix-match join + ONE argmax aggregation via `max(struct)`
    * (longest, then allow, then prefix — total order, unique winner), the
    * crawlMerge discipline. No windows, no corpus self-joins. */
  def robotsFilter(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = broadcast(RobotsRules.toDF("r_host", "allow", "prefix"))
    val u = withUrls(docs).select(col("doc_id"),
      canonicalHost(col("url")).as("host"),
      regexp_replace(regexp_extract(col("url"), PathRe, 1), TrailSlashRe, "")
        .as("path"))
    u.join(rules, col("host") === col("r_host") &&
        expr("substring(path, 1, length(prefix)) = prefix"), "left")
      .groupBy("doc_id", "host", "path")
      .agg(max(struct(length(col("prefix")).as("l"),
        col("allow").cast("int").as("a"), col("prefix").as("p"))).as("k"))
      .select(col("doc_id"), col("host"), col("path"),
        coalesce(col("k.a") === 1, lit(true)).as("allowed"),
        col("k.p").as("matched_prefix"))
  }

  /** Fetch-list hygiene rules — ONE definition feeding the Column code and
    * the oracle SQL. Hosts: spam/blocked domains (canonical form). Pattern:
    * binary/media extensions + infinite-calendar crawler traps, on the
    * CANONICAL url (case-insensitive via inline flag — Java∩RE2-common). */
  val BlockedHosts: Seq[String] = Seq("shop.example.io", "blog.example.net")
  val BlockedUrlRe: String = "(?i)\\.(jpg|jpeg|png|gif|pdf|zip|exe|mp4)([?#]|$)|/calendar/"

  /** Crawl URL filtering (the pass every fetch list goes through before
    * annotation): drop blocklisted canonical hosts + trap/binary URL
    * patterns. Pure map-side — the host set is a tiny literal IN (a real
    * blocklist of millions of hosts becomes a broadcast anti-join, same
    * semantics), the pattern one codegen'd rlike; composes BEFORE the
    * corpus ever reaches extraction, so at 10^12 pages this prunes at the
    * scan. Emits the kept rows in [[canonicalize]]'s shape. */
  def urlFilter(docs: DataFrame): DataFrame =
    canonicalize(docs)
      .withColumn("host", canonicalHost(col("url")))
      .filter(!col("host").isin(BlockedHosts: _*) &&
        !col("canon_url").rlike(BlockedUrlRe))
      .select(col("doc_id"), col("host"), col("canon_url"))

  /** Crawl dedup by canonical URL: one row per canonical URL with the
    * duplicate count and the lexicographically-first raw URL kept as the
    * representative (deterministic; a crawl would arg-min on fetch time —
    * same one-shuffle shape). ONE hash aggregation on the canonical key;
    * at 10^12 pages this is the classic first-pass dedup and the key is a
    * short string, so the shuffle carries no page bytes. */
  def urlDedup(docs: DataFrame): DataFrame =
    canonicalize(docs)
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min(col("url")).as("keep_url"))

  /** Same-canonical-URL content CONFLICTS — [[urlDedup]]'s inconsistency
    * report: canonical urls serving MORE THAN ONE distinct text (cloaking,
    * staleness between captures, or a canonicalizer folding genuinely
    * different pages — either way the release card must surface it BEFORE
    * urlDedup silently keeps one representative). ONE (canon_url) agg
    * with a two-phase countDistinct on the text; at 100 TB the distinct
    * key is the 128-bit text hash ([[Dedup.exact]]'s collision math —
    * verbatim text kept here because the oracle recomputes on raw
    * strings, the [[chunkDedup]] trade). */
  def urlConflicts(docs: DataFrame): DataFrame =
    withUrls(docs)
      .select(canonicalUrl(col("url")).as("canon_url"), col("text"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_texts"))
      .filter(col("n_texts") >= 2)

  /** Path-template segment generalizers (Java∩RE2-identical subset; full
    * match via anchors under both engines' partial-match semantics). */
  val DigitSegRe = "^[0-9]+$"
  val HexSegRe = "^[0-9a-f]{8,}$"

  /** URL path-template mining — the crawler-trap / infinite-URL-space
    * detector (calendar pages, session ids, pagination): each URL's
    * canonical path is generalized segment-by-segment (all-digit → `{d}`,
    * ≥8-char lowercase hex id → `{hex}`) and templates are counted per host
    * by DISTINCT canonical URL. A template absorbing thousands of URLs on
    * one host is an id/pagination space the frontier should cap rather than
    * enumerate — the per-host fetch-budget input [[domainQuota]] consumes.
    *
    * Input: any frame with a raw `url` column (frontier, link targets,
    * crawl log). Scale shape: map-only generalization (split → transform →
    * array_join, whole-stage codegen), then ONE hash aggregation on short
    * (host, template) keys; the distinct count rides a 64-bit URL hash —
    * URL text never enters the distinct buffer (collision math as
    * [[Dedup]]'s exact key: ~n²/2⁶⁵ expected collisions, immaterial below
    * 10¹⁵ URLs per template). */
  def urlTemplates(urls: DataFrame, minUrls: Long = 2): DataFrame = {
    val path = regexp_replace(
      regexp_extract(col("url"), PathRe, 1), TrailSlashRe, "")
    urls
      .select(canonicalHost(col("url")).as("host"),
        canonicalUrl(col("url")).as("canon_url"),
        array_join(transform(split(path, "/"),
          s => when(s.rlike(DigitSegRe), lit("{d}"))
            .when(s.rlike(HexSegRe), lit("{hex}"))
            .otherwise(s)), "/").as("path_template"))
      .groupBy("host", "path_template")
      .agg(countDistinct(xxhash64(col("canon_url"))).as("n_urls"))
      .filter(col("n_urls") >= minUrls)
  }

  /** DuckDB SQL expression for [[urlTemplates]]' generalized path over any
    * URL-typed SQL expression `u` (same regex constants). */
  def pathTemplateSqlOf(u: String): String =
    s"""array_to_string(list_transform(
          string_split(regexp_replace(regexp_extract($u, '$PathRe', 1),
            '$TrailSlashRe', ''), '/'),
          s -> CASE WHEN regexp_matches(s, '$DigitSegRe') THEN '{d}'
                    WHEN regexp_matches(s, '$HexSegRe') THEN '{hex}'
                    ELSE s END), '/')"""

  /** Per-domain corpus stats: page count, distinct canonical URLs, total
    * chars — the crawl-health / domain-mix report (and the input to
    * per-domain quotas in a training-data pipeline). Integer sums only
    * (cross-engine exact; a rounded avg can land on a half-even boundary). */
  def domainStats(docs: DataFrame): DataFrame =
    withUrls(docs)
      .select(canonicalHost(col("url")).as("domain"),
        canonicalUrl(col("url")).as("canon_url"), col("n_chars"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_pages"),
        sum(col("n_chars")).as("sum_chars"))

  /** Two deterministic crawl snapshots for [[crawlMerge]]: snapshot 1 is
    * every doc fetched at `1700000000 + doc_id·60`; snapshot 2 re-crawls
    * every third doc one week later. Epochs are plain BIGINTs (the WARC
    * reader owns real timestamp handling; the merge logic is ordering). */
  def crawlSnapshots(docs: DataFrame): DataFrame = {
    val s1 = withUrls(docs).select(col("doc_id"), col("url"),
      lit(1).as("snapshot"),
      (lit(1700000000L) + col("doc_id") * 60).as("fetch_epoch"))
    s1.unionAll(s1.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("url"), lit(2).as("snapshot"),
        (col("fetch_epoch") + 604800L).as("fetch_epoch")))
  }

  /** Snapshot synthesis for [[crawlDiff]] — [[crawlSnapshots]] plus the two
    * signals a diff needs: a CONTENT hash (md5 of the text; re-crawls of
    * `doc_id % 6 == 0` flip to v2 content → 'changed', other re-crawls keep
    * it → 'unchanged') and genuinely NEW snapshot-2 pages on a fresh host
    * (`doc_id % 11 == 1` → 'added'); everything not re-crawled is
    * 'removed'. Mirrored literally in the oracle SQL. */
  def crawlSnapshotsWithContent(docs: DataFrame): DataFrame = {
    val s1 = withUrls(docs).select(col("doc_id"), col("url"),
      lit(1).as("snapshot"),
      (lit(1700000000L) + col("doc_id") * 60).as("fetch_epoch"),
      md5(col("text").cast("binary")).as("content_hash"))
    val recrawl = withUrls(docs).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("url"), lit(2).as("snapshot"),
        (lit(1700000000L) + col("doc_id") * 60 + 604800L).as("fetch_epoch"),
        md5(when(col("doc_id") % 6 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).cast("binary")).as("content_hash"))
    val added = docs.filter(col("doc_id") % 11 === 1)
      .select(col("doc_id"),
        concat(lit("https://fresh.example/p/"), col("doc_id")).as("url"),
        lit(2).as("snapshot"),
        (lit(1700000000L) + col("doc_id") * 60 + 604800L).as("fetch_epoch"),
        md5(col("text").cast("binary")).as("content_hash"))
    s1.unionByName(recrawl).unionByName(added)
  }

  /** Visit count for [[crawlHistory]] — 8 weekly captures per URL, enough
    * intervals for the change-rate estimator to separate never/sometimes/
    * often-changing pages. Shared with the oracle SQL. */
  val ChangeVisits = 8

  /** K-visit crawl history synthesis for [[changeRate]]: every doc captured
    * at `visit ∈ [0, visits)`, one week apart; the content VERSION after
    * visit j is the count of change events at visits 1..j, where a change
    * fires iff `(doc_id·31 + k·17) % 10 < doc_id % 4` — so a doc's change
    * propensity is its `doc_id % 4` (0 → frozen page, 3 → news-like churn),
    * deterministic and mirrored literally in the oracle SQL. The visit-0
    * guard returns an EMPTY change list (Spark's `sequence(1, 0)` would
    * descend — the [[Dedup.shingles]] pitfall). */
  def crawlHistory(docs: DataFrame, visits: Int = ChangeVisits): DataFrame =
    withUrls(docs)
      .select(col("doc_id"), col("url"), col("text"),
        explode(sequence(lit(0), lit(visits - 1))).as("visit"))
      .withColumn("version",
        when(col("visit") === 0, lit(0)).otherwise(
          size(filter(sequence(lit(1), col("visit")),
            k => (col("doc_id") * 31 + k * 17) % 10 < col("doc_id") % 4))))
      .select(col("doc_id"), col("url"), col("visit"),
        (lit(1700000000L) + col("visit") * 604800L).as("fetch_epoch"),
        md5(concat(col("text"), lit(" v"), col("version").cast("string"))
          .cast("binary")).as("content_hash"))

  /** Per-URL change-rate estimation over a capture history (Cho &
    * Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003 — the
    * statistic a crawler's re-fetch scheduler runs on): per canonical URL,
    * the observed change fraction over consecutive same-URL captures
    * (`naive_rate = X/n`) and the bias-corrected Poisson rate
    * `λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / I` changes/day (their
    * estimator handles X = n without blowing up via the +0.5 continuity
    * correction). Feeds [[fetchSchedule]]-style revisit budgeting.
    *
    * Scale shape: change detection is a `lag` window PER canonICAL URL
    * (billions of partitions, each `visits` rows — parallel, never
    * global), ordered by (epoch, doc_id) so capture ties are
    * deterministic; then ONE per-URL aggregation (map-side partials).
    * Content comparison is hash-vs-hash — no page bytes move. */
  def changeRate(history: DataFrame, intervalDays: Double = 7.0): DataFrame = {
    val w = Window.partitionBy("canon_url")
      .orderBy(col("fetch_epoch"), col("doc_id"))
    val n = col("n_intervals").cast("double")
    val x = col("n_changes").cast("double")
    history
      .select(canonicalUrl(col("url")).as("canon_url"), col("doc_id"),
        col("fetch_epoch"), col("content_hash"))
      .withColumn("prev_h", lag(col("content_hash"), 1).over(w))
      .filter(col("prev_h").isNotNull)
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_intervals"),
        sum((col("content_hash") =!= col("prev_h")).cast("long"))
          .as("n_changes"))
      .select(col("canon_url"), col("n_intervals"), col("n_changes"),
        round(x / n, 6).as("naive_rate"),
        // `+ 0.0` pins the IEEE sign bit: never-changed URLs reach
        // ROUND(-ln(1.0)/d) which is -0.0 in some engines and +0.0 in
        // others — value-equal but hash-different; -0.0 + 0.0 == +0.0.
        (round(-log((n - x + lit(0.5)) / (n + lit(0.5))) / lit(intervalDays),
          6) + lit(0.0)).as("lambda_per_day"))
  }

  /** DuckDB twin of [[crawlHistory]] + [[changeRate]] — full query SQL. */
  def changeRateSql: String =
    s"""WITH hist AS (
          SELECT d.doc_id, $urlSqlExpr AS url, v.visit,
            1700000000 + v.visit * 604800 AS fetch_epoch,
            md5(d.text || ' v' || CAST(len(list_filter(
                  generate_series(1, v.visit),
                  k -> (d.doc_id * 31 + k * 17) % 10 < d.doc_id % 4))
                AS VARCHAR)) AS content_hash
          FROM documents d,
            (SELECT unnest(generate_series(0, ${ChangeVisits - 1})) AS visit) v),
        lagd AS (
          SELECT ${canonUrlSqlOf("url")} AS canon_url, content_hash,
            lag(content_hash) OVER (PARTITION BY ${canonUrlSqlOf("url")}
              ORDER BY fetch_epoch, doc_id) AS prev_h
          FROM hist)
        SELECT canon_url,
          COUNT(*) AS n_intervals,
          CAST(SUM(CASE WHEN content_hash <> prev_h THEN 1 ELSE 0 END)
               AS BIGINT) AS n_changes,
          ROUND(SUM(CASE WHEN content_hash <> prev_h THEN 1 ELSE 0 END)
                / CAST(COUNT(*) AS DOUBLE), 6) AS naive_rate,
          ROUND(-ln((COUNT(*) - SUM(CASE WHEN content_hash <> prev_h
                                         THEN 1 ELSE 0 END) + 0.5)
                    / (COUNT(*) + 0.5)) / 7.0, 6) + 0.0 AS lambda_per_day
        FROM lagd WHERE prev_h IS NOT NULL
        GROUP BY 1"""

  /** Crawl-snapshot DIFF (what changed between two crawls — the freshness /
    * re-fetch-scheduling signal): per canonical URL, compare the LATEST
    * capture of snapshot `a` against snapshot `b` →
    * `added | removed | changed | unchanged`.
    *
    * Scale shape: two `max(struct(...))` argmax aggregations (map-side
    * partials — the [[crawlMerge]] shape, with the content hash riding the
    * struct as a non-ordering trailing field) + ONE full-outer join on the
    * canonical-URL key. No page bytes anywhere: the content comparison is
    * hash-vs-hash. */
  def crawlDiff(snapshots: DataFrame, a: Int = 1, b: Int = 2): DataFrame = {
    // presence is a flag carried out of the aggregation, NOT inferred from
    // content-hash nullness — a captured-but-hashless row (fetch error)
    // must still count as present (matching the oracle's
    // `canon_url IS NULL` presence test); a NULL hash on either present
    // side then falls through === (null ⇒ not-when) to 'changed'
    def latest(s: Int, tag: String) = snapshots.filter(col("snapshot") === s)
      .groupBy(canonicalUrl(col("url")).as("canon_url"))
      .agg(max(struct(col("fetch_epoch"), col("doc_id"),
        col("content_hash"))).as("k"))
      .select(col("canon_url"), col("k.content_hash").as(s"h_$tag"),
        lit(true).as(s"in_$tag"))
    latest(a, "a")
      .join(latest(b, "b"), Seq("canon_url"), "full_outer")
      .select(col("canon_url"),
        when(col("in_b").isNull, lit("removed"))
          .when(col("in_a").isNull, lit("added"))
          .when(col("h_a") === col("h_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Crawl-snapshot merge (the CDX-index dedup shape): across all captures
    * of a canonical URL keep the LATEST fetch (epoch desc, snapshot desc,
    * doc_id desc — total order, so the winner is unique), with the capture
    * count. ONE hash aggregation via `max(struct(...))` — an argmax that
    * partial-aggregates map-side, unlike a row_number window, so a URL
    * captured in thousands of snapshots costs one combine tree, and the
    * shuffle carries one short row per (partition, canonical URL). */
  def crawlMerge(snapshots: DataFrame): DataFrame =
    snapshots
      .groupBy(canonicalUrl(col("url")).as("canon_url"))
      .agg(count(lit(1)).as("n_captures"),
        max(struct(col("fetch_epoch"), col("snapshot"), col("doc_id")))
          .as("k"))
      .select(col("canon_url"), col("n_captures"),
        col("k.fetch_epoch").as("last_epoch"),
        col("k.snapshot").as("last_snapshot"),
        col("k.doc_id").as("keep_doc"))

  /** Redirect-map synthesis for [[resolveRedirects]]: one redirect edge per
    * doc on a dedicated `go.example/r/<id>` namespace (unique srcs — the
    * synthetic page URLs collide by design, which would make the map
    * multi-valued). Structure: ids ≡ 21 (mod 50) point FORWARD (`i → i+1`,
    * forming a 2-cycle with `i+1 → i` since `(i+1) % 4 ≠ 0`); other ids
    * off the 4-grid chain DOWN (`i → i−1`, chains of ≤ 3 redirects); ids on
    * the 4-grid land on the real page URL (terminal — a landing page is
    * never a redirect src). Mirrored literally in the oracle SQL. */
  def redirectEdges(docs: DataFrame): DataFrame = {
    def go(id: Column) = concat(lit("https://go.example/r/"), id.cast("string"))
    docs.select(go(col("doc_id")).as("src"),
      when(col("doc_id") % 50 === 21, go(col("doc_id") + 1))
        .when(col("doc_id") % 4 =!= 0, go(col("doc_id") - 1))
        .otherwise(syntheticUrl(col("doc_id"))).as("dst"))
  }

  /** Redirect-chain resolution (the crawl-frontier canonicalization step:
    * a fetch list full of `301` hops must resolve to final landing URLs
    * before dedup/quota). POINTER DOUBLING, not hop-at-a-time: round `r`
    * maps every src to the node `2^r` hops away (terminals absorb via the
    * left join), so `maxHops` is covered in `⌈log₂ maxHops⌉` self-joins —
    * at web scale (10^9-row redirect maps, chains of dozens) that is 5–6
    * shuffles instead of dozens. Rows whose final URL still has an outgoing
    * redirect after the budget are flagged `looped` (redirect cycles —
    * real crawls hit them constantly — and over-budget chains alike).
    *
    * Each round localCheckpoints (eager) — constant plan depth, same
    * rationale as the Lloyd loop in [[Similarity]]. */
  def resolveRedirects(edges: DataFrame, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1, s"maxHops=$maxHops must be >= 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var f = e
    var hops = 1
    while (hops < maxHops) {
      val g = f.select(col("src").as("g_src"), col("dst").as("g_dst"))
      f = f.join(g, f("dst") === col("g_src"), "left")
        .select(f("src"), coalesce(col("g_dst"), f("dst")).as("dst"))
        .localCheckpoint()
      hops *= 2
    }
    val srcs = e.select(col("src").as("out_src")).distinct()
    f.join(srcs, f("dst") === col("out_src"), "left")
      .select(col("src"), col("dst").as("final_url"),
        col("out_src").isNotNull.as("looped"))
  }

  /** Line-structured page synthesis for [[boilerplateStrip]]: the corpus
    * texts carry no line structure, so each doc becomes a page of
    * `\n`-separated lines — a nav line and a copyright line shared by EVERY
    * page of the host (the template), the doc's tokens re-wrapped 6 per
    * content line, and a promo line on every third doc (present on ~1/3 of
    * a host's pages — below the default 50% threshold, so the strip must
    * keep it). Mirrored literally in the oracle SQL. */
  def withNavLines(docs: DataFrame): DataFrame = {
    val url = syntheticUrl(col("doc_id"))
    val host = canonicalHost(url)
    val toks = split(col("text"), " ")
    // split() never returns an empty array, so nLines >= 1 and the
    // sequence never descends (Dedup.shingles guard rationale)
    val nLines = ceil(size(toks).cast("double") / 6).cast("int")
    val content = transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * 6 + 1, lit(6)), " "))
    val lines = concat(
      array(concat(lit("home about contact "), host)),
      content,
      when(col("doc_id") % 3 === 0, array(lit("subscribe to our newsletter")))
        .otherwise(array().cast("array<string>")),
      array(concat(lit("copyright "), host)))
    docs.select(col("doc_id"), url.as("url"),
      array_join(lines, "\n").as("text"))
  }

  /** Per-host boilerplate line removal (the CCNet/jusText template-strip:
    * nav bars, cookie banners, copyright footers repeat on every page of a
    * host and would dominate any token-level statistic): a line occurring
    * on ≥ `minFrac` of a host's pages (and on ≥ `minDocs` pages — small
    * hosts can't vote a line boilerplate off two observations) is dropped
    * from every page of that host; pages rebuild from their own surviving
    * line positions.
    *
    * Scale shape (the [[chunkDedup]] pattern): every line-keyed exchange
    * carries the 128-bit line key (2×xxhash64 + length — [[Dedup]]'s exact
    * collision math), never line text; the boilerplate set is per-host
    * tiny (it's the host's TEMPLATE) so the anti-join broadcasts; the
    * rebuild re-splits each page's own text map-side and keeps surviving
    * positions in order. Input: `(doc_id, url, text)`; output
    * `(doc_id, text_clean)` — a fully-templated page ('' after the strip)
    * stays present, matching the oracle's LEFT JOIN. */
  def boilerplateStrip(pages: DataFrame, minFrac: Double = 0.5,
                       minDocs: Long = 2): DataFrame = {
    val lineArr = split(col("text"), "\n")
    val lines = pages
      .select(col("doc_id"), canonicalHost(col("url")).as("host"),
        posexplode(lineArr).as(Seq("pos", "line")))
      .select(col("doc_id"), col("host"), col("pos"),
        xxhash64(lit(1), col("line")).as("h1"),
        xxhash64(lit(2), col("line")).as("h2"),
        length(col("line")).as("n"))
    val docFreq = lines.select("host", "h1", "h2", "n", "doc_id").distinct()
      .groupBy("host", "h1", "h2", "n").agg(count(lit(1)).as("on_docs"))
    val hostDocs = pages
      .select(canonicalHost(col("url")).as("host"), col("doc_id")).distinct()
      .groupBy("host").agg(count(lit(1)).as("host_docs"))
    val boiler = docFreq.join(hostDocs, "host")
      .filter(col("on_docs") >= minDocs &&
        col("on_docs").cast("double") / col("host_docs").cast("double")
          >= minFrac)
      .select("host", "h1", "h2", "n")
    val keepPos = lines
      .join(boiler, Seq("host", "h1", "h2", "n"), "left_anti")
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("keep"))
    val tagged = transform(lineArr, (l, i) => struct(i.as("pos"), l.as("line")))
    pages.select(col("doc_id"), col("text"))
      .join(keepPos, Seq("doc_id"), "left") // null keep → every line drops
      .select(col("doc_id"),
        array_join(transform(
          filter(tagged, s => array_contains(col("keep"), s.getField("pos"))),
          s => s.getField("line")), "\n").as("text_clean"))
  }

  /** Mirror synthesis for [[mirrorHosts]] — every fourth doc's text ALSO
    * served from a shifted host under an `/m/` path (the corpus texts are
    * all distinct, so without this no exact cross-host duplication exists
    * to detect). Mirrored literally in the oracle SQL. */
  def withMirrors(docs: DataFrame): DataFrame = {
    val base = withUrls(docs).select(col("url"), col("text"))
    val mirrored = docs.filter(col("doc_id") % 4 === 1)
      .select(concat(lit("https://"),
        element_at(array(Domains.map(lit): _*),
          ((col("doc_id") + 3) % 7).cast("int") + 1),
        lit("/m/"), (col("doc_id") % 40).cast("string")).as("url"),
        col("text"))
    base.unionByName(mirrored)
  }

  /** Mirror-host detection — the crawl-dedup signal ABOVE document level:
    * host pairs serving largely identical content (mirrors, parked-domain
    * farms, CDN aliases the canonicalizer can't fold). Per host, the set of
    * distinct content hashes it serves; host pairs sharing ≥ `minShared`
    * hashes are emitted with `containment = shared / min(|a|, |b|)` (the
    * smaller side's covered fraction — 1.0 means one host is a full mirror
    * of the other). Input: a `(url, text)` page frame (e.g.
    * [[withMirrors]], or a real crawl slice).
    *
    * Scale shape: content key = md5 of the text (16 bytes — no page bytes
    * past the first projection); (host, hash) deduped in one exchange;
    * hashes served by more than `maxHostsPerHash` hosts are dropped BEFORE
    * the self-join (empty/boilerplate pages would otherwise fan out
    * quadratically — the LSH hot-bucket-cap argument, and the same
    * windowed-population guard as [[Dedup]]'s banding); the pair
    * aggregation shuffles short (host, host) keys. Containment denominators
    * use the UNCAPPED per-host totals, so the guard can only drop shared
    * evidence, never inflate a score. */
  def mirrorHosts(pages: DataFrame, minShared: Long = 2,
                  maxHostsPerHash: Int = 50): DataFrame = {
    val hh = pages
      .select(canonicalHost(col("url")).as("host"),
        md5(col("text").cast("binary")).as("h"))
      .distinct()
    val capped = hh
      .withColumn("nh", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("nh") <= maxHostsPerHash)
      .drop("nh")
    val totals = hh.groupBy("host").agg(count(lit(1)).as("n"))
    val l = capped.select(col("host").as("host_a"), col("h"))
    val r = capped.select(col("host").as("host_b"), col("h"))
    l.join(r, "h").filter(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(totals.select(col("host").as("host_a"), col("n").as("n_a")), "host_a")
      .join(totals.select(col("host").as("host_b"), col("n").as("n_b")), "host_b")
      .select(col("host_a"), col("host_b"), col("shared"),
        round(col("shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))
  }

  /** Error-template text [[withSoft404]] injects — a constant shared with
    * the oracle SQL (single-source-of-truth contract). */
  val Soft404Text = "404 page not found on "

  /** Deterministic soft-404 synthesis (the [[TextOps.withMojibake]]
    * pattern): docs with `doc_id % 9 == 4` have their text REPLACED by the
    * host's error template — a server that answers HTTP 200 with the same
    * "not found" page at every dead URL, the classic crawl pathology.
    * Templates embed the host so they collide only WITHIN a host, and the
    * damaged ids hit every host (9 and 7 are coprime). Mirrored in the
    * oracle SQL. */
  def withSoft404(docs: DataFrame): DataFrame =
    withUrls(docs).select(col("doc_id"), col("url"),
      when(col("doc_id") % 9 === 4,
        concat(lit(Soft404Text), canonicalHost(col("url"))))
        .otherwise(col("text")).as("text"))

  /** Soft-404 / parked-template detection (cf. Bar-Yossef et al., "Sic
    * Transit Gloria Telae", WWW 2004 — soft-404s are pages that answer 200
    * with error content; an OFFLINE crawl detects them structurally as one
    * host serving IDENTICAL text at many distinct URLs): per (host,
    * template) groups with `n_urls ≥ minUrls` distinct canonical URLs.
    * Catches error templates, parked domains, and within-host mirror
    * paths — the pages a curation pipeline drops before dedup (they would
    * otherwise dominate a host's quota).
    *
    * Scale shape: map-only canonicalization riding the corpus scan; ONE
    * aggregation keyed on (host, text) — `countDistinct` plans the
    * standard two-phase expand (partials map-side). At 100 TB the exchange
    * key is the (host, 128-bit text hash) pair ([[Dedup.exact]]'s collision
    * math; verbatim text kept here because the oracle recomputes on raw
    * strings — the same documented trade as [[chunkDedup]]). Group count is
    * bounded by distinct templates per host, never corpus-quadratic. */
  def soft404(pages: DataFrame, minUrls: Long = 2): DataFrame =
    pages.select(canonicalHost(col("url")).as("host"),
        canonicalUrl(col("url")).as("canon_url"), col("text"))
      .groupBy("host", "text")
      .agg(countDistinct(col("canon_url")).as("n_urls"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_urls") >= minUrls)
      .select(col("host"), col("text").as("template_text"),
        col("n_urls"), col("n_docs"))

  /** DuckDB twin of [[withSoft404]] + [[soft404]] — full query SQL. */
  def soft404Sql: String =
    s"""WITH pg AS (SELECT doc_id, $urlSqlExpr AS url, text FROM documents),
        dm AS (SELECT doc_id, url,
                 CASE WHEN doc_id % 9 = 4
                      THEN '$Soft404Text' || ${canonHostSqlOf("url")}
                      ELSE text END AS text
               FROM pg)
        SELECT ${canonHostSqlOf("url")} AS host, text AS template_text,
          COUNT(DISTINCT ${canonUrlSqlOf("url")}) AS n_urls,
          COUNT(*) AS n_docs
        FROM dm
        GROUP BY 1, 2
        HAVING COUNT(DISTINCT ${canonUrlSqlOf("url")}) >= 2"""

  /** Per-domain page quota (the training-data domain-mix cap: no host may
    * contribute more than `quota` pages — C4/Gopher-style source balancing
    * so boilerplate farms don't dominate the corpus). Selection within a
    * host is by the portable md5-derived hash of the canonical URL
    * (doc_id tie-break) — an unbiased, deterministic, cross-engine-
    * reproducible choice, unlike "first N by id" (crawl order) or rng.
    *
    * Scale shape: one window partitioned by HOST (millions of partitions at
    * crawl scale — parallel; no global window). A pathological single host
    * funnels only ITS rows through one task; with per-host row counts far
    * above memory, the two-phase variant (per-host count agg → hash
    * threshold ≈ quota/count → exact top-up) replaces the sort — the cap
    * here is the correctness contract either way. */
  def domainQuota(docs: DataFrame, quota: Int): DataFrame = {
    val ranked = canonicalize(docs)
      .withColumn("host", canonicalHost(col("url")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("host"))
          .orderBy(Sketch.hash60(col("canon_url")), col("doc_id"))))
    ranked.filter(col("rn") <= quota)
      .select(col("doc_id"), col("host"), col("canon_url"))
  }

  /** Two-phase [[domainQuota]] — IDENTICAL output (same hash order, same
    * tie-break; the verify gate runs both against one oracle), built for the
    * host whose row count exceeds task memory. [[domainQuota]]'s window
    * already plans a map-side WindowGroupLimit, but a window partition can
    * never be SPLIT across tasks — one pathological host still funnels its
    * surviving rows through one task. Here:
    *
    *  1. per-host count aggregation (map-side partials);
    *  2. hash-threshold prefilter: keep a row iff its [[Sketch.hash60]] is
    *     within `margin · quota / cnt` of the hash space (hosts at/below
    *     quota keep everything). The selection key is a prefix of the hash
    *     order, so if ≥ quota rows survive, the quota smallest survivors ARE
    *     the quota smallest overall — the threshold value affects only the
    *     survivor count, never correctness;
    *  3. underflow fallback: hosts whose survivors fell below
    *     min(quota, cnt) (probability ≈ e^(-quota·(margin−1)²/2·…) — tiny,
    *     but exactness must not rest on probability) are re-taken WHOLE; the
    *     `bad` host set is ~empty and broadcast to both legs;
    *  4. exact window top-up over survivors — now ≤ ~margin·quota rows per
    *     host, so no host exceeds a task.
    *
    * The count join on `host` is skewed by the same mega-host, but JOINS are
    * AQE-skew-splittable (a skewed join partition can be split because a
    * join never needs all of a key's rows in one task) — windows are not,
    * which is exactly what this buys. */
  def domainQuotaTwoPhase(docs: DataFrame, quota: Int,
                          margin: Double = 2.0): DataFrame = {
    val rows = canonicalize(docs)
      .withColumn("host", canonicalHost(col("url")))
      .withColumn("h", Sketch.hash60(col("canon_url")))
    val counts = rows.groupBy("host").agg(count(lit(1)).as("cnt"))
    val withCnt = rows.join(counts, "host")
    // double math: the threshold needs ~consistency, not exactness (step 2)
    val thresh = lit(margin * quota * math.pow(2, 60)) / col("cnt").cast("double")
    val pre = withCnt.filter(col("cnt") <= quota || col("h").cast("double") <= thresh)
    // LEFT join from counts: a host whose prefilter kept ZERO rows has no
    // pre-side group at all — it must still be flagged as underflowed
    val bad = counts
      .join(pre.groupBy("host").agg(count(lit(1)).as("kept")), Seq("host"), "left")
      .filter(coalesce(col("kept"), lit(0L)) < least(lit(quota.toLong), col("cnt")))
      .select(col("host"))
    val survivors = pre.join(broadcast(bad), Seq("host"), "left_anti")
      .unionByName(withCnt.join(broadcast(bad), Seq("host"), "left_semi"))
    survivors
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= quota)
      .select(col("doc_id"), col("host"), col("canon_url"))
  }

  /** C4-style repeated-passage removal (Raffel et al. 2020 drop duplicate
    * three-sentence spans corpus-wide, keeping one occurrence; Lee et al.
    * 2021 dedups exact substrings). The driver corpus is single-line word
    * soup, so the passage granularity here is a fixed window of
    * `chunkTokens` whitespace tokens (last chunk may be shorter). A chunk
    * occurrence survives iff it is the FIRST occurrence corpus-wide (min
    * (doc_id, pos)); docs are rebuilt from their surviving chunks in order.
    *
    * Scale shape: chunking is a map-side explode; "first occurrence" is a
    * min(struct(doc_id, pos)) HASH AGGREGATION — NOT a row_number window —
    * so hot boilerplate chunks partial-aggregate map-side instead of
    * serializing into one window partition. The chunk key is the
    * [[Dedup.exact]] 128-bit form — two independently-seeded xxhash64
    * values + the length — so the chunk-keyed exchanges carry ~24-byte
    * keys, NEVER the chunk text (a colliding pair of distinct chunks
    * merges two survivors with probability ~2^-128·pairs; the verbatim-text
    * DuckDB oracle re-proves the shortcut on every verify run, the
    * dedup_exact contract). Surviving positions aggregate per doc (another
    * text-free exchange), and each doc is REBUILT by re-chunking its own
    * text locally and keeping the surviving positions — the only exchange
    * that carries text is the one doc_id-keyed rebuild join, which is
    * output-sized by definition. */
  def chunkDedup(docs: DataFrame, chunkTokens: Int = 20): DataFrame = {
    val toks = split(col("text"), " ")
    // split() never returns an empty array (worst case [""]), so nChunks
    // >= 1 and the sequence below never descends (Dedup.shingles guard
    // rationale)
    val nChunks = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    val chunkArr = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " "))
    // pass 1 (chunk-keyed, text-free): first occurrence per 128-bit chunk key
    val keyed = docs.select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
      .select(xxhash64(lit(1), col("chunk")).as("h1"),
        xxhash64(lit(2), col("chunk")).as("h2"),
        length(col("chunk")).as("n"), col("doc_id"), col("pos"))
    val kept = keyed.groupBy("h1", "h2", "n")
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
    // pass 2 (doc-keyed, text-free): surviving positions per doc
    val keepPos = kept.groupBy(col("k.doc_id").as("doc_id"))
      .agg(sort_array(collect_list(col("k.pos"))).as("keep"))
    // rebuild: re-chunk each doc's own text in place (map-side — the same
    // chunkArr expression) and keep surviving positions in order
    val tagged = transform(chunkArr, (c, i) =>
      struct(i.as("pos"), c.as("chunk")))
    docs.select(col("doc_id"), col("text"))
      .join(keepPos, Seq("doc_id"), "left") // null keep → all chunks drop
      .select(col("doc_id"),
        array_join(transform(
          filter(tagged, s => array_contains(col("keep"), s.getField("pos"))),
          s => s.getField("chunk")), " ").as("text_dedup"))
  }

  /** Sitemap-vs-crawl gap report (the sitemaps.org discovery loop: each
    * host publishes a sitemap.xml; the crawler diffs it against what it
    * already fetched to find NEW work — the declared-URL complement of the
    * link-graph [[graft.ops.LinkGraph]] frontier). Synthesis: every host's
    * sitemap lists the urls of ids `0..2N-1` (each doc contributes its own
    * id and `id + N`), so exactly the `id + N` tail that does NOT collide
    * back onto a crawled canonical URL (hosts cycle mod 7, paths mod 40 —
    * collisions are the point) is undiscovered. Output per canonical host:
    * `n_listed` distinct canonical locs, `n_crawled` of them already
    * fetched, `n_new` to enqueue.
    *
    * Scale shape: the corpus-size scalar N rides a broadcast 1-row
    * crossJoin (never a driver action); listing + crawl are short
    * canonical-URL keys; ONE distinct + ONE left-semi-style flag join +
    * ONE host agg — at 10^12 pages the sitemap table is per-host metadata,
    * orders of magnitude smaller than the corpus. */
  def sitemapGap(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val ids = docs.select(col("doc_id")).crossJoin(broadcast(n))
      .select(explode(array(col("doc_id"), col("doc_id") + col("n_docs")))
        .as("id"))
    val listed = ids.select(canonicalUrl(syntheticUrl(col("id"))).as("loc"))
      .distinct()
    val crawled = docs
      .select(canonicalUrl(syntheticUrl(col("doc_id"))).as("loc"))
      .distinct()
      .withColumn("crawled", lit(1L))
    listed.join(crawled, Seq("loc"), "left")
      .groupBy(canonicalHost(col("loc")).as("host"))
      .agg(count(lit(1)).as("n_listed"),
        sum(coalesce(col("crawled"), lit(0L))).as("n_crawled"),
        sum(when(col("crawled").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_new"))
  }

  /** Max pagination-chain length [[pageChains]] resolves — covered in
    * ⌈log₂⌉ doubling rounds. Real paginated articles run to dozens of
    * pages; the constant is the hop BUDGET, not a data assumption (longer
    * chains would surface as split chains, the same failure mode as
    * [[resolveRedirects]]' `looped` flag). */
  val MaxChainLen = 8

  /** Pagination-chain reassembly (the crawl post-processing step real
    * pipelines run before dedup: a multi-page article split across
    * `rel="next"` pages must merge back into ONE document, else every
    * page of it looks like a near-dup head/tail fragment). Synthesis:
    * docs with `doc_id % 10 ∈ {1,2,3}` chain as `10k+1 → 10k+2 → 10k+3`
    * via rel-next edges (guarded by the max id so truncated tails still
    * resolve); everything else is a singleton.
    *
    * POINTER DOUBLING with position accumulation (the list-ranking form
    * of [[resolveRedirects]]): state `(page, ptr, d)` means `ptr` is the
    * node `d` prev-hops up; each round composes the map with itself —
    * `(ptr, d) ∘ (ptr', d') = (ptr', d + d')` — so roots (ptr = self,
    * d = 0) absorb and ⌈log₂ [[MaxChainLen]]⌉ keyed self-joins resolve
    * every page to `(root, position)`. Per-round localCheckpoint keeps
    * plan depth constant (the Lloyd rule). The final per-chain merge is
    * ONE root-keyed agg whose groups are chain-length-bounded (never
    * corpus-bounded), text ordered by the computed position. */
  def pageChains(docs: DataFrame): DataFrame = {
    def pg(id: Column) = concat(lit("doc://"), id.cast("string"))
    val maxId = docs.agg(max(col("doc_id")).as("max_id"))
    val edges = docs.crossJoin(broadcast(maxId))
      .filter(col("doc_id") % 10 === 1 || col("doc_id") % 10 === 2)
      .filter(col("doc_id") < col("max_id"))
      .select(pg(col("doc_id")).as("src"), pg(col("doc_id") + 1).as("dst"))
    val prev = edges.select(col("dst").as("page"), col("src").as("prev"))
    val pages = docs.select(pg(col("doc_id")).as("page"), col("text"))
    var f = pages.select(col("page")).join(prev, Seq("page"), "left")
      .select(col("page"), coalesce(col("prev"), col("page")).as("ptr"),
        when(col("prev").isNull, lit(0L)).otherwise(lit(1L)).as("d"))
      .localCheckpoint()
    var hops = 1
    while (hops < MaxChainLen) {
      val g = f.select(col("page").as("g_page"), col("ptr").as("g_ptr"),
        col("d").as("g_d"))
      f = f.join(g, f("ptr") === col("g_page"))
        .select(f("page"), col("g_ptr").as("ptr"),
          (f("d") + col("g_d")).as("d"))
        .localCheckpoint()
      hops *= 2
    }
    f.join(pages, "page")
      .groupBy(col("ptr").as("root"))
      .agg(count(lit(1)).as("n_pages"),
        array_join(
          transform(array_sort(collect_list(struct(col("d"), col("text")))),
            s => s.getField("text")), " ").as("merged_text"))
  }

  /** DuckDB twin of [[pageChains]] — the synthesized chains are ≤ 3 pages,
    * so ONE composition of the prev-map with itself (depth ≤ 2) reaches
    * every root; merge order recomputed from the same positions. */
  def pageChainsSql: String =
    s"""WITH nn AS (SELECT MAX(doc_id) AS max_id FROM documents),
        edges AS (SELECT doc_id AS s, doc_id + 1 AS t
                  FROM documents, nn
                  WHERE doc_id % 10 IN (1, 2) AND doc_id < max_id),
        prv AS (SELECT t AS page, s AS prev FROM edges),
        p1 AS (SELECT d.doc_id AS page, COALESCE(p.prev, d.doc_id) AS r1,
                 CASE WHEN p.prev IS NULL THEN 0 ELSE 1 END AS d1
               FROM documents d LEFT JOIN prv p ON d.doc_id = p.page),
        p2 AS (SELECT a.page, b.r1 AS root, a.d1 + b.d1 AS pos
               FROM p1 a JOIN p1 b ON a.r1 = b.page)
        SELECT 'doc://' || p2.root AS root,
          CAST(COUNT(*) AS BIGINT) AS n_pages,
          string_agg(d.text, ' ' ORDER BY p2.pos) AS merged_text
        FROM p2 JOIN documents d ON p2.page = d.doc_id
        GROUP BY 1"""

  /** DuckDB twin of [[sitemapGap]] — full query SQL. */
  def sitemapGapSql: String =
    s"""WITH nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        ids AS (SELECT doc_id AS id FROM documents
                UNION ALL SELECT doc_id + nd.n_docs FROM documents, nd),
        listed AS (SELECT DISTINCT ${canonUrlSqlOf("u")} AS loc
                   FROM (SELECT ${urlSqlExprOf("id")} AS u FROM ids)),
        crawled AS (SELECT DISTINCT ${canonUrlSqlOf("u")} AS loc, 1 AS crawled
                    FROM (SELECT $urlSqlExpr AS u FROM documents))
        SELECT ${canonHostSqlOf("l.loc")} AS host,
          CAST(COUNT(*) AS BIGINT) AS n_listed,
          CAST(SUM(COALESCE(c.crawled, 0)) AS BIGINT) AS n_crawled,
          CAST(SUM(CASE WHEN c.crawled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new
        FROM listed l LEFT JOIN crawled c ON l.loc = c.loc
        GROUP BY 1"""
}
