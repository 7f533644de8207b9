package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knowledge-fusion operators for KG construction: combining the SAME fact
  * extracted by INDEPENDENT extractors into one calibrated confidence — the
  * Knowledge Vault shape (Dong et al., KDD 2014): each extractor `e`
  * carries a precision prior `p_e`, and a fact seen by extractor set `E`
  * scores `1 − Π_{e∈E} (1 − p_e)` (noisy-OR under independent extractor
  * errors). The reference pipeline emits each annotation from exactly one
  * recognizer; at web scale the SAME (page, concept) fact arrives through
  * several independent channels (page text, lemmatized text, incoming
  * anchor text), and fusing them is what turns raw extractions into a
  * ranked, thresholdable KG.
  */
object Relations {

  /** Extractor precision priors for the web-KG fusion query: page-content
    * dictionary annotation (high precision — exact surface match),
    * lemmatized annotation (recovers inflections, slightly noisier), and
    * incoming anchor-text entity linking (what OTHER pages call a page —
    * independent but noisiest). SINGLE SOURCE for both the Column code and
    * the oracle-SQL literals. */
  val ExtractorPriors: Seq[(String, Double)] = Seq(
    "direct" -> 0.95, "lemma" -> 0.85, "anchor" -> 0.5)

  /** Hearst lexico-syntactic patterns (Hearst, COLING 1992 — the classic
    * open-taxonomy extractor): `(name, regex, swapped)` where group 1/2 are
    * hypernym/hyponym unless `swapped`. Java∩RE2-identical subset (`\w` is
    * ASCII word chars in both engines), so the SAME strings drive the
    * Column code and the oracle SQL. */
  val HearstRules: Seq[(String, String, Boolean)] = Seq(
    ("such_as", "(\\w+) such as (\\w+)", false),
    ("and_other", "(\\w+) and other (\\w+)", true),
    ("including", "(\\w+) including (\\w+)", false),
    ("especially", "(\\w+) , especially (\\w+)", false))

  /** Hearst-sentence synthesis for [[hearstPairs]]: the corpus texts carry
    * no such-as phrasing, so each doc gets ONE pattern sentence appended,
    * built from two of its own tokens at deterministic positions, cycling
    * through all four [[HearstRules]] shapes on `doc_id % 4`. Mirrored in
    * [[hearstPagesCteSql]]. */
  def withHearst(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val t1 = element_at(t, ((col("doc_id") * 3) % size(t)).cast("int") + 1)
    val t2 = element_at(t, ((col("doc_id") * 5) % size(t)).cast("int") + 1)
    val sent = when(col("doc_id") % 4 === 0, concat(t1, lit(" such as "), t2))
      .when(col("doc_id") % 4 === 1, concat(t2, lit(" and other "), t1))
      .when(col("doc_id") % 4 === 2, concat(t1, lit(" including "), t2))
      .otherwise(concat(t1, lit(" , especially "), t2))
    docs.select(col("doc_id"),
      concat(col("text"), lit(" . "), sent, lit(" .")).as("text"))
  }

  /** Token-at-deterministic-position SQL fragment shared by every
    * sentence-synthesis CTE twin (Hearst, OpenRE) — one definition of the
    * CAST/indexing shape. */
  private def tokAtSql(mult: Int): String =
    s"t[CAST(doc_id * $mult % len(t) AS INT) + 1]"

  /** DuckDB CTE twin of [[withHearst]] — `hpage(doc_id, text)`. */
  def hearstPagesCteSql: String = {
    val (t1, t2) = (tokAtSql(3), tokAtSql(5))
    s"""htoks AS (SELECT doc_id, text, string_split(text, ' ') AS t
                  FROM documents),
        hpage AS (SELECT doc_id, text || ' . ' ||
            CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN $t1 || ' such as ' || $t2
              WHEN 1 THEN $t2 || ' and other ' || $t1
              WHEN 2 THEN $t1 || ' including ' || $t2
              ELSE $t1 || ' , especially ' || $t2 END || ' .' AS text
          FROM htoks)"""
  }

  /** Hearst-pattern candidate is-a extraction over raw text: all four
    * [[HearstRules]] regexes run per page, matches zip group 1 against
    * group 2 by occurrence index (the LinkGraph href/anchor idiom), and
    * each match lands as one `(doc_id, hypernym, hyponym, pattern)` row,
    * surfaces lower-cased.
    *
    * Scale shape: map-only — `regexp_extract_all` + `posexplode` per rule,
    * ZERO shuffles until whatever aggregation follows; as wide as the
    * corpus scan itself at 10^12 pages (the link-extraction argument). */
  def hearstPairs(docs: DataFrame): DataFrame =
    HearstRules.map { case (name, re, swapped) =>
      val g1 = regexp_extract_all(col("text"), lit(re), lit(1))
      val g2 = regexp_extract_all(col("text"), lit(re), lit(2))
      val zipped = docs
        .select(col("doc_id"), posexplode(g1).as(Seq("i", "m1")), g2.as("g2"))
        .select(col("doc_id"), col("m1"),
          element_at(col("g2"), col("i") + 1).as("m2"))
      val (hyper, hypo) = if (swapped) (col("m2"), col("m1"))
                          else (col("m1"), col("m2"))
      zipped.select(col("doc_id"), lower(hyper).as("hypernym"),
        lower(hypo).as("hyponym"), lit(name).as("pattern"))
    }.reduce(_ unionByName _)

  /** Per-pair support over [[hearstPairs]] output: distinct-doc and total
    * mention counts — ONE hash aggregation on short surface-pair keys. */
  def hearstSupport(pairs: DataFrame): DataFrame =
    pairs.groupBy("hypernym", "hyponym")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_mentions"))

  /** Verb-frame open relation extraction rules (OpenIE-lite — the ReVerb
    * surface shape, Banko et al. 2007 / Fader et al. 2011), restricted to
    * fixed frames in the Java∩RE2-identical subset so the SAME strings
    * drive the Column code and the oracle SQL: group 1 = subject surface,
    * group 2 = object surface. The non-taxonomic complement of
    * [[HearstRules]] — these emit ARBITRARY relations for the KG, not
    * is-a edges. */
  val VerbRules: Seq[(String, String)] = Seq(
    ("causes", "(\\w+) causes (\\w+)"),
    ("treats", "(\\w+) treats (\\w+)"),
    ("part_of", "(\\w+) is part of (\\w+)"),
    ("interacts_with", "(\\w+) interacts with (\\w+)"))

  /** Relation-sentence synthesis for [[openRelations]] (the [[withHearst]]
    * discipline): each doc gets ONE verb-frame sentence from two of its own
    * tokens at deterministic positions (×9 / ×13 — distinct from the
    * Hearst and microdata multipliers), cycling the four [[VerbRules]]
    * frames on `doc_id % 4`. Mirrored in [[relPagesCteSql]]. */
  def withRelSentences(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val t1 = element_at(t, ((col("doc_id") * 9) % size(t)).cast("int") + 1)
    val t2 = element_at(t, ((col("doc_id") * 13) % size(t)).cast("int") + 1)
    val sent = when(col("doc_id") % 4 === 0, concat(t1, lit(" causes "), t2))
      .when(col("doc_id") % 4 === 1, concat(t1, lit(" treats "), t2))
      .when(col("doc_id") % 4 === 2, concat(t1, lit(" is part of "), t2))
      .otherwise(concat(t1, lit(" interacts with "), t2))
    docs.select(col("doc_id"),
      concat(col("text"), lit(" . "), sent, lit(" .")).as("text"))
  }

  /** DuckDB CTE twin of [[withRelSentences]] — `rpage(doc_id, text)`. */
  def relPagesCteSql: String = {
    val (t1, t2) = (tokAtSql(9), tokAtSql(13))
    s"""rtoks AS (SELECT doc_id, text, string_split(text, ' ') AS t
                  FROM documents),
        rpage AS (SELECT doc_id, text || ' . ' ||
            CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN $t1 || ' causes ' || $t2
              WHEN 1 THEN $t1 || ' treats ' || $t2
              WHEN 2 THEN $t1 || ' is part of ' || $t2
              ELSE $t1 || ' interacts with ' || $t2 END || ' .' AS text
          FROM rtoks)"""
  }

  /** Open relation candidates over raw text: every [[VerbRules]] frame per
    * page, groups zipped by occurrence index (the [[hearstPairs]] idiom),
    * surfaces lower-cased — `(doc_id, subj_surface, rel, obj_surface)`.
    * Map-only; resolution against the dictionary and support aggregation
    * are the caller's (the `kg_openre` composition). */
  def openRelations(docs: DataFrame): DataFrame =
    VerbRules.map { case (name, re) =>
      val g1 = regexp_extract_all(col("text"), lit(re), lit(1))
      val g2 = regexp_extract_all(col("text"), lit(re), lit(2))
      docs
        .select(col("doc_id"), posexplode(g1).as(Seq("i", "m1")), g2.as("g2"))
        .select(col("doc_id"), lower(col("m1")).as("subj_surface"),
          lit(name).as("rel"),
          lower(element_at(col("g2"), col("i") + 1)).as("obj_surface"))
    }.reduce(_ unionByName _)

  /** Microdata extraction regexes (schema.org HTML annotations — the Web
    * Data Commons shape: most structured web KG data arrives as
    * itemscope/itemprop markup). Java∩RE2-identical subset, shared with
    * the oracle SQL. */
  val MicroTypeRe: String = "itemtype=\"https://schema\\.org/(\\w+)\""
  val MicroPropRe: String = "<span itemprop=\"(\\w+)\">([^<]*)</span>"

  /** Item types cycled by the synthesis (and recognized by the oracle). */
  val MicroTypes: Seq[String] = Seq("Article", "Product", "Person")

  /** Microdata page synthesis for [[microdataTriples]]: each doc becomes a
    * page with ONE schema.org item — itemtype cycling [[MicroTypes]] on
    * `doc_id % 3`, a `name` property from the doc's own tokens, and an
    * `author` property on even docs only (so the extractor must handle
    * absent properties). Mirrored in [[microdataPagesCteSql]]. */
  def withMicrodata(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val ty = element_at(array(MicroTypes.map(lit): _*),
      (col("doc_id") % 3).cast("int") + 1)
    val v1 = element_at(t, ((col("doc_id") * 7) % size(t)).cast("int") + 1)
    val v2 = element_at(t, ((col("doc_id") * 11) % size(t)).cast("int") + 1)
    val html = concat(lit("<html><body><p>"), col("text"),
      lit("</p><div itemscope itemtype=\"https://schema.org/"), ty,
      lit("\"><span itemprop=\"name\">"), v1, lit("</span>"),
      when(col("doc_id") % 2 === 0,
        concat(lit("<span itemprop=\"author\">"), v2, lit("</span>")))
        .otherwise(lit("")),
      lit("</div></body></html>"))
    docs.select(col("doc_id"), WebOps.syntheticUrl(col("doc_id")).as("url"),
      html.as("html"))
  }

  /** DuckDB CTE twin of [[withMicrodata]] — `mdpg(doc_id, url, html)`. */
  def microdataPagesCteSql: String = {
    val tyList = MicroTypes.map(t => s"'$t'").mkString(", ")
    s"""mdpg AS (SELECT doc_id, ${WebOps.urlSqlExpr} AS url,
          '<html><body><p>' || text
          || '</p><div itemscope itemtype="https://schema.org/'
          || ([$tyList])[CAST(doc_id % 3 AS INT) + 1] || '">'
          || '<span itemprop="name">'
          || ${tokAtSql(7)} || '</span>'
          || CASE WHEN doc_id % 2 = 0
                  THEN '<span itemprop="author">'
                    || ${tokAtSql(11)} || '</span>'
                  ELSE '' END
          || '</div></body></html>' AS html
        FROM (SELECT doc_id, text, string_split(text, ' ') AS t
              FROM documents))"""
  }

  /** schema.org microdata → triples (the structured-data leg of web KG
    * construction, next to the text-annotation and link legs): every
    * `itemtype` becomes `(url, rdf:type, schema:<Type>)`, every itemprop
    * span `(url, schema:<prop>, <value>)`, prop/value zipped by occurrence
    * index (the LinkGraph href/anchor idiom).
    *
    * Scale shape: map-only regex extraction + posexplode — zero shuffles
    * until the final distinct (url collisions under the synthesis dedup;
    * at crawl scale the distinct is the usual short-key exchange). */
  def microdataTriples(pages: DataFrame): DataFrame = {
    val types = pages
      .select(col("url").as("subj"),
        explode(regexp_extract_all(col("html"), lit(MicroTypeRe), lit(1)))
          .as("t"))
      .select(col("subj"), lit("rdf:type").as("pred"),
        concat(lit("schema:"), col("t")).as("obj"))
    val p1 = regexp_extract_all(col("html"), lit(MicroPropRe), lit(1))
    val p2 = regexp_extract_all(col("html"), lit(MicroPropRe), lit(2))
    val props = pages
      .select(col("url").as("subj"), posexplode(p1).as(Seq("i", "prop")),
        p2.as("vals"))
      .select(col("subj"), concat(lit("schema:"), col("prop")).as("pred"),
        element_at(col("vals"), col("i") + 1).as("obj"))
    types.unionByName(props).distinct()
  }

  /** JSON-LD script-block regex (the OTHER schema.org carrier next to
    * microdata — in real crawls `<script type="application/ld+json">` is
    * the dominant structured-data format, cf. Web Data Commons format
    * splits). Non-greedy body capture; Java∩RE2-identical subset. */
  val JsonLdScriptRe: String =
    "<script type=\"application/ld\\+json\">(.*?)</script>"

  /** JSON-LD page synthesis for [[jsonLdTriples]]: each doc carries ONE
    * head-embedded JSON-LD object — `@type` cycling [[MicroTypes]] on
    * `doc_id % 3`, a `name` from the doc's own tokens, and on even docs a
    * NESTED `author` Person object (so the extractor must flatten a nested
    * entity, which microdata's flat spans never exercise). Mirrored in
    * [[jsonLdPagesCteSql]]. */
  def withJsonLd(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val ty = element_at(array(MicroTypes.map(lit): _*),
      (col("doc_id") % 3).cast("int") + 1)
    val v1 = element_at(t, ((col("doc_id") * 13) % size(t)).cast("int") + 1)
    val v2 = element_at(t, ((col("doc_id") * 17) % size(t)).cast("int") + 1)
    val json = concat(
      lit("{\"@context\":\"https://schema.org\",\"@type\":\""), ty,
      lit("\",\"name\":\""), v1, lit("\""),
      when(col("doc_id") % 2 === 0,
        concat(lit(",\"author\":{\"@type\":\"Person\",\"name\":\""), v2,
          lit("\"}"))).otherwise(lit("")),
      lit("}"))
    val html = concat(
      lit("<html><head><script type=\"application/ld+json\">"), json,
      lit("</script></head><body><p>"), col("text"),
      lit("</p></body></html>"))
    docs.select(col("doc_id"), WebOps.syntheticUrl(col("doc_id")).as("url"),
      html.as("html"))
  }

  /** DuckDB CTE twin of [[withJsonLd]] — `jlpg(doc_id, url, html)`. */
  def jsonLdPagesCteSql: String = {
    val tyList = MicroTypes.map(t => s"'$t'").mkString(", ")
    s"""jlpg AS (SELECT doc_id, ${WebOps.urlSqlExpr} AS url,
          '<html><head><script type="application/ld+json">'
          || '{"@context":"https://schema.org","@type":"'
          || ([$tyList])[CAST(doc_id % 3 AS INT) + 1]
          || '","name":"' || ${tokAtSql(13)} || '"'
          || CASE WHEN doc_id % 2 = 0
                  THEN ',"author":{"@type":"Person","name":"'
                    || ${tokAtSql(17)} || '"}'
                  ELSE '' END
          || '}</script></head><body><p>' || text
          || '</p></body></html>' AS html
        FROM (SELECT doc_id, text, string_split(text, ' ') AS t
              FROM documents))"""
  }

  /** JSON-LD → triples (the script-block structured-data leg of web KG
    * construction, completing the carrier pair with [[microdataTriples]]):
    * the script body is cut by ONE regex, parsed by Spark's native
    * `from_json` (codegen'd Jackson — never a UDF), and flattened:
    * top-level `@type`/`name` attach to the page URL; a nested `author`
    * object is MINTED as a fragment node `url#author` with its own
    * `rdf:type` + `schema:name` triples plus the `(url, schema:author,
    * url#author)` spine — the standard JSON-LD-to-RDF node-minting shape
    * (deterministic fragment ids in place of blank nodes, like the
    * NT writer's blank-node policy).
    *
    * Scale shape: map-only — regex cut + JSON parse + struct field access
    * are all per-row expressions; the only exchange is the final
    * set-semantics distinct on short triple rows. */
  def jsonLdTriples(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val person = StructType(Seq(
      StructField("@type", StringType), StructField("name", StringType)))
    val sch = StructType(Seq(
      StructField("@type", StringType), StructField("name", StringType),
      StructField("author", person)))
    val j = from_json(
      regexp_extract(col("html"), JsonLdScriptRe, 1), sch)
    val base = pages.select(col("url"), j.as("j"))
      .select(col("url"), col("j.`@type`").as("ty"),
        col("j.name").as("nm"), col("j.author.`@type`").as("aty"),
        col("j.author.name").as("anm"))
    val pageTy = base.filter(col("ty").isNotNull)
      .select(col("url").as("subj"), lit("rdf:type").as("pred"),
        concat(lit("schema:"), col("ty")).as("obj"))
    val pageNm = base.filter(col("nm").isNotNull)
      .select(col("url").as("subj"), lit("schema:name").as("pred"),
        col("nm").as("obj"))
    val authorNode = concat(col("url"), lit("#author"))
    val spine = base.filter(col("anm").isNotNull)
      .select(col("url").as("subj"), lit("schema:author").as("pred"),
        authorNode.as("obj"))
    val aTy = base.filter(col("anm").isNotNull && col("aty").isNotNull)
      .select(authorNode.as("subj"), lit("rdf:type").as("pred"),
        concat(lit("schema:"), col("aty")).as("obj"))
    val aNm = base.filter(col("anm").isNotNull)
      .select(authorNode.as("subj"), lit("schema:name").as("pred"),
        col("anm").as("obj"))
    Seq(pageTy, pageNm, spine, aTy, aNm).reduce(_ unionByName _).distinct()
  }

  /** Fuse extraction events `(subj, obj, extractor)` into per-fact rows
    * `(subj, obj, n_extractors, confidence)` with the noisy-OR above.
    *
    * Scale shape: ONE hash aggregation on the short (subj, obj) fact key
    * (map-side partials — an extractor emitting a fact a million times
    * still ships one flag per map partition), the per-extractor presence
    * folded as max-indicators, and the noisy-OR computed as a FIXED literal
    * expression whose multiplication order follows `priors` — order-pinned,
    * so the oracle's identical expression is IEEE-bit-equal (each factor is
    * one of two exact constants because the flags are 0/1). Events whose
    * extractor has no prior are dropped up front: the prior IS an
    * extractor's license to vote. */
  def tripleConfidence(events: DataFrame,
                       priors: Seq[(String, Double)] = ExtractorPriors): DataFrame = {
    require(priors.nonEmpty, "at least one extractor prior required")
    require(priors.map(_._1).distinct.size == priors.size,
      "extractor names must be unique")
    val flags = priors.map { case (e, _) =>
      max(when(col("extractor") === e, lit(1.0)).otherwise(lit(0.0))).as(s"f_$e")
    }
    val miss = priors
      .map { case (e, p) => lit(1.0) - lit(p) * col(s"f_$e") }
      .reduce(_ * _)
    events
      .filter(col("extractor").isin(priors.map(_._1): _*))
      .groupBy(col("subj"), col("obj"))
      .agg(flags.head, flags.tail: _*)
      .select(col("subj"), col("obj"),
        priors.map(e => col(s"f_${e._1}")).reduce(_ + _).cast("int")
          .as("n_extractors"),
        round(lit(1.0) - miss, 6).as("confidence"))
  }

  /** FUNCTIONAL-PROPERTY fact fusion (the Knowledge Vault / truth-discovery
    * step after [[tripleConfidence]]): when extractors claim CONFLICTING
    * objects for a subject whose predicate admits only one value (here: a
    * page's primary concept), pick the highest-confidence candidate and
    * report how contested the choice was. Output per subject: the winning
    * object, its noisy-OR confidence, its extractor count, and `margin` =
    * winner confidence − runner-up confidence (0-coalesced for uncontested
    * subjects) — the downstream curation signal for "send to human review".
    * Ties break on object IRI ascending (deterministic cross-engine).
    *
    * Scale shape: [[tripleConfidence]]'s one fact-key aggregation, then a
    * per-subject top-2 window — `rn <= 2` plans as a map-side
    * WindowGroupLimit (each task forwards at most 2 rows per subject before
    * the exchange, the domain-quota precedent), then one subject-keyed
    * pivot aggregation. No self-join of the evidence stream. */
  def factFusion(events: DataFrame,
                 priors: Seq[(String, Double)] = ExtractorPriors): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conf = tripleConfidence(events, priors)
    val w = Window.partitionBy(col("subj"))
      .orderBy(col("confidence").desc, col("obj"))
    conf.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy("subj")
      .agg(
        max(when(col("rn") === 1, col("obj"))).as("obj"),
        max(when(col("rn") === 1, col("confidence"))).as("confidence"),
        max(when(col("rn") === 1, col("n_extractors"))).as("n_extractors"),
        round(max(when(col("rn") === 1, col("confidence")))
          - coalesce(max(when(col("rn") === 2, col("confidence"))), lit(0.0)),
          6).as("margin"))
  }

  /** Fusion-vs-published-KG AUDIT: bucket the fused noisy-OR confidences
    * into `buckets` equal bins and measure, per bin, how many candidate
    * facts are already in the published KG (`published`) — the triage view
    * a release pass reads to promote high-confidence UNPUBLISHED facts
    * (the KB-completion intake) and to flag confidence bands that
    * contribute nothing. NOT a calibration curve: with no external truth
    * the in-KG rate against any internally-derived set is partly
    * tautological (a direct-extractor vote implies membership); the honest
    * claim is the candidate/published set difference by band.
    *
    * Scale shape: [[tripleConfidence]]'s one fact-key aggregation, one
    * LEFT join against the published set on the same short fact key, ONE
    * hash aggregation on the bin id (`buckets` groups, map-side partials).
    * The bin id is exact: confidences are ROUND(6) combinations of the
    * fixed priors, so `floor(conf × buckets)` is the same integer in both
    * engines. */
  def fusionAudit(events: DataFrame, published: DataFrame,
                  priors: Seq[(String, Double)] = ExtractorPriors,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"fusionAudit needs >= 2 buckets, got $buckets")
    val conf = tripleConfidence(events, priors)
    conf
      .join(published.select(col("subj"), col("obj")).distinct()
        .withColumn("g", lit(1L)), Seq("subj", "obj"), "left")
      .withColumn("g", coalesce(col("g"), lit(0L)))
      .withColumn("bucket", floor(col("confidence") * buckets).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_facts"), sum(col("g")).as("n_in_kg"),
        round(avg(col("confidence")), 6).as("mean_conf"),
        round(sum(col("g")) / count(lit(1)), 6).as("in_kg_rate"))
  }

  /** [[truthFinder]] knobs — SINGLE SOURCE shared with the oracle SQL.
    * 2 synchronous rounds (the trust/confidence mutual recursion converges
    * geometrically; the oracle unrolls the same rounds) from a flat 0.8
    * trust prior (every extractor starts equally credible — the iteration,
    * not a hand-set prior, is what separates them). */
  val TfRounds = 2
  val TfPrior = 0.8

  /** TruthFinder-style iterative source-reliability fusion (Yin, Han & Yu,
    * TKDE 2008 — the mutual recursion: a source is trustworthy if its
    * claims are confident, a claim is confident if trustworthy sources
    * make it). The PRIOR-FREE complement of [[tripleConfidence]]: there the
    * per-extractor precisions are hand-set constants; here they are
    * LEARNED from claim overlap alone. Simplified as named decisions: no
    * implication function between claims and no ln(1−t) dampening (the
    * paper's refinements for near-1 trust), and the data item is the fact
    * itself — mutual exclusion between conflicting objects is
    * [[factFusion]]'s job downstream.
    *
    * Per round: claim confidence = noisy-OR of the claiming sources'
    * CURRENT trust (multiplication order pinned by `sources`); source
    * trust = claims-weighted mean confidence of its claims, with
    * confidences carried as exact MICRO-UNIT longs (`round(conf·10⁶)`) so
    * the weighted mean is INTEGER arithmetic — order-free, engine-exact —
    * until one final pinned division.
    *
    * Scale shape — the reason this iterates for free: a claim's confidence
    * depends only on WHICH sources assert it, so the corpus-scale work is
    * ONE hash aggregation of the evidence stream into per-fact source-set
    * flags (short fact keys, map-side partials, runs once — pinned), and
    * every round operates on the ≤ 2^k−1-row signature-count table with
    * 1-row pivots broadcast back: per-round cost is INDEPENDENT of corpus
    * size (the partitionLp loads-table discipline taken to its limit).
    * Final confidences re-attach by broadcast join on the k-bit signature. */
  private def truthFinderCore(events: DataFrame, sources: Seq[String],
                              rounds: Int, prior: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    require(rounds >= 1, s"truthFinder needs rounds >= 1, got $rounds")
    require(sources.nonEmpty && sources.distinct.size == sources.size,
      "source names must be non-empty and unique")
    val flags = sources.map(e =>
      max(when(col("extractor") === e, lit(1L)).otherwise(lit(0L)))
        .as(s"f_$e"))
    val sig = events.filter(col("extractor").isin(sources: _*))
      .groupBy(col("subj"), col("obj"))
      .agg(flags.head, flags.tail: _*)
      .localCheckpoint() // the one corpus-scale agg: feeds sigCnt + attach
    val fcols = sources.map(e => col(s"f_$e"))
    val sigCnt = sig.groupBy(fcols: _*).agg(count(lit(1)).as("n"))
      .localCheckpoint() // ≤ 2^k−1 rows; read every round
    var trust = sig.sparkSession.range(1)
      .select(sources.map(e => lit(prior).as(s"t_$e")): _*)
    var confSig: DataFrame = null
    for (_ <- 1 to rounds) {
      val miss = sources
        .map(e => lit(1.0) - col(s"t_$e") * col(s"f_$e"))
        .reduce(_ * _)
      confSig = sigCnt.crossJoin(broadcast(trust))
        .withColumn("conf6",
          round((lit(1.0) - miss) * lit(1000000.0), 0).cast("long"))
      val parts = sources.flatMap { e =>
        Seq(
          sum(when(col(s"f_$e") === 1L, col("n") * col("conf6"))
            .otherwise(lit(0L))).as(s"num_$e"),
          sum(when(col(s"f_$e") === 1L, col("n")).otherwise(lit(0L)))
            .as(s"den_$e"))
      }
      confSig = confSig.localCheckpoint() // ≤ 2^k−1 rows; trust legs + attach
      trust = confSig.agg(parts.head, parts.tail: _*)
        .select(sources.map(e =>
          when(col(s"den_$e") > 0,
            round(col(s"num_$e") / (col(s"den_$e") * lit(1000000.0)), 6))
            .otherwise(lit(prior)).as(s"t_$e")): _*)
        .localCheckpoint() // 1 row: plan depth constant in rounds (Lloyd rule)
    }
    (sig, confSig, trust)
  }

  /** [[truthFinderCore]] fact view: `(subj, obj, n_extractors, confidence)`
    * with the learned-trust noisy-OR confidence after [[TfRounds]] rounds —
    * directly comparable with [[tripleConfidence]]'s prior-based column. */
  def truthFinder(events: DataFrame,
                  sources: Seq[String] = ExtractorPriors.map(_._1),
                  rounds: Int = TfRounds, prior: Double = TfPrior): DataFrame = {
    val (sig, confSig, _) = truthFinderCore(events, sources, rounds, prior)
    val keys = sources.map(e => s"f_$e")
    sig.join(broadcast(confSig), keys)
      .select(col("subj"), col("obj"),
        sources.map(e => col(s"f_$e")).reduce(_ + _).cast("int")
          .as("n_extractors"),
        (col("conf6") / lit(1000000.0)).as("confidence"))
  }

  /** [[truthFinderCore]] source view: `(extractor, trust, n_facts)` — the
    * LEARNED per-extractor reliability after [[TfRounds]] rounds plus each
    * extractor's claim count; the release-time sanity check against the
    * hand-set [[ExtractorPriors]]. */
  def truthFinderTrust(events: DataFrame,
                       sources: Seq[String] = ExtractorPriors.map(_._1),
                       rounds: Int = TfRounds, prior: Double = TfPrior): DataFrame = {
    val (_, confSig, trust) = truthFinderCore(events, sources, rounds, prior)
    val dens = confSig.agg(
      sum(when(col(s"f_${sources.head}") === 1L, col("n")).otherwise(lit(0L)))
        .as(s"den_${sources.head}"),
      sources.tail.map(e =>
        sum(when(col(s"f_$e") === 1L, col("n")).otherwise(lit(0L)))
          .as(s"den_$e")): _*)
    val one = trust.crossJoin(dens)
    sources.map(e =>
        one.select(lit(e).as("extractor"), col(s"t_$e").as("trust"),
          col(s"den_$e").as("n_facts")))
      .reduce(_ unionAll _)
  }

  /** FILTERED negative sampling for KG-embedding training (Bordes et al.
    * 2013, TransE; the "filtered" protocol of the standard benchmarks):
    * each positive `(subj, pred, obj)` yields up to `k` corrupted triples
    * whose object is swapped for a pseudo-random entity — deterministic
    * (the corruption index is the portable 60-bit hash of the triple + slot,
    * never rng state), with self-corruptions and corruptions that happen to
    * be TRUE triples filtered out rather than resampled (dropped negatives
    * are the documented protocol; resampling would need data-dependent
    * iteration).
    *
    * Scale shape: the entity pool is the distinct OBJECT side — ontology-
    * scale, so its dense ids come from one tiny window and the pool rides a
    * broadcast join keyed on `hash % n`; the positives stream is map-only
    * (explode ×k + one hash column) until the final left-anti against the
    * positives themselves — one shuffle on the short triple key, the same
    * cost as any dedup pass over the training set. */
  def negatives(triples: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 1, s"negatives per positive must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    // positives feed three consumers (entity pool, candidates, the final
    // anti-join): pin once so the upstream lineage runs once
    val t = triples.select(col("subj"), col("pred"), col("obj"))
      .localCheckpoint()
    val ents = t.select(col("obj").as("neg_obj")).distinct()
      .withColumn("eid",
        row_number().over(Window.orderBy("neg_obj")).cast("long") - 1)
      .localCheckpoint() // ontology-scale; pinned for the count + the join
    val n = ents.count()
    val cand = t
      .select(col("subj"), col("pred"), col("obj"),
        explode(array((0 until k).map(lit): _*)).as("slot"))
      .withColumn("eid", pmod(Sketch.hash60(
        concat_ws("|", col("subj"), col("pred"), col("obj"), col("slot"))),
        lit(n)))
      .join(broadcast(ents), "eid")
      .filter(col("neg_obj") =!= col("obj"))
      .select(col("subj"), col("pred"), col("obj"), col("slot"),
        col("neg_obj"))
    cand.join(
      t.select(col("subj"), col("pred"), col("obj").as("neg_obj")),
      Seq("subj", "pred", "neg_obj"), "left_anti")
      .select(col("subj"), col("pred"), col("obj"), col("slot"),
        col("neg_obj")) // the USING join fronts its keys; re-pin the order
  }

  /** TYPE-CONSTRAINED corruptions (Krompaß, Baier & Tresp, ISWC 2015) —
    * [[negatives]] with the pool restricted to entities sharing the true
    * object's semantic type: the published eval refinement that measures
    * SEMANTICS rather than type discrimination (an untyped corruption of
    * a disease object by a random URL is trivially scored away; the
    * same-type corruption is the hard negative). Policies, all mirrored
    * by the oracle: multi-typed objects take their MIN type (the
    * deterministic primary-type rule); positives whose object has no type
    * row drop (no pool to corrupt within); a single-object type yields no
    * corruption (self-corruption filtered — there is nothing of that type
    * to corrupt to).
    *
    * Scale shape: [[negatives]]' exactly, with the dense-id window
    * PARTITIONED by type (ontology-scale frames — bounded windows, and
    * the per-type pool sizes ride a broadcast); candidate eid = the same
    * portable hash mod the TYPE pool size. */
  def negativesTyped(triples: DataFrame, objTypes: DataFrame,
                     k: Int = 2): DataFrame = {
    require(k >= 1, s"negatives per positive must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val t = triples.select(col("subj"), col("pred"), col("obj"))
      .localCheckpoint()
    val ot = objTypes.select(col("obj"), col("tui"))
      .groupBy("obj").agg(min(col("tui")).as("tui")).localCheckpoint()
    val ents = t.select(col("obj").as("neg_obj")).distinct()
      .join(broadcast(ot.select(col("obj").as("neg_obj"), col("tui"))),
        "neg_obj")
      .withColumn("eid", row_number().over(
        Window.partitionBy("tui").orderBy("neg_obj")).cast("long") - 1)
      .localCheckpoint()
    val sizes = ents.groupBy("tui").agg(count(lit(1)).as("n_t"))
    val cand = t
      .join(broadcast(ot), "obj")
      .select(col("subj"), col("pred"), col("obj"), col("tui"),
        explode(array((0 until k).map(lit): _*)).as("slot"))
      .join(broadcast(sizes), "tui")
      .withColumn("eid", pmod(Sketch.hash60(
        concat_ws("|", col("subj"), col("pred"), col("obj"), col("slot"))),
        col("n_t")))
      .join(broadcast(ents), Seq("tui", "eid"))
      .filter(col("neg_obj") =!= col("obj"))
      .select(col("subj"), col("pred"), col("obj"), col("slot"),
        col("neg_obj"))
    cand.join(
      t.select(col("subj"), col("pred"), col("obj").as("neg_obj")),
      Seq("subj", "pred", "neg_obj"), "left_anti")
      .select(col("subj"), col("pred"), col("obj"), col("slot"),
        col("neg_obj"))
  }

  /** Every Nth token is followed by an injected pronoun in the coref
    * synthesis — SINGLE SOURCE for [[withPronouns]] and its CTE twin. */
  val PronounEvery = 6

  /** Predicate minted by [[corefMentions]] (shared with the oracle SQL). */
  val CorefPred = "corefMention"

  /** Pronoun-injection synthesis for [[corefMentions]] (the [[withHearst]]
    * discipline): the corpus texts carry no anaphora, so every
    * [[PronounEvery]]-th token is followed by an injected `it`. Mirrored
    * in the `kg_coref` oracle's token-rebuild CTE (DuckDB's lambda index
    * is 1-based where Spark's is 0-based — hence `(i+1) % N` here vs
    * `i % N` there). */
  def withPronouns(docs: DataFrame): DataFrame =
    docs.select(concat(lit("doc://"), col("doc_id")).as("url"),
      array_join(flatten(transform(split(col("text"), " "),
        (x, i) => when((i + lit(1)) % PronounEvery === 0,
          array(x, lit("it"))).otherwise(array(x)))), " ").as("text"))

  /** Rule-based pronominal coreference resolution (the Hobbs-naive
    * "nearest preceding mention" baseline — the classic recall-first
    * anaphora rule): each pronoun resolves to the dictionary mention whose
    * span ends NEAREST BEFORE it in the same document, and the resolved
    * pronoun emits an extra `(url, corefMention, class_iri)` fact — the
    * KG-construction stage that recovers the mentions entity annotation
    * alone cannot see. A pronoun whose nearest mention is ambiguous (one
    * surface term, several concepts) links to ALL of them, exactly like
    * the direct annotation it extends.
    *
    * Takes the REAL annotator's match stream (`annotateMatches` — char
    * offsets on the injected text), so coref sits downstream of the
    * flagship scan rather than re-implementing matching. Char offsets
    * convert to token positions with one per-doc running-length window
    * (exact on the single-space token stream), and pronoun→antecedent
    * linking is a second per-doc window over the merged
    * mention-end/pronoun event stream — NEVER a per-doc theta join.
    *
    * Scale shape: every window and join is keyed on `url` (one exchange,
    * reused across all four steps by Catalyst since the partitioning
    * matches); window frames are bounded by document length (the S2
    * length-bucketed repartition holds the skew bound). The final fact agg
    * is short-key (url, class_iri) with map-side partials. */
  def corefMentions(pages: DataFrame, matches: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = pages
      .select(col("url"), posexplode(split(col("text"), " ")).as(Seq("i", "tok")))
    val offW = Window.partitionBy("url").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    // 1-based char start of each token on the single-space-joined stream
    val withOff = toks
      .withColumn("p", col("i") + 1)
      .withColumn("start",
        coalesce(sum(length(col("tok")) + 1).over(offW), lit(0L)) + 1)
    val tokEnds = withOff.select(col("url"),
      (col("start") + length(col("tok")) - 1).as("endc"), col("p").as("endp"))
    // mention spans -> token-end positions (matches end on token
    // boundaries by construction: the corpus is single-space tokens)
    val ments = matches
      .select(col("url"), col("to").as("endc"), col("class_iri")).distinct()
      .join(tokEnds, Seq("url", "endc"))
      .select(col("url"), col("endp"), col("class_iri"))
    val prons = withOff.filter(col("tok") === "it")
      .select(col("url"), col("p"))
    // merged event stream: mention ends (kind 0) and pronouns (kind 1);
    // positions never tie across kinds ('it' is no term's last token)
    val events = ments.select(col("url"), col("endp").as("pos"),
        lit(0).as("kind")).distinct()
      .unionByName(prons.select(col("url"), col("p").as("pos"),
        lit(1).as("kind")))
    val evW = Window.partitionBy("url").orderBy("pos", "kind")
      .rowsBetween(Window.unboundedPreceding, -1)
    val linked = events
      .withColumn("last_end", max(when(col("kind") === 0, col("pos"))).over(evW))
      .filter(col("kind") === 1 && col("last_end").isNotNull)
      .select(col("url"), col("pos").as("pron_p"), col("last_end").as("endp"))
    linked.join(ments, Seq("url", "endp"))
      .groupBy(col("url"), col("class_iri"))
      .agg(count_distinct(col("pron_p")).as("n_pronouns"))
      .select(col("url").as("subj"), lit(CorefPred).as("pred"),
        col("class_iri").as("obj"), col("n_pronouns"))
  }

  /** DuckDB CTE twin of [[withPronouns]] + the token/mention/pronoun
    * scaffolding of [[corefMentions]] — `ctoks` (rebuilt token arrays),
    * `cpos` (1-based positions), `cments` (token n-gram dictionary
    * mentions with END positions; token-space matching coincides with the
    * engine's boundary semantics on this single-space corpus, the same
    * argument the `direct` CTE rests on), `cprons` (pronoun positions).
    * Composes with the standard `dict` CTE. */
  /** Relation schema induction over the open-extracted concept facts —
    * the SchemEX/Knowledge-Vault "relation typing" step: for each
    * extracted relation, induce its DOMAIN and RANGE as the modal UMLS
    * semantic type (TUI) of its subject/object concepts, with the share
    * of (fact, tui) observations the modal type explains. A relation
    * whose domain share is low is polysemous or noisy — the signal a KG
    * curator uses to split or drop predicates before publication.
    *
    * Inputs: `facts` = DISTINCT `(subj_iri, rel, obj_iri)` concept
    * triples (the `kg_openre` pre-aggregation set); `tuis` =
    * `(class_iri, tui)` exploded semantic types (a concept may carry
    * several — shares are over the EXPLODED observation count, mirrored
    * by the oracle).
    *
    * Determinism: the modal type is `min(struct(-cnt, tui))` — max count,
    * then lexicographically-first TUI on ties — the exact order the
    * oracle's `ROW_NUMBER() OVER (ORDER BY cnt DESC, tui)` walks. Shares
    * are exact long-ratio doubles, rounded 6dp.
    *
    * Scale shape: the facts table can be web-scale, but every agg here
    * keys on (rel, tui) — cardinality ≤ |relations| × |TUIs|, tiny — so
    * partial aggregation collapses map-side; the TUI table is a broadcast
    * dimension on both legs; the final assembly joins three
    * relation-keyed frames of ≤ |relations| rows. No corpus-sized
    * shuffle anywhere. */
  def schemaInduction(facts: DataFrame, tuis: DataFrame): DataFrame = {
    val f = facts.select("subj_iri", "rel", "obj_iri").distinct()
    val nFacts = f.groupBy("rel").agg(count(lit(1)).as("n_facts"))
    def modal(side: String, outTui: String, outShare: String): DataFrame = {
      val cnt = f
        .join(broadcast(tuis.select(col("class_iri").as(side), col("tui"))),
          side)
        .groupBy(col("rel"), col("tui")).agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy("rel").agg(sum("cnt").as("tot"))
      cnt
        .groupBy("rel")
        .agg(min(struct((-col("cnt")).as("neg"), col("tui"))).as("m"))
        .select(col("rel"), col("m.tui").as(outTui), (-col("m.neg")).as("mc"))
        .join(tot, "rel")
        .select(col("rel"), col(outTui),
          round(col("mc").cast("double") / col("tot"), 6).as(outShare))
    }
    nFacts
      .join(modal("subj_iri", "domain_tui", "domain_share"), "rel")
      .join(modal("obj_iri", "range_tui", "range_share"), "rel")
      .select(col("rel"), col("n_facts"), col("domain_tui"),
        col("domain_share"), col("range_tui"), col("range_share"))
  }

  def corefCtesSql: String =
    s"""ctoks AS (SELECT 'doc://' || doc_id AS url,
            flatten(list_transform(string_split(text, ' '),
              (x, i) -> CASE WHEN i % $PronounEvery = 0
                             THEN [x, 'it'] ELSE [x] END)) AS t
          FROM documents),
        cpos AS (SELECT url, t, unnest(generate_series(1, len(t))) AS p
                 FROM ctoks),
        cments AS (SELECT DISTINCT c.url,
            c.p + len(string_split(d.term, ' ')) - 1 AS endp, d.class_iri
          FROM cpos c, dict d
          WHERE upper(array_to_string(
              c.t[c.p : c.p + len(string_split(d.term, ' ')) - 1], ' '))
            = d.term),
        cprons AS (SELECT url, p FROM cpos WHERE t[p] = 'it')"""

  // ---- typed-literal facts ------------------------------------------------

  /** Literal-injection synthesis for `kg_literals` (the damage-synthesis
    * discipline of TextOps.withMojibake): every 4th doc gains a reading
    * like ` measured 371 units on 2024-05-08` with doc_id-derived digits —
    * deterministic positives, and the other 3/4 of the corpus are negative
    * controls (the raw synthesis text carries no digits). */
  def withLiterals(docs: DataFrame): DataFrame = {
    val qty = ((col("doc_id") * 7) % 1000).cast("string")
    val mm = lpad(((col("doc_id") % 12) + 1).cast("string"), 2, "0")
    val dd = lpad(((col("doc_id") % 28) + 1).cast("string"), 2, "0")
    docs.select(concat(lit("doc://"), col("doc_id")).as("url"),
      when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" measured "), qty, lit(" units on 2024-"),
          mm, lit("-"), dd))
        .otherwise(col("text")).as("text"))
  }

  /** ISO-date / unit-quantity patterns — Java∩RE2-identical subset, SINGLE
    * SOURCE with the `kg_literals` oracle SQL. */
  val DateRe = "\\d{4}-\\d{2}-\\d{2}"
  val QtyRe = "(\\d+) units"

  /** Typed-literal fact extraction: ISO dates and unit-bearing quantities
    * in page text become (url, pred, obj, obj_type) rows — the xsd-typed
    * complement of the concept annotations (real KGs carry literal-valued
    * attribute slots next to IRIs; cf. Dong et al., KDD 2014 §2). Each leg
    * is regexp_extract_all + explode riding the corpus scan map-only; the
    * final distinct is the A12 set-semantics contract (ONE exchange on
    * short literal keys — at 10^12 docs this is as wide as the scan until
    * that single dedup exchange). */
  def literalFacts(pages: DataFrame): DataFrame = {
    val dates = pages.select(col("url"),
        explode(regexp_extract_all(col("text"), lit(DateRe), lit(0)))
          .as("obj"))
      .select(col("url"), lit("hasDate").as("pred"), col("obj"),
        lit("xsd:date").as("obj_type"))
    val qtys = pages.select(col("url"),
        explode(regexp_extract_all(col("text"), lit(QtyRe), lit(1)))
          .as("obj"))
      .select(col("url"), lit("hasQuantity").as("pred"), col("obj"),
        lit("xsd:integer").as("obj_type"))
    dates.unionByName(qtys).distinct()
  }

  // ---- abbreviation definitions -------------------------------------------

  /** Abbreviation-definition synthesis for `ann_abbrev`: every 5th doc
    * appends a definition span built from its own first three tokens —
    * tokens (fast, column, table) → ` fast column table (FCT)` — and every
    * 10th doc ALSO appends a non-matching span ` bad wrong phrase (XYZ)`
    * (the false-positive control: parenthesized caps whose letters do not
    * head the preceding tokens). */
  def withAbbrevs(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val w1 = element_at(t, 1)
    val w2 = element_at(t, 2)
    val w3 = element_at(t, 3)
    val sf = upper(concat(
      substring(w1, 1, 1), substring(w2, 1, 1), substring(w3, 1, 1)))
    val withDef = when(col("doc_id") % 5 === 0,
      concat(col("text"), lit(" "), w1, lit(" "), w2, lit(" "), w3,
        lit(" ("), sf, lit(")"))).otherwise(col("text"))
    val withNeg = when(col("doc_id") % 10 === 0,
      concat(withDef, lit(" bad wrong phrase (XYZ)"))).otherwise(withDef)
    docs.select(concat(lit("doc://"), col("doc_id")).as("url"),
      withNeg.as("text"))
  }

  /** Definition-span pattern: three lowercase tokens followed by a
    * parenthesized 3-letter uppercase short form. Java∩RE2-identical,
    * SINGLE SOURCE with the oracle SQL. */
  val AbbrevRe = "([a-z]+) ([a-z]+) ([a-z]+) \\(([A-Z]{3})\\)"

  /** Schwartz–Hearst-style abbreviation-definition detection (Schwartz &
    * Hearst, PSB 2003 — the standard biomedical abbreviation extractor,
    * exactly the reference annotator's corpus domain): a parenthesized
    * short form pairs with the |SF| tokens preceding the '(' and is
    * validated by the FIRST-LETTER rule — each short-form character must
    * head the corresponding long-form token (S&H's published baseline;
    * their backward-scan refinement relaxes this to in-order containment
    * and is the documented flip point). Invalid spans are KEPT with
    * valid = false — the review queue, not silent drops. Map-only: one
    * regexp_extract_all + explode, per-span group re-extraction, letter
    * checks as column conjunctions; the distinct is one short-key
    * exchange. */
  def abbrevDefs(pages: DataFrame): DataFrame = {
    val spans = pages.select(col("url"),
      explode(regexp_extract_all(col("text"), lit(AbbrevRe), lit(0)))
        .as("span"))
    def g(i: Int) = regexp_extract(col("span"), AbbrevRe, i)
    spans.select(col("url"),
        concat_ws(" ", g(1), g(2), g(3)).as("long_form"),
        g(4).as("short_form"),
        (upper(substring(g(1), 1, 1)) === substring(g(4), 1, 1) &&
         upper(substring(g(2), 1, 1)) === substring(g(4), 2, 1) &&
         upper(substring(g(3), 1, 1)) === substring(g(4), 3, 1)).as("valid"))
      .distinct()
  }
}
