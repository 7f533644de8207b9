package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.annotate.{Corpus, Expand, Filters, Scan, Scoring}
import graft.dict.{AnnotatorModel, AutomatonBuild, DictBuild}
import graft.emit.Triples
import graft.fixture.OntologyFixture
import graft.graph.Closure
import graft.ops.{AsOf, Dedup, LinkGraph, Multimodal, RangeJoin, Sampling, Similarity, Sketch, TextOps, WebOps}
import graft.streaming.EventStream

/** Driver contract (SURVEY.md §6.2): one `queries` entry per implemented
  * operator; `oracleSql` gives the DuckDB-equivalent ANSI SQL over the same
  * parquet tables for every SQL-expressible operator. The deterministic
  * ontology fixture is inlined into the oracle SQL as VALUES (single source
  * of truth: [[OntologyFixture]]), so even the annotation pipeline itself is
  * DuckDB-checked, not just rows-only. Non-SQL-expressible ops (automaton
  * longest-only offsets, hash-based LSH/simhash/fingerprints, binary
  * multimodal plumbing) are covered by the in-repo naive-matcher/scalar
  * oracles in the test suite instead.
  *
  * Column-name parity rule: every aggregate/computed column is aliased to the
  * SAME name in both the Spark query and the oracle SQL (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  // ---- shared fixture-model plumbing (cached per session) ---------------

  private val modelCache = new ConcurrentHashMap[SparkSession, Broadcast[AnnotatorModel]]()
  private val closureCache = new ConcurrentHashMap[SparkSession, DataFrame]()
  private val mapsCache =
    new ConcurrentHashMap[SparkSession, Broadcast[graft.annotate.FusedAnnotate.ExpansionMaps]]()

  private def fusedMaps(s: SparkSession): Broadcast[graft.annotate.FusedAnnotate.ExpansionMaps] =
    mapsCache.computeIfAbsent(s, s => s.sparkContext.broadcast(
      graft.annotate.FusedAnnotate.expansionMaps(
        closure(s), OntologyFixture.mappingsDf(s), MaxLevel)))

  private def model(s: SparkSession): Broadcast[AnnotatorModel] =
    modelCache.computeIfAbsent(s, s => {
      val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(s)))
      AutomatonBuild.broadcastModel(s, AutomatonBuild.build(s, dict, "v1"))
    })

  private val modelV2Cache = new ConcurrentHashMap[SparkSession, Broadcast[AnnotatorModel]]()
  private def modelV2(s: SparkSession): Broadcast[AnnotatorModel] =
    modelV2Cache.computeIfAbsent(s, s => {
      val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsV2Df(s)))
      AutomatonBuild.broadcastModel(s, AutomatonBuild.build(s, dict, "v2"))
    })

  /** The fixture's v1→v2 dictionary delta — ONE definition for both the
    * `dict_diff` and `ann_incremental` queries (diverging copies would
    * silently test different deltas). */
  private def fixtureDictUpdate(s: SparkSession): graft.annotate.Incremental.DictUpdate =
    graft.annotate.Incremental.diff(
      DictBuild.flatDict(DictBuild.build(
        DictBuild.labelRows(OntologyFixture.conceptsDf(s)))),
      DictBuild.flatDict(DictBuild.build(
        DictBuild.labelRows(OntologyFixture.conceptsV2Df(s)))))

  /** ONE v1→v2 incremental-update orchestration shared by
    * `ann_incremental` (whose oracle proves incremental == full v2
    * recompute) and `kg_fact_diff` (the release diff built ON that
    * guarantee) — diverging copies would silently exercise different
    * update flows. Returns (v1 triples, v2-via-incremental triples); v1 is
    * pinned once (it feeds the incremental anti-join and callers' reuse). */
  private def incrementalV1V2(s: SparkSession,
                              dir: String): (DataFrame, DataFrame) = {
    val c = corpus(s, dir)
    val v1T = graft.annotate.NativeAnnotate
      .annotateTriples(c, model(s), fusedMaps(s), "v1").localCheckpoint()
    val affected = graft.annotate.Incremental.affectedUrls(
      s, c, matches(s, dir), fixtureDictUpdate(s))
    val v2T = graft.annotate.Incremental
      .incrementalTriples(c, v1T, affected, "v2", slice =>
        graft.annotate.NativeAnnotate
          .annotateTriples(slice, modelV2(s), fusedMaps(s), "v2"))
    (v1T, v2T)
  }

  private val shardedCache =
    new ConcurrentHashMap[SparkSession, Seq[Broadcast[AnnotatorModel]]]()
  private def shardedModels(s: SparkSession): Seq[Broadcast[AnnotatorModel]] =
    shardedCache.computeIfAbsent(s, s => {
      val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(s)))
      graft.annotate.Sharded.buildModels(s, dict, "v1", numShards = 4)
    })

  private def closure(s: SparkSession): DataFrame =
    closureCache.computeIfAbsent(s, s =>
      Closure.transitiveClosure(OntologyFixture.edgesDf(s), MaxLevel))

  private val MaxLevel = 5

  private val lemmaModelCache = new ConcurrentHashMap[SparkSession, Broadcast[AnnotatorModel]]()
  private def lemmaModel(s: SparkSession): Broadcast[AnnotatorModel] =
    lemmaModelCache.computeIfAbsent(s, s => {
      val dict = DictBuild.buildLemmatized(DictBuild.labelRows(OntologyFixture.conceptsDf(s)))
      AutomatonBuild.broadcastModel(s, AutomatonBuild.build(s, dict, "v1-lemma"))
    })

  /** Pre-build every session-cached dictionary-side artifact (automaton,
    * shard models, lemma model, closure, expansion maps). The bench calls
    * this OUTSIDE its timed sections: dictionary builds are offline
    * per-dict-version work (BASELINE.md excludes them from the headline),
    * and without the pre-warm the first timed run of whichever query first
    * touches a cold cache pays it — BENCH_r02's ann_sharded=3.5 s was the
    * one-time 4-shard build + a drift window, not the scan (interleaved
    * QueryProbe: warm sharded scan ≈ 1.03× ann_direct). */
  def warmCaches(s: SparkSession): Unit = {
    model(s); shardedModels(s); lemmaModel(s); closure(s); fusedMaps(s)
  }

  private def docsTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic dictionary-snapshot timeline for the as-of query —
    * weekly snapshots spanning the seeded events month, with the first two
    * days uncovered so the no-version-yet (NULL) leg is exercised. Epoch
    * instants (TZ-proof); the oracle inlines the same instants as UTC
    * TIMESTAMP literals. */
  private[graft] val DictSnapshots: Seq[(java.sql.Timestamp, String)] =
    Seq("2024-01-03" -> "v1", "2024-01-08" -> "v2", "2024-01-15" -> "v3",
        "2024-01-22" -> "v4", "2024-01-29" -> "v5").map { case (d, v) =>
      java.sql.Timestamp.from(java.time.Instant.parse(s"${d}T00:00:00Z")) -> v
    }

  /** `kg_asof_snapshot`'s point-in-time instant: base epoch + one week +
    * 250 doc-minutes — docs with id ≤ 250 (and a snapshot-2 capture) read
    * from the re-crawl at T, the rest from snapshot 1, so the as-of
    * frontier mixes both captures at every SF. Shared with the oracle. */
  private[graft] val AsOfEpoch = 1700000000L + 604800L + 15000L

  /** Visits in the `kg_fact_intervals` capture history — odd visits keep
    * only the first half of the tokens, so second-half facts flicker into
    * multiple validity intervals (shared with the oracle SQL). */
  private[graft] val FactVisits = 6

  /** Document-frequency floor for `dict_stop_candidates` (shared with the
    * oracle SQL): a term matching in ≥ this fraction of the corpus is a
    * stop-list candidate. */
  private[graft] val StopDfFloor = 0.5

  /** Candidate functional dependencies for `q_fd_discovery` —
    * `(table, lhs columns, rhs column)`, a deterministic mix of holding
    * (key-implied) and failing candidates; SINGLE SOURCE for the Column
    * code and the oracle SQL. */
  private val FdCandidates: Seq[(String, Seq[String], String)] = Seq(
    ("orders", Seq("o_orderkey"), "o_custkey"), // key → holds
    ("orders", Seq("o_custkey"), "o_orderstatus"), // repeat customers
    ("orders", Seq("o_orderstatus"), "o_orderpriority"),
    ("lineitem", Seq("l_orderkey", "l_linenumber"), "l_partkey"), // composite key
    ("lineitem", Seq("l_partkey"), "l_suppkey"),
    ("lineitem", Seq("l_suppkey"), "l_returnflag"))

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Corpus.extract(Corpus.fromDriverTable(docsTable(s, dir)))

  /** Shared direct-match stream — the NATIVE Generator scan, so every ann_*
    * oracle query downstream exercises the scale path; `ann_direct_typed`
    * keeps the typed mapPartitions form under the same DuckDB oracle. */
  private def matches(s: SparkSession, dir: String): DataFrame =
    graft.annotate.NativeAnnotate.annotateMatches(corpus(s, dir), model(s))

  /** Shared 3-extractor evidence stream `(subj, obj, extractor)` — direct
    * dictionary annotation, lemma annotation, and incoming anchor-text
    * entity linking, all keyed to the page's canonical URL. Feeds
    * `kg_triple_confidence` (noisy-OR per fact) and `kg_fact_fusion`
    * (functional-property winner per page). */
  private def extractionEvidence(s: SparkSession, dir: String): DataFrame = {
    val umap = WebOps.withUrls(docsTable(s, dir)).select(
      concat(lit("doc://"), col("doc_id")).as("doc_url"),
      WebOps.canonicalUrl(col("url")).as("subj"))
    val dEv = matches(s, dir)
      .select(col("url").as("doc_url"), col("class_iri")).distinct()
      .join(umap, "doc_url")
      .select(col("subj"), col("class_iri").as("obj"),
        lit("direct").as("extractor"))
    val lEv = graft.annotate.LemmaScan
      .annotateDirectLemma(corpus(s, dir), lemmaModel(s)).toDF()
      .select(col("url").as("doc_url"),
        col("classIri").as("class_iri")).distinct()
      .join(umap, "doc_url")
      .select(col("subj"), col("class_iri").as("obj"),
        lit("lemma").as("extractor"))
    val aEv = {
      val anchors = LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))
        .select(col("dst_url").as("url"), col("anchor").as("text")).distinct()
      graft.annotate.NativeAnnotate.annotateMatches(anchors, model(s))
        .select(col("url").as("subj"), col("class_iri").as("obj")).distinct()
        .select(col("subj"), col("obj"), lit("anchor").as("extractor"))
    }
    dEv.unionByName(lEv).unionByName(aEv)
  }

  /** Flagship: full annotate pipeline (direct + expansions → triples) on the
    * smoke slice, on the scale path (per-doc aggregation folded into the
    * scan — [[graft.annotate.ScanAgg]]); driver checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val direct = graft.annotate.ScanAgg
      .annotateDirectAgg(corpus(spark, dir), model(spark)).toDF()
    val hier = Expand.hierarchy(direct, closure(spark), MaxLevel, assumeUnique = true)
    val mapped = Expand.mappings(direct, OntologyFixture.mappingsDf(spark),
      assumeUnique = true)
    Triples.assemble(direct, hier, mapped, "v1")
  }

  // ---- queries ----------------------------------------------------------

  private val queriesSeq: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // A2/A3: direct dictionary annotation (distinct doc × concept × type)
    "ann_direct" -> ((s, dir) =>
      matches(s, dir).select("url", "class_iri", "ont", "match_type").distinct()),

    // A2 on the typed mapPartitions form — same oracle as ann_direct, so
    // both scan formulations stay independently DuckDB-checked
    "ann_direct_typed" -> ((s, dir) =>
      Scan.annotateDirect(corpus(s, dir), model(s)).toDF()
        .select(col("url"), col("classIri").as("class_iri"), col("ont"),
          col("matchType").as("match_type")).distinct()),

    // S4: sharded-dictionary scan (>driver-memory escape hatch) — 4 term-id
    // shards, one corpus pass, cross-shard longest_only semantics; must
    // equal the single-automaton result, so it shares ann_direct's oracle.
    // Runs the NATIVE sharded Generator (the scale path); the typed form
    // stays parity-tested in ShardedSpec
    "ann_sharded" -> ((s, dir) =>
      graft.annotate.NativeAnnotate
        .annotateMatchesSharded(corpus(s, dir), shardedModels(s))
        .select("url", "class_iri", "ont", "match_type").distinct()),

    // A2 all-occurrence counts per (doc, concept)
    "ann_counts" -> ((s, dir) =>
      matches(s, dir).groupBy("url", "class_iri")
        .agg(count(lit(1)).as("n_matches"))),

    // A5 longest_only WITH offsets — DuckDB-checked: the oracle recovers
    // match positions from regexp-split segment lengths and applies the
    // per-start-max-end contract as a window filter
    "ann_longest" -> ((s, dir) =>
      Scan.annotateDirect(corpus(s, dir), model(s), longestOnly = true).toDF()
        .select(col("url"), col("from"), col("to"), col("text"),
          col("classIri").as("class_iri"), col("ont"),
          col("matchType").as("match_type"))),

    // accent-folded matching (A1 normalization extension): fold-then-
    // annotate with a 1:1 translate map — same-length fold, so offsets
    // stay valid against the ORIGINAL accented text; every third doc is
    // accent-damaged by the synthesis (unfolded, those docs lose all
    // matches — the spec's negative control)
    "ann_folded" -> ((s, dir) => {
      val acc = TextOps.withAccents(docsTable(s, dir))
      graft.annotate.NativeAnnotate.annotateMatches(
        acc.select(col("url"),
          TextOps.foldAccents(col("text")).as("text")), model(s))
        .select(col("url").as("subj"), col("class_iri").as("obj"))
        .distinct()
    }),

    // Annotator+ lemmatize=true: both sides lemmatized, ORIGINAL offsets —
    // DuckDB-checked end-to-end (SQL lemmatizer + lemma-space offset
    // back-mapping); plus offset/identity-parity specs (LemmaAndContextSpec)
    "ann_lemma" -> ((s, dir) =>
      graft.annotate.LemmaScan.annotateDirectLemma(corpus(s, dir), lemmaModel(s)).toDF()
        .select(col("url"), col("from"), col("to"), col("text"),
          col("classIri").as("class_iri"), col("ont"),
          col("matchType").as("match_type"))),

    // inter-annotator agreement: Cohen's kappa between the strict and
    // lemmatized annotators over the doc × concept presence universe — the
    // QA number for "how much does lemmatization actually change the KG"
    // (and the template for scoring any recognizer pair through the seam).
    // All cells are EXACT integer counts from one full-outer join of two
    // distinct-pair streams; the universe size attaches as two 1-row
    // scalars (no driver action); kappa arithmetic runs once on the final
    // row in the oracle's division order, 6dp.
    "ann_agreement" -> ((s, dir) => {
      val strict = matches(s, dir).select("url", "class_iri").distinct()
        .withColumn("in_s", lit(1))
      val lem = graft.annotate.LemmaScan
        .annotateDirectLemma(corpus(s, dir), lemmaModel(s)).toDF()
        .select(col("url"), col("classIri").as("class_iri")).distinct()
        .withColumn("in_l", lit(1))
      val cells = strict.join(lem, Seq("url", "class_iri"), "full_outer")
        .agg(
          sum(when(col("in_s").isNotNull && col("in_l").isNotNull, 1L)
            .otherwise(0L)).as("b11"),
          sum(when(col("in_s").isNotNull && col("in_l").isNull, 1L)
            .otherwise(0L)).as("b10"),
          sum(when(col("in_s").isNull && col("in_l").isNotNull, 1L)
            .otherwise(0L)).as("b01"))
      val nDocs = docsTable(s, dir).agg(count(lit(1)).as("n_docs"))
      val nCls = DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(
          OntologyFixture.conceptsDf(s))))
        .agg(countDistinct(col("class_iri")).as("n_classes"))
      val withN = cells.crossJoin(nDocs).crossJoin(nCls)
        .select(col("b11"), col("b10"), col("b01"),
          (col("n_docs") * col("n_classes")).as("n"))
      val a00 = col("n") - col("b11") - col("b10") - col("b01")
      val poRaw = (col("b11") + a00) / col("n")
      val peRaw =
        ((col("b11") + col("b10")) / col("n")) *
          ((col("b11") + col("b01")) / col("n")) +
        ((col("b01") + a00) / col("n")) *
          ((col("b10") + a00) / col("n"))
      withN.select(col("n").as("n_units"), col("b11").as("both_present"),
        col("b10").as("strict_only"), col("b01").as("lemma_only"),
        round(poRaw, 6).as("po"), round(peRaw, 6).as("pe"),
        when(peRaw === lit(1.0), lit(0.0))
          .otherwise(round((poRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .as("kappa"))
    }),

    // Annotator+ clinical context (NegEx/ConText-style attributes per match)
    // — DuckDB-checked (trigger-window algorithm recomputed in SQL); the
    // scalar is also golden-tested in specs
    "ann_context" -> ((s, dir) =>
      graft.annotate.ContextScan.annotateWithContext(corpus(s, dir), model(s)).toDF()
        .select(col("url"), col("from"), col("to"),
          col("classIri").as("class_iri"), col("negated"),
          col("experiencer"), col("temporality"))),

    // Annotator+ mallet-slot analogue: the rule-tagger recognizer dispatched
    // THROUGH the Recognizer seam (Annotator.matches) — a non-dictionary
    // match stream in the standard shape, DuckDB-recomputed end-to-end
    // (token offset machinery + the same suffix CASE chain)
    "ann_tagger" -> ((s, dir) =>
      Annotator.matches(corpus(s, dir), model(s),
        recognizer = Some(new Annotator.RuleTaggerRecognizer))),

    // A7: hierarchy expansion (min distance per doc × ancestor)
    "ann_hier" -> ((s, dir) =>
      Expand.hierarchy(
        matches(s, dir).withColumnRenamed("class_iri", "classIri"),
        closure(s), MaxLevel)
        .select(col("url"), col("ancestor").as("ancestor_iri"), col("distance"))),

    // A8: mapping expansion
    "ann_mapped" -> ((s, dir) =>
      Expand.mappings(
        matches(s, dir).withColumnRenamed("class_iri", "classIri"),
        OntologyFixture.mappingsDf(s))
        .select("url", "mapped_iri", "kind")),

    // A9: CUI canonicalization
    "ann_canon" -> ((s, dir) =>
      Expand.canonicalize(
        matches(s, dir).withColumnRenamed("class_iri", "classIri"),
        OntologyFixture.classResolutionDf(s))
        .select(col("url"), col("classIri").as("class_iri"), col("canon_iri"))),

    // A12: the P/R-gate-shaped query — full (subj, pred, obj) triple set,
    // via the FUSED zero-shuffle path (so the DuckDB oracle checks the scale
    // path directly; the Catalyst-join legs are oracle-checked separately by
    // ann_direct / ann_hier / ann_mapped)
    "ann_triples" -> ((s, dir) =>
      graft.annotate.FusedAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .toDF().select("subj", "pred", "obj")),

    // triple-store predicate distribution — the first dashboard row any KG
    // release gets (per pred: triple count + distinct subjects/objects);
    // one short-key agg over the fused zero-shuffle triple stream
    "kg_pred_stats" -> ((s, dir) =>
      graft.annotate.FusedAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .toDF().select("subj", "pred", "obj")
        .groupBy("pred")
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col("subj")).as("n_subjects"),
          countDistinct(col("obj")).as("n_objects"))),

    // object in-degree histogram over the triple store (hub-concept watch:
    // which objects accumulate the KG's mass) — per (pred, log2 bucket of
    // the object's subject count), the web_degree_dist bit-length
    // bucketing on the KG side
    "kg_obj_degree_dist" -> ((s, dir) =>
      graft.annotate.FusedAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .toDF().select("subj", "pred", "obj")
        .groupBy("pred", "obj")
        .agg(countDistinct(col("subj")).as("deg"))
        .select(col("pred"), (length(bin(col("deg"))) - 1).as("bucket"))
        .groupBy("pred", "bucket")
        .agg(count(lit(1)).as("n_objects"))),

    // A12 on the NATIVE plan (custom Catalyst Generator over in-place
    // UTF8String bytes — graft.annotate.NativeAnnotate): same oracle as
    // ann_triples, so DuckDB independently checks the native formulation too
    "ann_triples_native" -> ((s, dir) =>
      graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select("subj", "pred", "obj")),

    // Incremental re-annotation on the fixture's dict-only v1→v2 update
    // (graft.annotate.Incremental): dictionary diff → affected urls
    // (broadcast join over the v1 match stream + a scan with an
    // added-terms-ONLY automaton) → v1 triples kept for unaffected docs,
    // full v2 annotation for affected docs only. The oracle recomputes the
    // FULL v2 result from scratch in SQL — a green row proves the
    // incremental path equals a complete re-annotation
    "ann_incremental" -> ((s, dir) =>
      incrementalV1V2(s, dir)._2.select("subj", "pred", "obj")),

    // Reference response assembly (A6 + serialization): one row per
    // (doc, class) carrying the whole annotation record — match-type
    // breakdown, per-class hierarchy with min distance, mappings, score —
    // the flat-canonical form of the reference's nested JSON response
    // (arrays rendered as sorted ';'-joined strings so DuckDB can hash them)
    "ann_response" -> ((s, dir) => {
      val m = matches(s, dir)
      val byType = m.groupBy("url", "class_iri", "ont", "match_type")
        .agg(count(lit(1)).as("cnt"))
      val spans = byType.groupBy("url", "class_iri", "ont")
        .agg(
          concat_ws(";", sort_array(collect_list(
            concat(col("match_type"), lit(":"), col("cnt"))))).as("annotations"),
          sum(when(col("match_type") === MatchType.Pref,
            col("cnt") * Score.PrefWeight)
            .otherwise(col("cnt") * Score.SynWeight)).as("score"))
      // derive from the already-aggregated byType (tiny), NOT the raw match
      // stream — the latter would rescan the whole corpus a second time
      val direct = byType.select("url", "class_iri").distinct()
      val hier = direct
        .join(broadcast(closure(s)), direct("class_iri") === col("child"))
        .groupBy("url", "class_iri", "ancestor")
        .agg(min(col("distance")).as("d"))
        .groupBy("url", "class_iri")
        .agg(concat_ws(";", sort_array(collect_list(
          concat(col("ancestor"), lit(":"), col("d"))))).as("hierarchy"))
      val mp = OntologyFixture.mappingsDf(s)
        .select(col("class_iri").as("m_class_iri"), col("mapped_iri"))
      val mapped = direct
        .join(broadcast(mp), direct("class_iri") === col("m_class_iri"))
        .select(col("url"), col("class_iri"), col("mapped_iri"))
        .groupBy("url", "class_iri")
        .agg(concat_ws(";", sort_array(collect_set(col("mapped_iri")))).as("mappings"))
      spans
        .join(hier, Seq("url", "class_iri"), "left")
        .join(mapped, Seq("url", "class_iri"), "left")
        .select(col("url"), col("class_iri"), col("ont"), col("annotations"),
          coalesce(col("hierarchy"), lit("")).as("hierarchy"),
          coalesce(col("mappings"), lit("")).as("mappings"), col("score"))
    }),

    // Reference JSON response serialization (score-ordered nested docs) —
    // DuckDB-checked BYTE-EXACTLY (the oracle reconstructs the same JSON
    // strings); structure + ordering also asserted in specs
    "ann_response_json" -> ((s, dir) =>
      graft.emit.Triples.jsonResponses(
        matches(s, dir).withColumnRenamed("text", "matched_text")
          .select(col("url"), col("from"), col("to"), col("class_iri"),
            col("ont"), col("match_type")),
        closure(s), OntologyFixture.mappingsDf(s), MaxLevel)),

    // A10: 'old'-mode scoring per (doc, concept)
    "ann_score" -> ((s, dir) =>
      Scoring.directScores(
        matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"))
        .select(col("url"), col("classIri").as("class_iri"), col("score"),
          col("n_matches"), col("match_type"))),

    // S1-shaped two-phase concept stats (distinct-first defeats hot-key skew)
    "ann_stats" -> ((s, dir) =>
      matches(s, dir).groupBy("class_iri")
        .agg(countDistinct(col("url")).as("doc_freq"),
          count(lit(1)).as("n_matches"))),

    // S1 explicit salted two-phase aggregation: url-hash salt splits hot
    // concept keys across 16 partial groups, then merges. Same result as
    // ann_stats (same oracle), different physical plan — the skew technique.
    "ann_stats_salted" -> ((s, dir) => {
      val salted = matches(s, dir)
        .withColumn("salt", pmod(xxhash64(col("url")), lit(16)))
      // url → salt is a function, so per-salt distinct-url counts add up
      val partial = salted.groupBy("class_iri", "salt")
        .agg(countDistinct(col("url")).as("pd"), count(lit(1)).as("pm"))
      partial.groupBy("class_iri")
        .agg(sum(col("pd")).as("doc_freq"), sum(col("pm")).as("n_matches"))
    }),

    // A4: ontologies whitelist
    "ann_filter_ont" -> ((s, dir) =>
      Filters(matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"),
          AnnotateOptions(ontologies = Seq("ONT2")))
        .select(col("url"), col("classIri").as("class_iri"), col("ont")).distinct()),

    // A4: semantic-type filter (broadcast left-semi join)
    "ann_filter_semtype" -> ((s, dir) =>
      Filters(matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"),
          AnnotateOptions(semanticTypes = Seq("T050", "T051", "T052")),
          Some(OntologyFixture.conceptsDf(s)
            .select(col("class_iri"), explode(col("tuis")).as("tui"))))
        .select(col("url"), col("classIri").as("class_iri")).distinct()),

    // A4: whole_word_only=false — the reference's substring-matching mode
    // (mgrep boundary checks off); direct classes only
    "ann_substring" -> ((s, dir) =>
      graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1",
          AnnotateOptions(wholeWordOnly = false,
            expandHierarchy = false, expandMappings = false))
        .filter(col("pred") === Pred.Direct)
        .select(col("subj").as("url"), col("obj").as("class_iri")).distinct()),

    // A4: exclude_synonyms
    "ann_nosyn" -> ((s, dir) =>
      Filters(matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"),
          AnnotateOptions(excludeSynonyms = true))
        .select(col("url"), col("classIri").as("class_iri"),
          col("matchType").as("match_type")).distinct()),

    // A4: stop_words request option — per-request term blacklist, resolved
    // to term ids at payload-compile time (normalization exercised: mixed
    // case + uncollapsed whitespace)
    "ann_stopwords" -> ((s, dir) =>
      graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1",
          AnnotateOptions(stopWords = Seq("data", "  Table  Scan "),
            expandHierarchy = false, expandMappings = false))
        .filter(col("pred") === Pred.Direct)
        .select(col("subj").as("url"), col("obj").as("class_iri")).distinct()),

    // A10: 'cvalue' score mode (Annotator+ score=cvalue) — per-match weight
    // scaled by log2(term word count + 1)
    "ann_score_cvalue" -> ((s, dir) =>
      Annotator.scores(
        matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"), ScoreMode.CValue)
        .select(col("url"), col("classIri").as("class_iri"),
          round(col("score"), 4).as("score"))),

    // A10: 'cvalueh' score mode — cvalue mass also flows to ancestors,
    // decayed by 1/(distance+1)
    "ann_score_cvalueh" -> ((s, dir) =>
      Annotator.scores(
        matches(s, dir).withColumnRenamed("class_iri", "classIri")
          .withColumnRenamed("match_type", "matchType"), ScoreMode.CValueH,
        Some(closure(s)), MaxLevel)
        .select(col("url"), col("classIri").as("class_iri"), col("score"))),

    // A11: score threshold + per-doc rank
    "ann_rank" -> ((s, dir) =>
      Scoring.thresholdAndRank(
        Scoring.directScores(
          matches(s, dir).withColumnRenamed("class_iri", "classIri")
            .withColumnRenamed("match_type", "matchType")), 16.0)
        .select(col("url"), col("classIri").as("class_iri"),
          col("score"), col("rank"))),

    // D2–D6: dictionary build
    "dict_terms" -> ((s, dir) =>
      DictBuild.flatDict(
        DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(s))))),

    // D1 interop: dictionary built from an RDF (N-Triples) round trip of the
    // fixture ontology — one serialized submission per ontology acronym, as
    // in the reference's per-ontology submissions; must equal dict_terms
    "dict_terms_nt" -> ((s, dir) => {
      import s.implicits._
      val c = OntologyFixture.conceptsDf(s)
      val noEdges = OntologyFixture.edgesDf(s).limit(0)
      val onts = c.select("ont").distinct().as[String].collect().sorted
      val viaNt = onts.map { o =>
        val lines = graft.io.NTriples.lines(c.filter(col("ont") === o), noEdges)
          .select("line").as[String]
        graft.io.NTriples.concepts(graft.io.NTriples.statements(lines), o)
      }.reduce(_.unionAll(_))
      DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(viaNt)))
    }),

    // LOOM lexical mapping derivation (the reference's second mapping kind,
    // BioPortal's offline lexical matcher): cross-ontology directed pairs
    // with equal D3-normalized labels (pref or synonym) — feeds A8 when the
    // ontology arrives as RDF instead of curated tables
    "dict_loom" -> ((s, dir) =>
      OntologyTables.loomMappings(OntologyFixture.conceptsDf(s))),

    // fuzzy alignment candidates — LOOM's near-match extension: cross-
    // ontology label pairs by token-set Jaccard ≥ 0.5 via capped posting
    // lists (reordered tokens and subset labels that exact LOOM misses)
    "dict_align_fuzzy" -> ((s, dir) =>
      graft.dict.Align.fuzzyAlign(
        DictBuild.labelRows(OntologyFixture.conceptsDf(s))
          .select(DictBuild.normalizeTerm(col("label")).as("term"),
            col("class_iri"), col("ont")))),

    // the incremental update's diff leg, oracle-checked on its own:
    // version-independent dictionary delta (term ids excluded) as one
    // relation with a delta tag
    "dict_diff" -> ((s, dir) => {
      val upd = fixtureDictUpdate(s)
      upd.removed.withColumn("delta", lit("removed"))
        .unionByName(upd.added.withColumn("delta", lit("added")))
    }),

    // cross-ontology overlap matrix (the BioPortal ontology-similarity
    // artifact): per unordered ontology pair, mapped class-pair counts +
    // per-side coverage of the dict universe — the release dashboard for
    // "how aligned are these two ontologies". Everything is
    // ontology-scale: two broadcast joins onto the mapping table, one agg.
    "kg_ontology_overlap" -> ((s, dir) => {
      val cls = DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(
          OntologyFixture.conceptsDf(s))))
        .select(col("class_iri"), col("ont")).distinct()
      val sizes = cls.groupBy("ont").agg(countDistinct(col("class_iri")).as("n"))
      val pairs = OntologyFixture.mappingsDf(s)
        .join(broadcast(cls.select(col("class_iri"), col("ont").as("ont_a"))),
          Seq("class_iri"))
        .join(broadcast(cls.select(col("class_iri").as("mapped_iri"),
          col("ont").as("ont_b"))), Seq("mapped_iri"))
        .filter(col("ont_a") < col("ont_b"))
        .select(col("ont_a"), col("ont_b"), col("class_iri"), col("mapped_iri"))
        .distinct()
      pairs.groupBy("ont_a", "ont_b")
        .agg(count(lit(1)).as("n_mapped_pairs"),
          countDistinct(col("class_iri")).as("n_classes_a"),
          countDistinct(col("mapped_iri")).as("n_classes_b"))
        .join(broadcast(sizes.select(col("ont").as("ont_a"), col("n").as("size_a"))),
          Seq("ont_a"))
        .join(broadcast(sizes.select(col("ont").as("ont_b"), col("n").as("size_b"))),
          Seq("ont_b"))
        .select(col("ont_a"), col("ont_b"), col("n_mapped_pairs"),
          col("n_classes_a"), col("n_classes_b"),
          round(col("n_classes_a") / col("size_a"), 6).as("coverage_a"),
          round(col("n_classes_b") / col("size_b"), 6).as("coverage_b"))
    }),

    // dictionary-shape QA: per (ontology, PREF/SYN, word count) term
    // counts + mean char length — a release whose label-length profile
    // shifts changes matcher behavior (longest_only pressure, automaton
    // depth) before any accuracy metric moves. Ontology-scale only.
    // emerging-term discovery (dictionary MAINTENANCE): recurring corpus
    // bigrams not yet in the dictionary, ranked by doc support — what a
    // curator reviews before the next blue/green swap; one short-key agg
    // + a broadcast anti-join against the term list
    "dict_candidates" -> ((s, dir) =>
      DictBuild.termCandidates(docsTable(s, dir),
        DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(
          OntologyFixture.conceptsDf(s)))))),

    // spelling-variant discovery (dict_candidates' fuzzy sibling in the
    // maintenance loop): corpus tokens within edit distance 1 of a
    // dictionary term — FastSS deletion-neighborhood equi-join + codegen'd
    // levenshtein verify over the typo-injected synthesis, ranked by df
    "dict_spell_variants" -> ((s, dir) =>
      DictBuild.spellVariants(TextOps.withTypos(docsTable(s, dir)),
        DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(
          OntologyFixture.conceptsDf(s)))))),

    // stop-word induction — the data-driven candidates for the reference's
    // hand-curated stop list (dict_candidates' dual): dictionary terms
    // whose document frequency crosses StopDfFloor match like function
    // words and tax every scan; term df from the REAL match stream, the
    // corpus total attached as a broadcast 1-row scalar
    "dict_stop_candidates" -> ((s, dir) => {
      val termDocs = matches(s, dir)
        .select(col("url"), upper(col("text")).as("term")).distinct()
      val total = docsTable(s, dir).agg(count(lit(1)).as("n_total"))
      termDocs.groupBy("term").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(total))
        .filter(col("n_docs").cast("double") / col("n_total").cast("double")
          >= StopDfFloor)
        .select(col("term"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_total").cast("double"),
            6).as("df_ratio"))
    }),

    "dict_term_stats" -> ((s, dir) =>
      DictBuild.flatDict(DictBuild.build(DictBuild.labelRows(
          OntologyFixture.conceptsDf(s))))
        .select(col("ont"), col("pref"),
          size(split(col("term"), " ")).as("n_words"),
          length(col("term")).as("n_chars"))
        .groupBy("ont", "pref", "n_words")
        .agg(count(lit(1)).as("n_terms"),
          round(avg(col("n_chars")), 4).as("mean_chars"))),

    // the release-notes rollup a dict publisher ships: per (ontology,
    // change class) term + distinct-concept counts over the same diff
    "dict_release_notes" -> ((s, dir) => {
      val upd = fixtureDictUpdate(s)
      upd.removed.withColumn("delta", lit("removed"))
        .unionByName(upd.added.withColumn("delta", lit("added")))
        .groupBy("ont", "delta")
        .agg(count(lit(1)).as("n_terms"),
          countDistinct(col("class_iri")).as("n_classes"))
    }),

    // related documents via shared ontology ancestry — the annotator's
    // "similar resources" surface: profiles = direct concepts + ancestors,
    // capped-posting pair generation (the dedup_jaccard discipline)
    "kg_related_docs" -> ((s, dir) =>
      graft.graph.KgGraph.relatedDocs(
        matches(s, dir).select("url", "class_iri"),
        graph.Closure.transitiveClosure(OntologyFixture.edgesDf(s), maxLevel = 5))),

    // ANALYZE-style per-column table statistics (the CBO input surface):
    // ONE pass over the table computes every column's row/non-null/exact-NDV
    // counts + min/max (stringified to unify the long-format schema), then a
    // driver-free unpivot into (column_name, ...) rows
    // functional-dependency discovery (the profiling pass next to
    // q_table_stats' ANALYZE): FD lhs→rhs holds iff ndv(lhs) ==
    // ndv(lhs ∪ rhs) — ALL candidates on one table cost ONE aggregation
    // pass (multi-distinct plans as Expand: ×2·candidates row multiplier
    // map-side, the documented profiling trade — never one scan per FD)
    "q_fd_discovery" -> ((s, dir) =>
      FdCandidates.groupBy(_._1).toSeq.sortBy(_._1).map { case (tbl, cands) =>
        val df = s.read.parquet(s"$dir/$tbl.parquet")
        val aggs = cands.zipWithIndex.flatMap { case ((_, lhs, rhs), i) =>
          Seq(count_distinct(struct(lhs.map(col): _*)).as(s"l$i"),
            count_distinct(struct((lhs :+ rhs).map(col): _*)).as(s"p$i"))
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cands.zipWithIndex.map {
            case ((t, lhs, rhs), i) =>
              struct(lit(t).as("tbl"), lit(lhs.mkString("+")).as("lhs"),
                lit(rhs).as("rhs"), col(s"l$i").as("n_lhs"),
                col(s"p$i").as("n_pairs"),
                (col(s"l$i") === col(s"p$i")).as("holds"))
          }: _*)).as("r"))
          .select("r.*")
      }.reduce(_ unionByName _)),

    "q_table_stats" -> ((s, dir) => {
      val statCols = Seq("lang", "source", "n_chars")
      val d = s.read.parquet(s"$dir/documents.parquet")
      val agg = d.agg(count(lit(1)).as("n_rows"),
        statCols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          count_distinct(col(c)).as(s"ndv_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"))): _*)
      statCols.map(c => agg.select(lit(c).as("column_name"),
          col("n_rows"), col(s"nn_$c").as("n_nonnull"),
          col(s"ndv_$c").as("ndv"), col(s"min_$c").as("min_value"),
          col(s"max_$c").as("max_value")))
        .reduce(_ unionByName _)
    }),

    // TPC-H-ish operator coverage: pushed-down filter + hash aggregate
    "q_pushdown_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))),

    // broadcast join chain + aggregate + having
    "q_join_nation" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_revenue"))
        .filter(col("n_orders") > 10)
    }),

    // window top-k per key
    "q_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    }),

    // grouping sets: rollup subtotals over the agg keys
    "q_rollup" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // gap-based sessionization: lag + windowed cumulative sum + per-session agg
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        // ts is TIMESTAMP_NTZ → go via TIMESTAMP (session TZ pinned to UTC)
        .withColumn("gap_s",
          col("ts").cast("timestamp").cast("long")
            - lag(col("ts"), 1).over(w).cast("timestamp").cast("long"))
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
    }),

    // grouping sets: full CUBE over the agg keys (ROLLUP's big sibling)
    "q_cube" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // explicit GROUPING SETS (the general form ROLLUP/CUBE special-case):
    // mixed granularities in one pass — SQL form (the DataFrame API has no
    // grouping-sets builder), same text as the oracle
    "q_grouping_sets" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .createOrReplaceTempView("lineitem_gsets")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
             ROUND(SUM(l_quantity), 2) AS sum_qty
           FROM lineitem_gsets
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_linestatus), ())""")
    }),

    // pivot: per-user event-type counts as columns. Spark's pivot with an
    // EXPLICIT value list compiles to conditional aggregation — one
    // shuffle, no second pass to discover distinct values (the implicit
    // form's extra job is the scale trap)
    "q_pivot" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // ranking-function windows: ntile quartiles + dense_rank + percent_rank
    "q_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).as("quartile"),
          dense_rank().over(w).as("drank"),
          round(percent_rank().over(w), 6).as("prank"))
    }),

    // set operation: customers with both fulfilled and open orders
    "q_setops" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
    }),

    // set operation: EXCEPT (customers with fulfilled but no open orders)
    "q_except" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
    }),

    // date_trunc + JSON extraction + aggregate over the events table
    "q_events_hourly" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        // sums, not avgs: a rounded avg can land on a half-even boundary where
        // Spark (BigDecimal HALF_UP on shortest repr) and DuckDB (binary
        // double) disagree; sums of 2-decimal values round identically
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))),

    // streaming-shaped windowed aggregation (same plan batch/stream)
    "stream_hourly" -> ((s, dir) =>
      EventStream.hourlyCounts(s.read.parquet(s"$dir/events.parquet"))),

    // SLIDING windows (1h every 15min — each event in exactly 4 windows);
    // the oracle re-derives the window explosion with generate_series
    "stream_sliding" -> ((s, dir) =>
      EventStream.slidingCounts(s.read.parquet(s"$dir/events.parquet"))),

    // the STREAMING tier under the driver gate: the real anomalyStream
    // (flatMapGroupsWithState, update mode) run to quiescence over the
    // bounded events slice via MemoryStream — deterministic final-state
    // projection (one in-order batch per type), == batch q_anomaly minus
    // each type's never-closed final hour. Order-sensitive surfaces
    // (heavy hitters, streaming dedup) stay spec-gated, correctly.
    "stream_anomaly_hours" -> ((s, dir) => {
      import s.implicits._
      EventStream.anomalyClosedHours(
        s.read.parquet(s"$dir/events.parquet")
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"),
            col("value").cast("double").as("value"))
          .as[EventStream.Event])
    }),

    // as-of join, small-dim shape: which dictionary snapshot was live when
    // each event happened — sorted version list inlined as an array
    // literal, latest entry <= ts picked map-only (zero shuffle/join)
    "q_asof_version" -> ((s, dir) =>
      AsOf.withVersionAsOf(s.read.parquet(s"$dir/events.parquet"),
          "ts", DictSnapshots)
        .select(col("event_id"), col("version"))),

    // as-of join, keyed corpus-scale shape: each event's most recent
    // strictly-preceding 'click' by the same user — ONE shuffle (window on
    // user_id), no join node at all
    "q_asof_prev_click" -> ((s, dir) =>
      AsOf.lastPrecedingWhere(
          s.read.parquet(s"$dir/events.parquet")
            .withColumn("is_click", col("event_type") === "click"),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          predCol = "is_click", carryCol = "event_id", out = "prev_click_id")
        .select(col("event_id"), col("user_id"), col("prev_click_id"))),

    // Bloom-filter semi-join pruning (runtime-filter pattern): an 8KB
    // bitset over the single-word dictionary terms prunes the corpus's
    // word stream BEFORE any shuffle/join — membership is a codegen'd
    // predicate on portable hashes, so the oracle reconstructs the exact
    // accept set, deterministic false positives included
    "q_bloom_prune" -> ((s, dir) => {
      val dict = DictBuild.build(DictBuild.labelRows(OntologyFixture.conceptsDf(s)))
      val terms = dict.filter(!col("term").contains(" ")).select("term")
      val words = graft.ops.Bloom.build(terms, "term", m = 4096, k = 3)
      docsTable(s, dir)
        .select(col("doc_id"), explode(split(upper(col("text")), " ")).as("word"))
        .filter(col("word") =!= "").distinct()
        .filter(graft.ops.Bloom.mightContain(col("word"), words, 4096, 3))
    }),

    // range join via bucketized equi-join (NO inequality join node): pairs
    // of same-user events within 5 minutes — the bin trick turns a
    // quadratic theta-join into one shuffled equi-join + exact post-filter
    "q_range_join" -> ((s, dir) =>
      RangeJoin.pairsWithinGap(s.read.parquet(s"$dir/events.parquet"),
        keyCol = "user_id", idCol = "event_id", tsCol = "ts",
        maxGapSec = 300)),

    // exact per-group quantiles (type-7 interpolation in BOTH engines).
    // Exact percentile is a per-group sort — fine on grouped data; the
    // 100-TB ungrouped path is approx_percentile (error-bound spec'd in
    // SketchSpec, not oracle-able across engines)
    "q_quantiles" -> ((s, dir) =>
      docsTable(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_chars, 0.25)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75)"), 6).as("p75"),
          round(expr("percentile(n_chars, 0.95)"), 6).as("p95"))),

    // the 100-TB ungrouped-quantile path, CORRECTNESS-gated via an
    // error-bound oracle: approx_percentile (GK sketch, rank error ≤
    // n/accuracy) over the whole corpus, then the EXACT rank window of each
    // returned value ([count(<v)+1, count(≤v)]) checked in-plan against the
    // guaranteed window around ceil(pct·n). The emitted rows are (pct,
    // within_bound); the oracle pins them all true — a bound violation
    // hash-mismatches the gate. Scale shape: one agg for the sketch + one
    // pass over the corpus against the broadcast 4-row value set.
    "q_quantiles_approx" -> ((s, dir) => {
      val docs = docsTable(s, dir).select(col("n_chars").cast("double").as("x"))
      val pcts = Seq(0.25, 0.5, 0.75, 0.95)
      val acc = 100
      val appr = docs.agg(
        expr(s"approx_percentile(x, array(${pcts.map(p => s"${p}D").mkString(", ")}), $acc)")
          .as("av"),
        count(lit(1)).as("n"))
        .select(posexplode(col("av")).as(Seq("i", "v")), col("n"))
        .select(element_at(array(pcts.map(lit): _*), col("i") + 1).as("pct"),
          col("v"), col("n"))
      docs.crossJoin(broadcast(appr))
        .groupBy("pct", "v", "n")
        .agg(sum(when(col("x") <= col("v"), 1L).otherwise(0L)).as("le"),
          sum(when(col("x") < col("v"), 1L).otherwise(0L)).as("lt"))
        .select(col("pct"),
          ((col("lt") + 1 <= ceil(col("pct") * col("n")) + col("n") / acc + 1) &&
            (col("le") >= ceil(col("pct") * col("n")) - col("n") / acc - 1))
            .as("within_bound"))
    }),

    // HLL++ approx distinct per group, CORRECTNESS-gated like the approx
    // percentiles: the engine checks the estimate against the exact count
    // in-plan (10% or ±1 — far wider than rsd 0.02; the estimate is
    // deterministic for fixed input) and the oracle pins exact_n + the
    // checked outcome, so a bound violation hash-mismatches
    "q_distinct_approx" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("est"),
          count_distinct(col("user_id")).as("exact_n"))
        .select(col("event_type"), col("exact_n"),
          (abs(col("est") - col("exact_n")) <=
            greatest(lit(1.0), lit(0.10) * col("exact_n")))
            .as("within_bound"))),

    // salted skew JOIN (the manual AQE-skew-join shape, complementing the
    // ann_stats_salted AGGREGATION): a hot join key is split across 8
    // deterministic salt buckets on the fact side while the dim side
    // replicates ×8 — each (key, salt) partition carries ~1/8 of the hot
    // key, so one executor never owns the whole celebrity key. The oracle
    // is the PLAIN join: salting must be invisible in the result
    "q_salted_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          pmod(xxhash64(col("event_id")), lit(8)).as("salt"))
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select((col("c_custkey") % 50).as("user_id"),
          col("c_mktsegment")).distinct()
        .select(col("user_id"), col("c_mktsegment"),
          explode(sequence(lit(0L), lit(7L))).as("salt"))
      ev.join(dim, Seq("user_id", "salt"))
        .groupBy("event_type", "c_mktsegment")
        .agg(count(lit(1)).as("n_events"))
    }),

    // classic star-schema rollup: the 5-way fact⋈dims join (lineitem →
    // part / supplier → nation → region) as a BROADCAST CHAIN — every dim
    // is broadcast, so the fact table never shuffles for the join; one agg
    // on short (region, brand) keys, then a top-2-per-region window over
    // the 2dp-ROUNDED revenue (rank on rounded values = deterministic)
    "q_star_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val part = s.read.parquet(s"$dir/part.parquet")
      val supp = s.read.parquet(s"$dir/supplier.parquet")
      val nat = s.read.parquet(s"$dir/nation.parquet")
      val reg = s.read.parquet(s"$dir/region.parquet")
      val agg = li
        .join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
      val w = Window.partitionBy("r_name")
        .orderBy(col("revenue").desc, col("p_brand"))
      agg.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
    }),

    // pipeline-monitoring anomaly detection: per event type, each hour's
    // count against the trailing-6-hour mean/stddev → z-score + flag —
    // the ingest-volume alarm every production pipeline runs. Per-type
    // windows (bounded trailing frame), stddev_samp is the cross-engine
    // contract, 6dp round absorbs float-sum order
    "q_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      // densify: an hour with ZERO events is the primary outage signal —
      // without the grid it would produce no row, be invisible to the
      // alarm, and silently stretch the trailing window past 6 wall-clock
      // hours. Grid size = type count × observed span (bounded, per-type)
      val grid = counts.groupBy("event_type")
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
      val hourly = grid.join(counts, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-6, -1)
      hourly
        .select(col("event_type"), col("hour"), col("n"),
          avg(col("n")).over(w).as("mu"),
          stddev_samp(col("n")).over(w).as("sd"),
          count(col("n")).over(w).as("n_prior"))
        .filter(col("n_prior") >= 6 && col("sd") > 0)
        .select(col("event_type"), col("hour"), col("n"),
          round((col("n") - col("mu")) / col("sd"), 6).as("z"),
          (abs((col("n") - col("mu")) / col("sd")) > 3.0).as("anomaly"))
    }),

    // Z-order layout: bit-interleaved (user, hour) keys bucketed by top
    // bits — per-bucket extents tight on BOTH dims = the data-skipping
    // evidence a table-maintenance planner consumes (companion of
    // q_compaction_plan). Pure map expression + ONE hash agg.
    "q_zorder_layout" -> ((s, dir) =>
      graft.ops.ZOrder.layoutStats(
        s.read.parquet(s"$dir/events.parquet"))),

    // MERGE INTO (the lakehouse upsert shape — Iceberg/Delta MERGE): one
    // FULL OUTER join of base and a changes batch on the row key — deletes
    // drop, updates replace, inserts flow from the right, untouched rows
    // keep. Change classes are synthesized DISJOINT (delete wins over
    // update — MERGE forbids multiple matches per target row; mirrored in
    // the oracle). At 100 TB this is exactly one key-keyed exchange per
    // side, AQE-skew-splittable.
    "q_merge_upsert" -> ((s, dir) => {
      val base = docsTable(s, dir).select(col("doc_id"), col("text"))
      val upd = base
        .filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 4)
        .select(col("doc_id"),
          concat(col("text"), lit(" updated")).as("new_text"),
          lit("update").as("op"))
      val ins = base.filter(col("doc_id") % 11 === 5)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(lit("new page "), col("doc_id")).as("new_text"),
          lit("insert").as("op"))
      val del = base.filter(col("doc_id") % 13 === 4)
        .select(col("doc_id"), lit(null).cast("string").as("new_text"),
          lit("delete").as("op"))
      base.join(upd.unionByName(ins).unionByName(del), Seq("doc_id"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "delete")
        .select(col("doc_id"), coalesce(col("op"), lit("keep")).as("op"),
          length(coalesce(col("new_text"), col("text"))).cast("int").as("n_chars"))
    }),

    // snapshot-retention planning (Iceberg expire_snapshots shape — the
    // third table-maintenance member next to compaction and zorder): keep
    // the newest 5 snapshots per type plus everything younger than 12h of
    // the type's latest; the rest expire. Per-TYPE windows only (the
    // q_compaction_plan discipline — never a global sort).
    "q_snapshot_expire" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val snaps = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          date_trunc("hour", col("ts")).as("snapshot_hour")).distinct()
      val byType = Window.partitionBy("event_type")
      snaps
        .withColumn("recency_rank",
          row_number().over(byType.orderBy(col("snapshot_hour").desc)))
        .withColumn("latest", max(col("snapshot_hour")).over(byType))
        .select(col("event_type"), col("snapshot_hour"), col("recency_rank"),
          (!(col("recency_rank") <= 5 ||
            col("snapshot_hour") >= col("latest") - expr("INTERVAL 12 HOURS")))
            .as("expire"))
    }),

    // approximate heavy hitters, CORRECTNESS-gated like the other approx
    // ops: the top-10 users by exact count are probed against the count-min
    // sketch in-plan — the CM guarantee (never undercounts; overshoot
    // bounded by colliding mass) is checked as exact ≤ est ≤ exact + 2N/w,
    // and the oracle pins the exact counts + the checked outcome, so a
    // bound violation hash-mismatches. Total N is a 1-row in-plan aggregate
    "q_topk_approx" -> ((s, dir) => {
      val cmW = 256 // ONE width for the build, the probe, AND the bound
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").cast("string").as("v"))
      val exact = ev.groupBy("v").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("v")).limit(10)
      val est = graft.ops.Sketch.countMinEstimate(
        graft.ops.Sketch.countMin(ev, "v", w = cmW), exact.select("v"), "v",
        w = cmW)
      val tot = ev.agg(count(lit(1)).as("n_total"))
      exact.join(est, "v").crossJoin(broadcast(tot))
        .select(col("v").as("user_id"), col("exact_n"),
          (col("cm_estimate") >= col("exact_n") &&
            col("cm_estimate") <= col("exact_n")
              + lit(2.0) * col("n_total") / lit(cmW.toDouble))
            .as("within_bound"))
    }),

    // Iceberg-style compaction planning (the rewrite_data_files bin-pack):
    // per partition, files in deterministic order are packed greedily into
    // target-sized bins — bin = floor(bytes-before / target), a running-sum
    // window per partition key (synthetic file metadata: one "file" per
    // (event_type, hour) with its row count as size)
    "q_compaction_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val files = s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("file_hour"))
        .agg(count(lit(1)).as("size_rows"))
      val w = Window.partitionBy("event_type").orderBy("file_hour")
        .rowsBetween(Window.unboundedPreceding, -1)
      files.select(col("event_type"), col("file_hour"), col("size_rows"),
        floor(coalesce(sum(col("size_rows")).over(w), lit(0L)) / lit(1000L))
          .cast("int").as("bin"))
    }),

    // KMV bottom-k distinct sketch (custom typed Aggregator, bounded 8k-byte
    // buffer per group) + exact distinct alongside — the DuckDB oracle
    // recomputes the k smallest distinct hashes declaratively
    "sketch_distinct" -> ((s, dir) =>
      Sketch.kmvDistinct(s.read.parquet(s"$dir/events.parquet"),
        groupCol = "event_type", valueCol = "user_id", k = 64)),

    // HyperLogLog register sketch over the SAME (event_type, user_id)
    // stream as sketch_distinct — KMV vs HLL estimates directly comparable
    // on one release card; 64 one-byte registers per group, two codegen'd
    // hash aggs, exact-BIGINT harmonic sum until one pinned division
    "sketch_hll" -> ((s, dir) =>
      Sketch.hllDistinct(s.read.parquet(s"$dir/events.parquet"),
        groupCol = "event_type", valueCol = "user_id")),

    // cross-SOURCE vocabulary overlap via HLL register MERGE + inclusion–
    // exclusion — the union estimate needs only the register tables, no
    // second data pass (HLL's defining mergeability, the cross-cluster
    // audience-overlap shape); bigram vocabularies because they overlap
    // PARTIALLY across sources (sizes 634–740, overlaps 449–603 at
    // sf0.01 — the event-type user sets are all identical, a degenerate
    // fixture for an overlap estimator); exact overlap rides alongside
    "sketch_hll_overlap" -> ((s, dir) =>
      Sketch.hllOverlap(
        docsTable(s, dir).select(col("source"),
          explode(graft.ops.Dedup.shingles(col("text"), 2)).as("bigram")),
        groupCol = "source", valueCol = "bigram")),

    // ---- training-data ops ------------------------------------------

    "dedup_exact" -> ((s, dir) => Dedup.exact(docsTable(s, dir))),

    // measured LSH candidate recall vs the exact-Jaccard ground truth —
    // the banding/cap quality surface (the sim_ivf_recall discipline on
    // the dedup side); one full-outer join of the two audited pair sets
    "dedup_lsh_recall" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val exact = Dedup.jaccardPairs(docs, n = 3, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("e"))
      val lsh = Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4,
          threshold = 0.8)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("l"))
      exact.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
        .agg(coalesce(sum(col("e")), lit(0L)).as("n_exact"),
          coalesce(sum(col("l")), lit(0L)).as("n_lsh"),
          coalesce(sum(col("e") * col("l")), lit(0L)).as("n_common"))
        .select(col("n_exact"), col("n_lsh"), col("n_common"),
          round(col("n_common").cast("double")
            / col("n_exact").cast("double"), 6).as("recall"))
    }),

    // Broder containment over the quote-augmented corpus: the asymmetric
    // sub-document duplication Jaccard misses (quote pages score 1.0 into
    // their source while their Jaccard sits under the dedup threshold)
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Dedup.withQuotes(docsTable(s, dir)))),

    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docsTable(s, dir), n = 3, threshold = 0.8, maxDocFreq = 100)),

    // content-defined chunk dedup: boundaries from token-local hashes, so
    // an early insertion shifts fixed frames but CDC chunks resynchronize
    // (CdcSpec pins the property); exchange key = 8-byte chunk fingerprint
    "dedup_cdc" -> ((s, dir) => Dedup.cdcDedup(docsTable(s, dir))),

    // benchmark decontamination: docs sharing shingles with a benchmark set
    // (benchmark = the 10 lowest-id docs, deterministic)
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      Dedup.decontaminate(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        n = 3, minOverlap = 2)
    }),

    // portable md5-hex minhash — the DuckDB oracle recomputes the FULL
    // pipeline (signatures, banding, bucket cap, candidates, exact rerank)
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(docsTable(s, dir), n = 3, k = 16, bands = 4, threshold = 0.8)),

    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docsTable(s, dir), maxHamming = 3)),

    // the production dedup shape: a NEW batch (doc_id % 7 == 0) against the
    // existing corpus — only pairs touching a new doc are computed; the
    // stored-signature scale path documented on the op. Oracle = the full
    // minhash pipeline restricted to pairs involving a new doc.
    "dedup_incremental" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      Dedup.minhashIncrementalPairs(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0),
        n = 3, k = 16, bands = 4, threshold = 0.8)
    }),

    "sim_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(s.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 3)),

    // int8 scalar quantization (FAISS SQ8): snap to 256 per-dim levels,
    // exact top-k on the dequantized vectors — the 4×-memory ANN code path
    "sim_quantized" -> ((s, dir) =>
      Similarity.quantizedTopK(s.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 3)),

    // product quantization + ADC (FAISS PQ): 4 subspace codebooks trained by
    // seeded Lloyd, vectors stored as 4 code bytes, queries scored exact-vs-
    // codeword — the 10^12-vector memory shape; encode is pure map-side
    "sim_pq" -> ((s, dir) =>
      Similarity.pqTopK(s.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 3)),

    // IVF index-balance report: per inverted list, size + mean member-to-
    // centroid cosine — the ANN index health surface (skew predicts recall
    // and latency degradation before queries show it)
    "sim_ivf_stats" -> ((s, dir) =>
      Similarity.ivfStats(s.read.parquet(s"$dir/embeddings.parquet"))),

    // measured recall@3 of nProbe=2 IVF vs exact brute force — the ANN
    // quality-eval surface (recall is exact thirds: 6dp round is exact)
    "sim_ivf_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfTopK(emb, nQueries = 10, k = 3, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0L))).cast("double")
          / lit(3.0), 6).as("recall"))
    }),

    // measured recall@3 of 4×16-code PQ/ADC vs exact brute force —
    // completes the ANN recall-audit set (LSH, IVF, PQ): the compression-
    // loss surface a release pass reads before swapping the index format
    "sim_pq_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.pqTopK(emb, nQueries = 10, k = 3)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("hit"), lit(0L))).cast("double")
          / lit(3.0), 6).as("recall"))
    }),

    "sim_lsh" -> ((s, dir) =>
      Similarity.lshTopK(s.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 3)),

    "sim_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(s.read.parquet(s"$dir/embeddings.parquet"), nQueries = 10, k = 3)),

    // IVF recall knob: each query probes its 2 nearest inverted lists —
    // candidate volume ~2×, recall closer to brute force, same rerank
    "sim_ivf_probe2" -> ((s, dir) =>
      Similarity.ivfTopK(s.read.parquet(s"$dir/embeddings.parquet"),
        nQueries = 10, k = 3, nProbe = 2)),

    "sim_dup_pairs" -> ((s, dir) =>
      Similarity.cosineDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), threshold = 0.3)),

    "text_tokens" -> ((s, dir) => TextOps.tokenStats(docsTable(s, dir))),

    // PII scrubbing (emails + phone-shaped digit runs → typed placeholders)
    // — map-only regexp chain in the Java/RE2-identical pattern subset
    "text_redact" -> ((s, dir) => TextOps.redact(docsTable(s, dir))),

    // context-window chunking: 200-char windows, 50-char overlap —
    // sequence + explode + substr, map-side only (the training-sequence
    // packing pre-step)
    "text_chunks" -> ((s, dir) =>
      TextOps.chunk(docsTable(s, dir), size = 200, overlap = 50)),

    // tokenizer vocabulary: top-100 tokens, dense deterministic ids
    "text_vocab" -> ((s, dir) => TextOps.vocab(docsTable(s, dir), topN = 100)),

    // BPE tokenizer training: 8 merge rounds over the top-50 word table
    "text_bpe" -> ((s, dir) =>
      TextOps.bpeMerges(docsTable(s, dir), vocabWords = 50, merges = 8)),

    // train-then-encode: the merge list learned by text_bpe applied back
    // over the corpus (the production tokenizer path: tiny merge artifact
    // collected once, map-only replace chain over the token stream)
    "text_bpe_encode" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      TextOps.bpeEncode(docs,
        TextOps.bpeMerges(docs, vocabWords = 50, merges = 8))
    }),

    // MOSS winnowing fingerprints: window-min shingle-hash selection
    // (rightmost ties), ~2/(w+1) of positions kept — the sub-document match
    // index that fits at corpus scale; map-only, one output distinct
    "text_winnow" -> ((s, dir) =>
      TextOps.winnow(docsTable(s, dir), k = 3, w = 4)),

    // tokenizer-eval metrics: per-doc fertility (pieces/word — THE standard
    // subword-tokenizer quality number) + chars/piece compression, one hash
    // agg over the encode stream
    "text_bpe_stats" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      TextOps.bpeEncode(docs,
          TextOps.bpeMerges(docs, vocabWords = 50, merges = 8))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pieces"),
          count_distinct(col("word_pos")).as("n_words"),
          sum(length(col("piece"))).as("sum_chars"))
        .select(col("doc_id"), col("n_pieces"), col("n_words"),
          round(col("n_pieces").cast("double")
            / col("n_words").cast("double"), 6).as("fertility"),
          round(col("sum_chars").cast("double")
            / col("n_pieces").cast("double"), 6).as("chars_per_piece"))
    }),

    // systematic PPS (probability-proportional-to-size) sampling — the
    // classic weighted-sampling design, DETERMINISTIC (origin-0 variant, no
    // random start): a doc is selected when its cumulative-weight interval
    // crosses a multiple of the stride (per-shard total / 4), so selection
    // probability ∝ n_chars and big docs can take multiple hits — real PPS
    // semantics. Sharded like text_pack (per-shard windows, never global);
    // cumulative sums are exact integers below 2^53, so the double floor
    // arithmetic is engine-identical
    "text_sample_pps" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy("shard")
      val stride = col("w_total").cast("double") / lit(4.0)
      docsTable(s, dir)
        .select(col("doc_id"), (col("doc_id") % 16).as("shard"),
          col("n_chars"))
        .select(col("shard"), col("doc_id"), col("n_chars"),
          coalesce(sum(col("n_chars")).over(wOrd), lit(0L)).as("cb"),
          sum(col("n_chars")).over(wAll).as("w_total"))
        .select(col("shard"), col("doc_id"), col("n_chars"),
          (floor((col("cb") + col("n_chars")).cast("double") / stride)
            - floor(col("cb").cast("double") / stride)).cast("int")
            .as("n_hits"))
        .filter(col("n_hits") > 0)
    }),

    // sequence packing for LLM pretraining (the greedy doc→fixed-length-
    // sequence layout): docs are sharded (doc_id % 32 — shards pack
    // independently, the per-output-file convention), ordered
    // deterministically within the shard, and each doc starts at the
    // running token offset; seq_id/offset = divmod(tokens-before, 512).
    // Windows are PER-SHARD (never a global window — the D6 rule)
    "text_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      docsTable(s, dir)
        .select(col("doc_id"), (col("doc_id") % 32).as("shard"),
          size(TextOps.tokens(col("text"))).as("n_tokens"))
        .select(col("shard"), col("doc_id"), col("n_tokens"),
          coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("tok_before"))
        .select(col("shard"), col("doc_id"), col("n_tokens"),
          floor(col("tok_before") / lit(512L)).cast("int").as("seq_id"),
          (col("tok_before") % 512).cast("int").as("seq_offset"))
    }),

    // consistent train/val/test assignment (80/10/10) — disjoint +
    // exhaustive by construction, stable under corpus growth
    "text_split" -> ((s, dir) =>
      Sampling.split(docsTable(s, dir), "doc_id")
        .select(col("doc_id"), col("lang"), col("split"))),

    // consistent stratified sampling: keep 10% of English docs, 50% of
    // everything else (the low-resource upweighting move) — keep decision
    // is a pure function of doc_id (map-only, reproducible cross-engine)
    "text_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(docsTable(s, dir), "doc_id", "lang",
          rates = Map("en" -> 10), defaultPct = 50)
        .select(col("doc_id"), col("lang"),
          Sampling.bucket100(col("doc_id")).as("bucket"))),

    // quota-DERIVED stratified sampling: cap every language at ~100 docs
    // with the keep-rate computed IN-PLAN from the per-stratum counts
    // (text_sample's rates are caller-chosen constants; a rebalancing
    // pipeline wants them derived from the live distribution). One tiny
    // per-lang agg broadcast back onto the corpus, then the same
    // consistent-hash keep decision — map-side at any scale. ceil keeps
    // small strata whole (pct clamps to 100); the dominant language is
    // the one that actually downsamples.
    "curate_quota_sample" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val rates = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .select(col("lang"),
          least(lit(100L), ceil(lit(10000.0) / col("cnt"))).as("pct"))
      docs.join(broadcast(rates), "lang")
        .filter(Sampling.bucket100(col("doc_id")) < col("pct"))
        .select(col("doc_id"), col("lang"), col("pct"))
    }),

    // capstone training-data curation: exact-dedup survivors + quality gate
    // + language tag — the composed corpus-curation pipeline in one query
    "curate_corpus" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
      docs.join(keep, Seq("doc_id"), "left_semi")
        .join(TextOps.qualityScore(docs), Seq("doc_id"))
        .filter(col("quality") >= 0.5)
        .join(TextOps.langId(docs), Seq("doc_id"))
        .select(col("doc_id"), col("quality"), col("lang_pred"),
          size(split(col("text"), " ")).as("n_tokens"))
    }),

    // FULL curation capstone (round 3): the complete public-recipe corpus
    // pipeline in one query — exact-dedup survivors, benchmark
    // decontamination (anti-join), Gopher rule gate, repetition cap, then
    // quality + language tags. Every leg is left-semi/anti on doc_id
    // (fixed-width keys; the text never re-shuffles), and every leg is
    // itself an independently oracle-checked operator.
    "curate_corpus_full" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val corpus = docs.filter(col("doc_id") >= 10)
      val bench = docs.filter(col("doc_id") < 10)
      val keep = Dedup.exact(corpus).select(col("keep_id").as("doc_id"))
      val contaminated = Dedup.decontaminate(corpus, bench, n = 3, minOverlap = 2)
        .select("doc_id")
      val gopher = TextOps.gopherRules(corpus).filter(col("keep")).select("doc_id")
      val lowRep = TextOps.repetitionStats(corpus)
        .filter(col("top_bigram_frac") <= 0.2).select("doc_id")
      corpus
        .join(keep, Seq("doc_id"), "left_semi")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(gopher, Seq("doc_id"), "left_semi")
        .join(lowRep, Seq("doc_id"), "left_semi")
        .join(TextOps.qualityScore(corpus), Seq("doc_id"))
        .join(TextOps.langId(corpus), Seq("doc_id"))
        .select(col("doc_id"), col("quality"), col("lang_pred"),
          size(split(col("text"), " ")).as("n_tokens"))
    }),

    // per-doc curation provenance ledger — WHY each document survived or
    // died (the observability a production pipeline ships next to the
    // curated corpus: rejection reasons are how filter regressions are
    // caught). Same legs as the capstone, LEFT-joined as flags instead of
    // semi/anti-joined away; every leg emits ≤1 row per doc, so the joins
    // cannot fan out
    "curate_ledger" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val corpus = docs.filter(col("doc_id") >= 10)
      val bench = docs.filter(col("doc_id") < 10)
      val keep = Dedup.exact(corpus)
        .select(col("keep_id").as("doc_id"), lit(1).as("k"))
      val cont = Dedup.decontaminate(corpus, bench, n = 3, minOverlap = 2)
        .select(col("doc_id"), lit(1).as("ct"))
      val gop = TextOps.gopherRules(corpus).filter(col("keep"))
        .select(col("doc_id"), lit(1).as("g"))
      val rep = TextOps.repetitionStats(corpus)
        .filter(col("top_bigram_frac") <= 0.2)
        .select(col("doc_id"), lit(1).as("lr"))
      corpus.select("doc_id")
        .join(keep, Seq("doc_id"), "left")
        .join(cont, Seq("doc_id"), "left")
        .join(gop, Seq("doc_id"), "left")
        .join(rep, Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("k").isNull.as("is_dup"),
          col("ct").isNotNull.as("is_contaminated"),
          col("g").isNull.as("fails_gopher"),
          col("lr").isNull.as("high_repetition"),
          (col("k").isNotNull && col("ct").isNull && col("g").isNotNull &&
            col("lr").isNotNull).as("kept"))
    }),

    // decontamination attribution: per benchmark item, leaked-doc count +
    // total shingle overlap — the report eval owners read (the semi-join
    // decontaminate keeps no attribution; this keys the same broadcast by
    // bench doc)
    "curate_contamination_report" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      Dedup.contaminationReport(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10))
    }),

    // the datasheet a data team ships next to the corpus: the rejection
    // ledger aggregated to one row of counts + kept fraction (reuses the
    // ledger query — one extra global agg over ≤1 row/doc flags)
    "curate_summary" -> ((s, dir) =>
      queries("curate_ledger")(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup").cast("long")).as("n_dup"),
          sum(col("is_contaminated").cast("long")).as("n_contaminated"),
          sum(col("fails_gopher").cast("long")).as("n_fails_gopher"),
          sum(col("high_repetition").cast("long")).as("n_high_repetition"),
          sum(col("kept").cast("long")).as("n_kept"))
        .withColumn("kept_frac", round(
          col("n_kept").cast("double") / col("n_docs").cast("double"), 6))),

    // the ledger stratified by SOURCE — the domain-level filtering view
    // (RefinedWeb/CCNet-style: decide per-domain keep policy from its
    // rejection mix, not per-doc). One doc_id-keyed broadcast-shaped join
    // of the ≤1-row/doc ledger onto (doc_id, source), one source-keyed agg
    "curate_domain_report" -> ((s, dir) =>
      queries("curate_ledger")(s, dir)
        .join(docsTable(s, dir).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup").cast("long")).as("n_dup"),
          sum(col("is_contaminated").cast("long")).as("n_contaminated"),
          sum(col("fails_gopher").cast("long")).as("n_fails_gopher"),
          sum(col("high_repetition").cast("long")).as("n_high_repetition"),
          sum(col("kept").cast("long")).as("n_kept"))
        .withColumn("kept_frac", round(
          col("n_kept").cast("double") / col("n_docs").cast("double"), 6))),

    // per-language corpus datasheet: docs, token mass, mean quality — the
    // "datasheets for datasets" stratification report (lang-keyed hash agg
    // over per-doc map-side stats)
    // declared-vs-detected language confusion matrix: map-only detection
    // riding the corpus scan, one (declared, detected) hash agg, share
    // window over the langs²-row matrix
    "web_lang_consistency" -> ((s, dir) =>
      TextOps.langConsistency(docsTable(s, dir))),

    "text_lang_report" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      // mean quality in exact BIGINT: quality is q4/10⁴ (qualityScore's
      // exact-rational contract), so the mean is Σq4/(n·10⁴) — rounded
      // half-up at 4dp as (2·Σq4 + n) div (2n), the same boundary-free
      // integer form (AVG-of-doubles can land exactly on .xxxx5 when the
      // group count divides the sum — the text_quality hazard class)
      docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .join(TextOps.qualityScore(docs), "doc_id")
        .withColumn("q4", round(col("quality") * lit(10000.0), 0).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("q4")).as("sq4"))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          (floor((lit(2L) * col("sq4") + col("n_docs")).cast("double") /
            (lit(2L) * col("n_docs")).cast("double")) / lit(10000.0))
            .as("mean_quality"))
    }),

    // annotation coverage per language — the multilingual release-QA gate
    // (an English-only dictionary shows up here before anywhere else):
    // per lang, docs with >= 1 direct annotation vs total, 6dp. One
    // distinct-url agg over the match stream LEFT-joined onto per-lang
    // doc totals — corpus-scale work is the flagship scan only.
    "ann_coverage_by_lang" -> ((s, dir) => {
      val docs = docsTable(s, dir)
        .select((concat(lit("doc://"), col("doc_id"))).as("url"), col("lang"))
      val annotated = matches(s, dir).select("url").distinct()
        .withColumn("hit", lit(1L))
      docs.join(annotated, Seq("url"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_annotated"))
        .select(col("lang"), col("n_docs"), col("n_annotated"),
          round(col("n_annotated") / col("n_docs"), 6).as("coverage"))
    }),

    // per-language quality-bucket histogram — the stratification view a
    // curation threshold decision reads (where does each language's mass
    // sit before we pick the cut?): bucket = floor(quality·10) over the
    // 4dp-rounded score, so the boundary floor is identical cross-engine
    "curate_quality_buckets" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      docs.select(col("doc_id"), col("lang"))
        .join(TextOps.qualityScore(docs), "doc_id")
        .select(col("lang"),
          floor(col("quality") * lit(10)).cast("int").as("bucket"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // token-budget mixture planning (the DoReMi-adjacent artifact): given
    // target per-language shares and a total token budget, the per-lang
    // sampling rate that hits the mixture — rate = min(1, budget·share /
    // available). Shares are declared literals (the policy input); the
    // per-lang token totals are one agg; everything downstream is 1-row
    // arithmetic in the oracle's division order. The planner a curation
    // run executes BEFORE touching the corpus.
    "curate_token_budget" -> ((s, dir) => {
      val budget = 20000.0
      val shares = Map("en" -> 0.30, "fr" -> 0.20, "es" -> 0.20,
        "de" -> 0.15, "zh" -> 0.15)
      val shareCol = shares.foldLeft(lit(0.0)) { case (acc, (l, p)) =>
        when(col("lang") === l, lit(p)).otherwise(acc)
      }
      docsTable(s, dir)
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
        .select(col("lang"), col("n_tokens"), shareCol.as("target_share"),
          round(least(lit(1.0),
            lit(budget) * shareCol / col("n_tokens")), 6).as("sample_rate"),
          round(least(lit(budget) * shareCol, col("n_tokens").cast("double")), 1)
            .as("planned_tokens"))
    }),

    // capstone composition: the training-data curation ops FEED the
    // annotator — exact-dedup survivors + quality gate select the pages, the
    // native annotate builds the KG only over curated pages (the realistic
    // 100 TB pipeline shape: curate once, then extract knowledge)
    "kg_curated_triples" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
      val curated = docs.join(keep, Seq("doc_id"), "left_semi")
        .join(TextOps.qualityScore(docs), Seq("doc_id"))
        .filter(col("quality") >= 0.5)
        .select(docs.columns.toIndexedSeq.map(col): _*)
      graft.annotate.NativeAnnotate
        .annotateTriples(Corpus.extract(Corpus.fromDriverTable(curated)),
          model(s), fusedMaps(s), "v1")
        .select("subj", "pred", "obj")
    }),

    // ---- graph analytics over the materialized KG ------------------------
    // concept co-occurrence edges (src < dst, doc count) from the direct
    // annotation stream — one groupBy(url) + map-side pair explosion
    "kg_cooccur" -> ((s, dir) =>
      graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri"))),

    // Milne–Witten relatedness distance over the same annotation doc space
    "kg_relatedness" -> ((s, dir) =>
      graft.graph.KgGraph.milneWitten(
        matches(s, dir).select("url", "class_iri"))),

    "kg_degree" -> ((s, dir) =>
      graft.graph.KgGraph.degrees(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // alternating large-star/small-star contraction (O(log² n) rounds) —
    // component label = MIN(class_iri) in the component, matching the
    // recursive-CTE oracle
    "kg_components" -> ((s, dir) =>
      graft.graph.KgGraph.connectedComponents(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // graph-release QA: component-size histogram + per-size node fraction
    // (giant-component watch: over-merge and shatter both read off this)
    "kg_component_sizes" -> ((s, dir) =>
      graft.graph.KgGraph.componentSizes(
        graft.graph.KgGraph.connectedComponents(graft.graph.KgGraph.cooccurrence(
          matches(s, dir).select("url", "class_iri"))))),

    // per-node Watts–Strogatz local clustering coefficient
    // (2·tri / deg·(deg−1); tag-page hubs show cc ≈ 0)
    "kg_clustering" -> ((s, dir) =>
      graft.graph.KgGraph.clusteringCoefficient(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // one-row degree-assortativity drift alarm (Newman 2002 Pearson r over
    // endpoint degrees, both orientations)
    "kg_assortativity" -> ((s, dir) =>
      graft.graph.KgGraph.assortativity(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // TEMPORAL fact history — the KG-maintenance view over TIME (the
    // crawl-snapshot sibling of kg_fact_diff's release axis): each fact's
    // first/last observation epoch, snapshot support, and whether it
    // SURVIVED the doc's latest capture. Snapshot 2 re-crawls every third
    // doc with its first half of tokens (facts can die, never appear —
    // deterministic, oracle-mirrored). Per-snapshot annotation is the
    // flagship zero-shuffle scan; history is ONE fact-keyed aggregation.
    "kg_fact_history" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val s1 = docs.select(col("doc_id"), col("text"), lit(1).as("snapshot"),
        (lit(1700000000L) + col("doc_id") * 60).as("fetch_epoch"))
      val s2 = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, " +
            "(size(split(text, ' ')) + 1) div 2), ' ')").as("text"),
          lit(2).as("snapshot"),
          (lit(1700000000L) + col("doc_id") * 60 + 604800L).as("fetch_epoch"))
      val snaps = s1.unionByName(s2)
      val m = graft.annotate.NativeAnnotate.annotateMatches(
        snaps.select(concat(lit("doc://"), col("doc_id"), lit("@"),
          col("snapshot")).as("url"), col("text")), model(s))
      val urlRe = "^doc://(\\d+)@(\\d+)$"
      val facts = m.select(
          regexp_extract(col("url"), urlRe, 1).cast("long").as("doc_id"),
          regexp_extract(col("url"), urlRe, 2).cast("int").as("snapshot"),
          col("class_iri")).distinct()
        .join(snaps.select("doc_id", "snapshot", "fetch_epoch"),
          Seq("doc_id", "snapshot"))
      val cap = snaps.groupBy("doc_id").agg(max("fetch_epoch").as("last_cap"))
      facts.groupBy("doc_id", "class_iri")
        .agg(min("fetch_epoch").as("first_epoch"),
          max("fetch_epoch").as("last_epoch"),
          count_distinct(col("snapshot")).as("n_snapshots"))
        .join(cap, "doc_id")
        .select(concat(lit("doc://"), col("doc_id")).as("subj"),
          col("class_iri").as("obj"), col("first_epoch"), col("last_epoch"),
          col("n_snapshots"),
          (col("last_epoch") === col("last_cap")).as("current"))
    }),

    // fact VALIDITY INTERVALS over a 6-visit capture history (temporal KG
    // construction): odd visits capture only the first half of each doc's
    // tokens, so second-half facts flicker — gaps-and-islands over the
    // per-visit presence stream turns each consecutive-presence run into
    // one (valid_from, valid_to) interval row, the representation
    // kg_fact_history's first/last summary cannot express (facts that die
    // and RETURN). Annotation is the flagship zero-shuffle scan ×6;
    // islands cost one per-fact window (≤6 rows per key) + one agg
    "kg_fact_intervals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = docsTable(s, dir)
      val visits = docs.select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(FactVisits - 1))).as("visit"))
        .select(col("doc_id"), col("visit"),
          when(col("visit") % 2 === 0, col("text"))
            .otherwise(expr("array_join(slice(split(text, ' '), 1, " +
              "(size(split(text, ' ')) + 1) div 2), ' ')")).as("text"))
      val m = graft.annotate.NativeAnnotate.annotateMatches(
        visits.select(concat(lit("doc://"), col("doc_id"), lit("@"),
          col("visit")).as("url"), col("text")), model(s))
      val urlRe = "^doc://(\\d+)@(\\d+)$"
      val facts = m.select(
          regexp_extract(col("url"), urlRe, 1).cast("long").as("doc_id"),
          regexp_extract(col("url"), urlRe, 2).cast("int").as("visit"),
          col("class_iri")).distinct()
      val w = Window.partitionBy("doc_id", "class_iri").orderBy("visit")
      facts.withColumn("island", col("visit") - row_number().over(w))
        .groupBy("doc_id", "class_iri", "island")
        .agg(min("visit").as("from_visit"), max("visit").as("to_visit"),
          count(lit(1)).as("n_visits"))
        .select(concat(lit("doc://"), col("doc_id")).as("subj"),
          col("class_iri").as("obj"),
          (lit(1700000000L) + col("from_visit") * 604800L).as("valid_from"),
          (lit(1700000000L) + col("to_visit") * 604800L).as("valid_to"),
          col("n_visits"))
    }),

    // POINT-IN-TIME KG snapshot: the graph "as of" AsOfEpoch — for each
    // doc, its latest capture at or before T (one max(struct) argmax per
    // doc, the CDX crawl-merge shape), then ONLY that capture annotated.
    // At 10^12 docs the as-of selection is one doc-keyed agg over capture
    // metadata (tiny rows); the corpus-scale annotate runs on exactly one
    // version per doc — never on the full capture history
    "kg_asof_snapshot" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val s1 = docs.select(col("doc_id"), col("text"), lit(1).as("snapshot"),
        (lit(1700000000L) + col("doc_id") * 60).as("fetch_epoch"))
      val s2 = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, " +
            "(size(split(text, ' ')) + 1) div 2), ' ')").as("text"),
          lit(2).as("snapshot"),
          (lit(1700000000L) + col("doc_id") * 60 + 604800L).as("fetch_epoch"))
      val snaps = s1.unionByName(s2)
      val chosen = snaps.filter(col("fetch_epoch") <= AsOfEpoch)
        .groupBy("doc_id")
        .agg(max(struct(col("fetch_epoch"), col("snapshot"))).as("k"))
        .select(col("doc_id"), col("k.snapshot").as("snapshot"),
          col("k.fetch_epoch").as("fetch_epoch"))
      val m = graft.annotate.NativeAnnotate.annotateMatches(
        chosen.join(snaps, Seq("doc_id", "snapshot", "fetch_epoch"))
          .select(concat(lit("doc://"), col("doc_id")).as("url"),
            col("text")), model(s))
      m.select(col("url").as("subj"), col("class_iri").as("obj")).distinct()
        .join(chosen.select(
          concat(lit("doc://"), col("doc_id")).as("subj"),
          col("snapshot"), col("fetch_epoch")), "subj")
    }),

    // join-key SKEW REPORT over the fact stream keyed by concept — the
    // hot-key diagnostic that DECIDES the salting factor (SURVEY §3 S1)
    // instead of guessing it: per-key counts (one map-side-combinable
    // agg), totals attached as a broadcast 1-row scalar, salt_factor =
    // ceil(32·n/total) = the buckets needed to level this key to the
    // average partition load at P=32 — exact integer arithmetic end to end
    "q_skew_report" -> ((s, dir) => {
      val pairs = matches(s, dir).select("url", "class_iri").distinct()
      val counts = pairs.groupBy("class_iri").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("class_iri"), col("n"),
          expr("(n * 1000000) div total").as("share_ppm"),
          expr("(n * 32 + total - 1) div total").as("salt_factor"))
        .orderBy(col("n").desc, col("class_iri")).limit(10)
    }),

    // incremental components: a deterministic 1/5 hash-slice of the cooc
    // edges plays the "new crawl batch" delta — v1 labels from the
    // remaining 4/5, delta merged by contraction. The result must be
    // indistinguishable from the cold run, so the oracle IS kg_components'
    // (the ann_sharded precedent: an execution-strategy variant shares the
    // semantic oracle)
    "kg_components_delta" -> ((s, dir) => {
      val cooc = graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")).localCheckpoint()
      val isDelta = pmod(xxhash64(col("src"), col("dst")), lit(5)) === 0
      val old = graft.graph.KgGraph.connectedComponents(cooc.filter(!isDelta))
      graft.graph.KgGraph.componentsDelta(old, cooc.filter(isDelta))
    }),

    // MENTION CONTEXT windows — the training artifact entity-disambiguation
    // and entity-embedding models consume: each occurrence with ±30 chars
    // of its ORIGINAL-text surroundings. ONE url-keyed join of the match
    // stream back to the corpus (the standard context-extraction shape —
    // the corpus is scanned once; nothing wider than the match stream
    // shuffles), window cut by pure substring arithmetic, clipped at doc
    // edges identically in both engines.
    // rule-based pronominal coreference: injected pronouns resolve to the
    // NEAREST PRECEDING mention span (from the real annotator's offsets),
    // each resolved pronoun emitting an extra corefMention fact; an
    // ambiguous nearest mention (one term, two classes) links to all of
    // them, exactly like the direct annotation it extends
    "kg_coref" -> ((s, dir) => {
      val pages = graft.ops.Relations.withPronouns(docsTable(s, dir))
      graft.ops.Relations.corefMentions(pages,
        graft.annotate.NativeAnnotate.annotateMatches(pages, model(s)))
    }),

    "kg_mention_contexts" -> ((s, dir) => {
      val c = corpus(s, dir).select(col("url"), col("text"))
      matches(s, dir)
        .select(col("url"), col("class_iri"), col("from"), col("to"))
        .distinct()
        .join(c, "url")
        .select(col("url"), col("class_iri"),
          col("from").cast("int").as("mention_from"),
          expr("substring(text, greatest(1, `from` - 30), " +
            "`to` + 30 - greatest(1, `from` - 30) + 1)").as("context"))
        // distinct AFTER the projection: same-class prefix terms (e.g.
        // KEY / KEY VALUE) at one start whose windows both clip at the doc
        // end collapse to identical rows — the oracle's DISTINCT is
        // post-projection too
        .distinct()
    }),

    // TYPE-level schema graph (schema induction): the concept co-occurrence
    // graph rolled up to semantic types — per unordered (tui_a, tui_b)
    // pair, total edge mass + distinct concept-pair count. The type table
    // is dictionary-scale → broadcast; one (tui, tui)-keyed agg over the
    // already-aggregated cooc edges. What ontology engineers read to see
    // WHICH KINDS of things co-occur, not which instances.
    "kg_type_graph" -> ((s, dir) => {
      val cooc = graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri"))
      val tuis = OntologyFixture.conceptsDf(s)
        .select(col("class_iri"), explode(col("tuis")).as("tui"))
      cooc
        .join(broadcast(tuis.select(col("class_iri").as("src"),
          col("tui").as("t_src"))), "src")
        .join(broadcast(tuis.select(col("class_iri").as("dst"),
          col("tui").as("t_dst"))), "dst")
        .select(least(col("t_src"), col("t_dst")).as("tui_a"),
          greatest(col("t_src"), col("t_dst")).as("tui_b"), col("n_docs"))
        .groupBy("tui_a", "tui_b")
        .agg(sum("n_docs").as("edge_mass"), count(lit(1)).as("n_pairs"))
    }),

    // PMI association strength per co-occurrence edge (Church & Hanks):
    // ln(n_ab·N / (n_a·n_b)) over the same capped doc universe
    "kg_pmi" -> ((s, dir) =>
      graft.graph.KgGraph.pmi(matches(s, dir).select("url", "class_iri"))),

    // k-core decomposition by iterated peeling; converges well inside the
    // 8 rounds the oracle unrolls (peeling is idempotent after convergence,
    // so fixed-unroll == converged engine result — asserted in-engine)
    // maxIter pinned to the oracle's unroll count — the engine's
    // convergence assertion within 8 is what licenses the fixed unroll
    "kg_kcore" -> ((s, dir) =>
      graft.graph.KgGraph.kcore(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")), k = 3, maxIter = 8)),

    // fixed-iteration PageRank (10 rounds, d=0.85) — the oracle unrolls the
    // same 10 iterations as CTEs, so scores match to the 6dp contract
    "kg_pagerank" -> ((s, dir) =>
      graft.graph.KgGraph.pageRank(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // bounded-horizon Katz centrality: attenuated walk counts with NO
    // degree normalization (a hub's endorsement counts fully — the
    // citation-prestige index next to PageRank's random surfer)
    "kg_katz" -> ((s, dir) =>
      graft.graph.KgGraph.katz(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // weighted PageRank: rank mass flows in proportion to edge weight
    // (n_docs) — same unrolled-CTE oracle shape with weighted contributions
    "kg_pagerank_weighted" -> ((s, dir) =>
      graft.graph.KgGraph.pageRankWeighted(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // per-node triangle counts (canonical a<b<c wedge join)
    "kg_triangles" -> ((s, dir) =>
      graft.graph.KgGraph.triangles(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // Jaccard-normalized concept similarity over co-occurrence doc sets
    "kg_concept_sim" -> ((s, dir) =>
      graft.graph.KgGraph.conceptSimilarity(
        matches(s, dir).select("url", "class_iri"))),

    // TF-IDF annotation relevance (tf · ln(N/df)) — boilerplate concepts sink
    "ann_tfidf" -> ((s, dir) =>
      Scoring.tfIdf(
        matches(s, dir).withColumnRenamed("class_iri", "classIri"),
        docsTable(s, dir).count())
        .withColumnRenamed("classIri", "class_iri")),

    "text_quality" -> ((s, dir) => TextOps.qualityScore(docsTable(s, dir))),

    // Gopher-style rule filter (word-count band, mean word length, symbol
    // ratio, stopword hits → keep flag) — map-only column expressions
    "text_gopher" -> ((s, dir) => TextOps.gopherRules(docsTable(s, dir))),

    // Gopher-style repetition signals: top-bigram fraction via a sorted-
    // array run-length fold (map-only; oracle recomputes declaratively)
    "text_repetition" -> ((s, dir) => TextOps.repetitionStats(docsTable(s, dir))),

    "text_langid" -> ((s, dir) => TextOps.langId(docsTable(s, dir))),

    "text_fingerprint" -> ((s, dir) => TextOps.fingerprint(docsTable(s, dir))),

    // REAL ImageIO decode on the image rows: the oracle checks the decoded
    // width/height/solid-color means against the PNG GENERATION formulas —
    // an end-to-end codec round-trip, not a stub echo. Non-image kinds keep
    // the documented stub dims (byte-length formulas, also oracle-checked).
    // PNG byte payloads (n_bytes/checksum) stay in the Dataset API but are
    // projected out here (encoder bytes are not SQL-derivable).
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docsTable(s, dir)))
        .toDF().select(col("url"), col("kind"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))),

    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docsTable(s, dir)))
        .toDF().select(col("url"), col("frame_idx"), length(col("frame_bytes")).as("frame_len"))),

    // decode → nearest-neighbor resample → re-encode; resized means must
    // equal the source solid color (resampling a constant image is constant)
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeImages(Multimodal.mediaFromDocuments(docsTable(s, dir)))
        .toDF().select(col("url"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))),

    // Adamic–Adar link prediction over the co-occurrence graph: candidate
    // (non-)edges scored by Σ 1/ln(deg) over common neighbors — degree is
    // the local size of each sorted neighbor set, so no degree join
    "kg_adamic_adar" -> ((s, dir) =>
      graft.graph.KgGraph.adamicAdar(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // token-unigram Shannon entropy via a sorted-run fold (map-only);
    // oracle recomputes declaratively (unnest + GROUP BY)
    "text_entropy" -> ((s, dir) => TextOps.tokenEntropy(docsTable(s, dir))),

    // synchronous fixed-round label-propagation communities (arg-min
    // tie-break makes it deterministic; oracle unrolls the same 4 rounds)
    "kg_labelprop" -> ((s, dir) =>
      graft.graph.KgGraph.labelPropagation(graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")))),

    // partition-quality QA: weighted modularity of the label-propagation
    // communities — per-community e_c/m − (S_c/2m)² (Newman 2004)
    "kg_modularity" -> ((s, dir) => {
      // pin the shared edge list: labelPropagation and modularity both
      // consume it, and an unpinned plan re-runs the corpus-side
      // co-occurrence agg once per consumer (the kg_components_delta
      // precedent)
      val cooc = graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")).localCheckpoint()
      graft.graph.KgGraph.modularity(cooc,
        graft.graph.KgGraph.labelPropagation(cooc))
    }),

    // Apriori-pruned frequent concept 3-itemsets (support ≥ 20 % of the
    // doc universe): candidates from frequent-pair joins (the downward-
    // closure prune — ontology²-bounded, corpus-free), verified by three
    // url-keyed joins against the broadcast candidate set
    "kg_itemsets" -> ((s, dir) =>
      graft.graph.KgGraph.frequentTriples(
        matches(s, dir).select("url", "class_iri"))),

    // association rules from the frequent triples: pair→item confidence
    // and lift (two pinned divisions over exact supports), kept ≥ 0.8 —
    // the kg_itemsets follow-on every market-basket deployment ships
    "kg_assoc_rules" -> ((s, dir) =>
      graft.graph.KgGraph.associationRules(
        matches(s, dir).select("url", "class_iri"))),

    // per-community conductance of the post-Louvain-move partition —
    // cut / min(vol, 2m − vol) (Kannan–Vempala–Vetta 2004), the
    // cut-quality complement to kg_modularity's density view (label
    // propagation collapses to one community on this corpus — that's the
    // NULL trivial-cut case, not a partition worth cutting)
    "kg_conductance" -> ((s, dir) => {
      val cooc = graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")).localCheckpoint()
      graft.graph.KgGraph.conductance(cooc,
        graft.graph.KgGraph.louvainMove(cooc,
          graft.graph.KgGraph.singletonPartition(cooc))
          .select(col("class_iri"), col("community")))
    }),

    // one synchronous Louvain local-move sweep from the singleton
    // partition (= phase-1 round 1) — exact-BIGINT modularity-gain argmax
    // per node, ties prefer staying then smallest label; dq is the true
    // ΔQ of each move (one pinned division)
    "kg_louvain_move" -> ((s, dir) => {
      val cooc = graft.graph.KgGraph.cooccurrence(
        matches(s, dir).select("url", "class_iri")).localCheckpoint()
      graft.graph.KgGraph.louvainMove(cooc,
        graft.graph.KgGraph.singletonPartition(cooc))
    }),

    // PMI-scored adjacent-bigram collocations (phrase mining)
    "text_collocations" -> ((s, dir) =>
      TextOps.collocations(docsTable(s, dir))),

    // Schwartz–Hearst-style acronym mining over the acronym-augmented
    // corpus: (abbr, long form) pairs whose initials spell the abbreviation
    // — synonym discovery feeding the next dictionary release
    "text_acronyms" -> ((s, dir) =>
      TextOps.acronyms(TextOps.withAcronyms(docsTable(s, dir)))),

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

    // JSONL source/sink round trip — the crawl-pipeline interchange format
    // next to parquet/TSV/N-Triples/WARC: write the docs table as
    // line-delimited JSON (splittable at scale), read it back with a PINNED
    // schema (no inference job — schema-on-read is a second full scan at
    // 100 TB), and derive stats that must equal the parquet-direct oracle —
    // sink+source fidelity proven through the format
    "io_jsonl_roundtrip" -> ((s, dir) => {
      // per-session path: concurrent JVMs (Verify + Bench) must not race
      // each other's overwrite/read on a shared fixed location
      val out = s"/tmp/graft-jsonl-${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName
      docsTable(s, dir).write.mode("overwrite").json(out)
      val back = s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(out)
      back.select(col("doc_id"),
        length(col("text")).as("n_chars_text"),
        size(split(col("text"), " ")).as("n_tokens"))
    }),

    // CSV sibling of the JSONL round trip — the interchange format every
    // upstream data drop still arrives in. Default splittable mode (quote
    // framing, no multiLine) with a PINNED schema, no inference scan; the
    // hostile-content legs (embedded commas/quotes/newlines → multiLine)
    // are pinned by IoSpec, where the fixture can be adversarial
    "io_csv_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft-csv-${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName
      docsTable(s, dir).write.mode("overwrite").option("header", "false").csv(out)
      s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .csv(out)
        .select(col("doc_id"),
          length(col("text")).as("n_chars_text"),
          size(split(col("text"), " ")).as("n_tokens"))
    }),

    // ORC sibling of the JSONL round trip (ORC is the other first-class
    // columnar at-rest format next to parquet; native Spark reader with
    // predicate pushdown) — same fidelity contract through the format
    "io_orc_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft-orc-${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName
      docsTable(s, dir).write.mode("overwrite").orc(out)
      s.read.orc(out).select(col("doc_id"),
        length(col("text")).as("n_chars_text"),
        size(split(col("text"), " ")).as("n_tokens"))
    }),

    // WARC container round trip, end-to-end: corpus → deterministic HTML
    // wrap → WARC response records → multi-record file blobs → parse →
    // HTML extraction. The oracle is just the documents table — any
    // framing/extraction defect breaks the equality.
    "warc_extract" -> ((s, dir) => {
      val corpus = Corpus.fromDriverTable(docsTable(s, dir))
      Corpus.extract(graft.io.Warc.recordsFromBlobs(
          graft.io.Warc.syntheticBlobs(corpus, buckets = 8)))
        .select("url", "text")
    }),

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

    // AMS/count-sketch F2 (self-join size) estimator over the annotation
    // key stream — the one-pass optimizer statistic behind q_skew_report's
    // salting decision, audited against the exact F2 (all-BIGINT; the only
    // float is rel_err)
    "sketch_ams" -> ((s, dir) =>
      Sketch.amsF2(matches(s, dir).select("url", "class_iri").distinct(),
        "class_iri")),

    // PageRank iteration-count QA: L1 residual between the 5- and 6-round
    // rankings in exact micro-units (ranks are 6dp-rounded, so ×1e6 is
    // integer arithmetic) — the release gate that DECIDES iters instead of
    // guessing it
    "kg_pr_residual" -> ((s, dir) => {
      val e = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      val p5 = graft.graph.KgGraph.pageRankDirected(e, 5)
        .select(col("page"),
          round(col("pagerank") * lit(1e6)).cast("long").as("m5"))
      val p6 = graft.graph.KgGraph.pageRankDirected(e, 6)
        .select(col("page"),
          round(col("pagerank") * lit(1e6)).cast("long").as("m6"))
      p5.join(p6, "page")
        .agg(sum(abs(col("m5") - col("m6"))).as("l1_micro"),
          max(abs(col("m5") - col("m6"))).as("max_micro"))
        .select(col("l1_micro"), col("max_micro"),
          round(col("l1_micro").cast("double") / lit(1e6), 6)
            .as("l1_residual"))
    }),

    // Spearman rank correlation between the 5- and 6-round PageRank
    // rankings — kg_pr_residual's rank-space sibling (a release whose
    // VALUES drift but whose ORDER holds is safe to ship): ranks by
    // row_number (score desc, node — the deterministic tie policy, ties
    // on the 6dp grid broken identically in both engines), then
    // ρ = 1 − 6Σd²/(n(n²−1)) in exact BIGINT until one ROUND(6) division
    "kg_rank_corr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the ranking window is node-table-scale (pages), never the corpus;
      // at 10^12 nodes the global sort flips to the D6 two-pass
      // range-repartition + zipWithIndex form — same contract
      val e = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))).localCheckpoint()
      def ranked(iters: Int, out: String) =
        graft.graph.KgGraph.pageRankDirected(e, iters)
          .select(col("page"), row_number().over(
            Window.orderBy(col("pagerank").desc, col("page")))
            .cast("long").as(out))
      ranked(5, "r5").join(ranked(6, "r6"), "page")
        .agg(count(lit(1)).as("n"),
          sum((col("r5") - col("r6")) * (col("r5") - col("r6"))).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          round(lit(1.0) - lit(6.0) * col("sum_d2") /
            (col("n") * (col("n") * col("n") - lit(1L))).cast("double"), 6)
            .as("spearman_rho"))
    }),

    // per-user next-event transition matrix (the Markov-chain view of
    // the event stream, q_funnel's unordered sibling): consecutive-event
    // pairs via ONE per-user LAG (partitions are a user's events —
    // bounded; (ts, event_id) ordering makes equal timestamps
    // deterministic), then P(next | cur) as one pinned division per cell
    "q_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(s"$dir/events.parquet")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .select(col("user_id"), col("event_type").as("next_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy("prev_type").agg(sum(col("n")).as("n_from"))
      pairs.join(tot, "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("n_from"), 6).as("p"))
    }),

    // equi-depth histogram selectivity audit — the optimizer statistic
    // q_table_stats/q_skew_report/sketch_ams complete: 10-bucket bounds
    // from EXACT percentiles (the q_quantiles cross-engine contract,
    // rounded 4dp before use), range-predicate estimate = n/10 · Σ
    // clipped bucket-overlap fractions (what ANALYZE histograms answer),
    // audited against the exact count. All on ONE 1-row aggregate frame;
    // the fold runs over the 11-element bounds array, never rows
    "q_histogram_selectivity" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val qs = (1 to 9).map(i => i / 10.0)
      val base = d.agg(count(lit(1)).as("n_rows"),
        min(col("n_chars")).cast("double").as("b0"),
        expr(s"percentile(n_chars, array(${qs.mkString(",")}))").as("qb"),
        max(col("n_chars")).cast("double").as("b10"),
        sum(when(col("n_chars").between(150, 350), lit(1L))
          .otherwise(lit(0L))).as("exact_rows"))
      val rb = transform(concat(array(col("b0")), col("qb"),
        array(col("b10"))), x => round(x, 4))
      val (lo0, hi0) = (lit(150.0), lit(350.0))
      val frac = aggregate(sequence(lit(1), lit(10)), lit(0.0), (acc, i) => {
        val lo = element_at(rb, i)
        val hi = element_at(rb, i + 1)
        val f = when(hi > lo,
            greatest(lit(0.0),
              (least(hi0, hi) - greatest(lo0, lo)) / (hi - lo)))
          .otherwise(when(lo >= lo0 && lo <= hi0, lit(1.0))
            .otherwise(lit(0.0)))
        acc + greatest(lit(0.0), least(f, lit(1.0)))
      })
      // exact_rows = 0 guard: Spark's non-ANSI division yields NULL where
      // DuckDB's IEEE doubles yield inf — pin both engines to NULL
      base.select(col("n_rows"),
        round(col("n_rows") / lit(10.0) * frac, 2).as("est_rows"),
        col("exact_rows"),
        when(col("exact_rows") === 0L, lit(null).cast("double"))
          .otherwise(
            round(abs(col("n_rows") / lit(10.0) * frac - col("exact_rows")) /
              col("exact_rows"), 6)).as("rel_err"))
    }),

    // shard-rebalance preview (the consistent-hashing pitch QUANTIFIED,
    // Karger 1997): fraction of keys that MOVE when 32 shards become 33
    // under (a) mod placement and (b) a 8-vnode hash ring — ~P/(P+1)
    // vs ~1/(P+1); the layout decision read before resharding a 100 TB
    // store. Ring assignment = argmin over the broadcast 264-row vnode
    // table (successor-with-wrap as a (flag, hash, shard) struct-min —
    // never a sort per key)
    "q_shard_rebalance" -> ((s, dir) => {
      import s.implicits._
      val keys = docsTable(s, dir).select(col("doc_id"),
        Sketch.hash60(concat(lit("k|"), col("doc_id").cast("string")))
          .as("kh")).localCheckpoint()
      def assign(p: Int, out: String) = {
        val vn = broadcast(
          (for { sh <- 0 until p; v <- 0 until 8 } yield (sh, v))
            .toDF("shard", "v")
            .select(col("shard"), Sketch.hash60(concat(lit("vn|"),
              col("shard").cast("string"), lit("|"),
              col("v").cast("string"))).as("h")))
        keys.crossJoin(vn)
          .select(col("doc_id"),
            when(col("h") >= col("kh"), lit(0)).otherwise(lit(1)).as("flag"),
            col("h"), col("shard"))
          .groupBy("doc_id")
          .agg(min(struct(col("flag"), col("h"), col("shard"))).as("m"))
          .select(col("doc_id"), col("m.shard").as(out))
      }
      val ring = assign(32, "s32").join(assign(33, "s33"), "doc_id")
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("s32") =!= col("s33"), lit(1L)).otherwise(lit(0L)))
            .as("n_moved"))
      val mod = keys.agg(count(lit(1)).as("n_keys"),
        sum(when(pmod(col("kh"), lit(32L)) =!= pmod(col("kh"), lit(33L)),
          lit(1L)).otherwise(lit(0L))).as("n_moved"))
      def shaped(df: DataFrame, scheme: String) = df.select(
        lit(scheme).as("scheme"), col("n_keys"), col("n_moved"),
        round(col("n_moved").cast("double") / col("n_keys"), 6)
          .as("moved_frac"))
      shaped(mod, "mod").unionByName(shaped(ring, "ring"))
    }),

    // ordered conversion funnel view → click → purchase (the event-
    // analytics staple): step k's cohort = users whose FIRST qualifying
    // step-k event follows their step-(k−1) entry time WITHIN the 1-day
    // conversion window (unwindowed, a 30-day dense event stream converts
    // everyone — the window makes it a measurement) — three user-keyed
    // min-aggs chained by joins (never a per-user event sort); the 3-row
    // step frame carries the lag conversion ratio
    "q_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(s"$dir/events.parquet")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 1 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def cnt(df: DataFrame, step: Int, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(step).as("step"), lit(name).as("event_type"),
            col("n_users"))
      cnt(s1, 1, "view").unionByName(cnt(s2, 2, "click"))
        .unionByName(cnt(s3, 3, "purchase"))
        .select(col("step"), col("event_type"), col("n_users"),
          round(col("n_users").cast("double") /
            lag(col("n_users"), 1).over(Window.orderBy("step")), 6)
            .as("conv_from_prev"))
    }),

    // retention cohort matrix: cohort = the user's first active DATE,
    // cells = distinct users active at each day offset — two aggs and a
    // broadcast-joinable first-day table; the matrix is days²-bounded
    "q_retention" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val first = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("cohort"))
      ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .join(first, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // count-min frequency sketch: d×w counter matrix (a few KB at ANY
    // corpus size), estimates vs exact for the 20 hottest tokens; the
    // min-over-rows estimate can only over-count
    "sketch_cm" -> ((s, dir) => {
      import s.implicits._
      val toks = docsTable(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      // the 20-row probe set is QUERY INPUT — collect it so the final plan
      // doesn't re-evaluate the corpus tokenization + top-k three times
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(20)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val topDf = top.toDF("tok", "exact_n")
      val est = Sketch.countMinEstimate(Sketch.countMin(toks, "tok"),
          topDf, "tok")
        .withColumnRenamed("v", "tok")
      topDf.join(est, "tok")
        .select(col("tok"), col("exact_n"), col("cm_estimate"))
    }),

    // BM25 retrieval over the corpus for a literal query term set
    "text_bm25" -> ((s, dir) =>
      TextOps.bm25(docsTable(s, dir), Seq("spark", "join", "data"))),

    // Dirichlet query-likelihood retrieval over the same query set — the
    // LM-retrieval counterpart: absent terms still score via the
    // collection prior (docs × |Q| map-side expansion, LEFT tf join)
    "text_qlm" -> ((s, dir) =>
      TextOps.qlm(docsTable(s, dir), Seq("spark", "join", "data"))),

    // reciprocal-rank fusion of the BM25 and Dirichlet-QL runs (their raw
    // scores live on incomparable scales; RRF is the score-free standard,
    // k = 60) — fusion rides the two ≤20-row run frames, never the corpus
    "text_rrf" -> ((s, dir) => {
      val d = docsTable(s, dir)
      val q = Seq("spark", "join", "data")
      TextOps.rrfFuse(Seq(TextOps.bm25(d, q), TextOps.qlm(d, q)))
    }),

    // Heaps-law vocabulary-growth curve + log–log OLS slope β (the
    // release-card companion to web_powerlaw): cumulative tokens/vocab at
    // 10 deterministic doc_id-range prefixes; K not emitted (needs exp)
    "text_heaps" -> ((s, dir) => TextOps.heapsLaw(docsTable(s, dir))),

    // FULL coreness decomposition of the page graph via h-index iteration
    // (kg_kcore answers one k; this emits every node's core number) —
    // exact-convergence loop licenses the oracle's fixed unroll
    "web_coreness" -> ((s, dir) =>
      graft.graph.KgGraph.coreness(LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir)))))),

    // RM3 pseudo-relevance feedback, expansion leg: rank-weighted (1/rank
    // — the deterministic stand-in for exp(score), a named decision)
    // relevance-model term weights from the top-5 first-pass docs
    "text_rm3_terms" -> ((s, dir) =>
      TextOps.rm3Weights(docsTable(s, dir), Seq("spark", "join", "data"))),

    // RM3 reranking: second-pass QL with the expanded weighted query
    // (original terms at 1.0, expansion terms at beta·w)
    "text_rm3" -> ((s, dir) =>
      TextOps.rm3(docsTable(s, dir), Seq("spark", "join", "data"))),

    // inverted-index publication: per-term d-gap-encoded posting lists
    // within a df band (the band bounds window partitions + arrays)
    "text_postings" -> ((s, dir) =>
      TextOps.postings(docsTable(s, dir))),

    // RAKE keyphrases: phrase islands between stopwords, deg/freq word
    // scores, top-3 phrases per doc on the 6dp-rounded score — every
    // window and agg rides ONE doc_id exchange
    "text_rake" -> ((s, dir) => TextOps.rake(docsTable(s, dir))),

    // crawl-snapshot merge: latest capture per canonical URL across two
    // deterministic snapshots — one argmax hash aggregation (max(struct)),
    // never a window
    "web_crawl_merge" -> ((s, dir) =>
      WebOps.crawlMerge(WebOps.crawlSnapshots(docsTable(s, dir)))),

    // gap-based sessionization (session_window, 30-min gap) — the batch
    // form of the streaming sessionizer; epoch-micro session bounds
    "stream_sessions" -> ((s, dir) =>
      graft.streaming.EventStream.sessionize(
        s.read.parquet(s"$dir/events.parquet"))),

    // stream-stream join's batch twin (same plan minus state stores):
    // discovery→fetch latency within the event-time bound
    "stream_join" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      def side(m: Int) = ev.filter(col("event_id") % 2 === m)
        .select(concat(lit("u"), col("user_id")).as("url"), col("ts"))
      graft.streaming.EventStream.discoveryFetchJoin(side(0), side(1))
    }),

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

    // DSIR importance weights toward the English slice of the corpus:
    // hashed-unigram target/raw distributions, add-α smoothing, per-doc
    // log-importance sums
    "text_dsir" -> ((s, dir) =>
      TextOps.dsirWeights(docsTable(s, dir), col("lang") === "en")),

    // schema.org microdata → (subj, pred, obj) triples: itemtype plus
    // prop/value spans zipped by occurrence index, map-only extraction
    "kg_microdata" -> ((s, dir) =>
      graft.ops.Relations.microdataTriples(
        graft.ops.Relations.withMicrodata(docsTable(s, dir)))),

    // JSON-LD script blocks → triples: regex cut + native from_json +
    // nested-author fragment-node minting, map-only until the distinct
    "kg_jsonld" -> ((s, dir) =>
      graft.ops.Relations.jsonLdTriples(
        graft.ops.Relations.withJsonLd(docsTable(s, dir)))),

    // SPARQL DESCRIBE (CBD): Article pages + their minted author
    // sub-nodes — all joins subj-keyed, one frontier round (the JSON-LD
    // nesting's fixed point)
    "kg_describe" -> ((s, dir) => {
      val t = graft.ops.Relations.jsonLdTriples(
        graft.ops.Relations.withJsonLd(docsTable(s, dir)))
      graft.ops.KgPublish.describe(t,
        t.filter(col("pred") === "rdf:type" && col("obj") === "schema:Article")
          .select("subj"))
    }),

    // SPARQL ASK: satisfiable path pattern + unsatisfiable phantom
    // predicate, each under LIMIT 1 before the boolean agg (early exit)
    "kg_ask" -> ((s, dir) =>
      graft.ops.KgPublish.ask(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        closure(s), graft.ops.KgQuality.bgpRoot)),

    // SPARQL UNION + FILTER regex + MINUS: one pred-IN-filtered scan
    // (alternation idiom), map-side FILTER, MINUS = broadcast left-anti
    // on the shared-variable domain {?c} (the minus side is ontology)
    "kg_bgp_union_minus" -> ((s, dir) =>
      graft.ops.KgPublish.unionMinus(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        closure(s), graft.ops.KgQuality.bgpRoot)),

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

    // per-doc encoding-damage report: double-encoded UTF-8 + replacement
    // chars, map-only regexp counting over the damaged synthesis
    "q_mojibake" -> ((s, dir) =>
      TextOps.mojibakeReport(TextOps.withMojibake(docsTable(s, dir)))),

    // Hearst-pattern mining: all four pattern shapes extracted map-only,
    // support = distinct docs + total mentions per surface pair
    "kg_hearst_pairs" -> ((s, dir) =>
      graft.ops.Relations.hearstSupport(graft.ops.Relations.hearstPairs(
        graft.ops.Relations.withHearst(docsTable(s, dir))))),

    // Hearst pairs resolved against the dictionary (both surfaces must be
    // concept labels) → candidate is-a edges the ontology does NOT already
    // assert — the taxonomy-gap mining step of KG construction
    "kg_hearst_isa" -> ((s, dir) => {
      val pairs = graft.ops.Relations.hearstPairs(
        graft.ops.Relations.withHearst(docsTable(s, dir)))
      val dict = DictBuild.flatDict(DictBuild.build(
          DictBuild.labelRows(OntologyFixture.conceptsDf(s))))
        .select(col("term"), col("class_iri")).distinct()
      pairs
        .join(broadcast(dict.select(col("term").as("hypo_t"),
          col("class_iri").as("child_iri"))),
          upper(col("hyponym")) === col("hypo_t"))
        .join(broadcast(dict.select(col("term").as("hyper_t"),
          col("class_iri").as("parent_iri"))),
          upper(col("hypernym")) === col("hyper_t"))
        .filter(col("child_iri") =!= col("parent_iri"))
        .select("child_iri", "parent_iri").distinct()
        .join(OntologyFixture.edgesDf(s),
          Seq("child_iri", "parent_iri"), "left_anti")
    }),

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

    // entity salience features (Dunietz & Gillick 2014's first-mention +
    // frequency signals): per (doc, entity) the mention count, the 1-based
    // first-mention offset, and lead_score = 1 − (first−1)/len — the
    // ranking signal KG construction uses to pick a page's PRIMARY
    // entities. One hash agg over the match stream + a broadcast-sized
    // doc-length join; offsets are the A1 original-text offsets
    "kg_salience" -> ((s, dir) => {
      val lens = corpus(s, dir)
        .select(col("url"), length(col("text")).as("doc_len"))
      matches(s, dir).groupBy("url", "class_iri")
        .agg(count(lit(1)).as("n_mentions"), min(col("from")).as("first_pos"))
        .join(lens, "url")
        .select(col("url"), col("class_iri"), col("n_mentions"),
          col("first_pos"),
          round(lit(1.0) - (col("first_pos") - 1).cast("double") /
            col("doc_len").cast("double"), 6).as("lead_score"))
    }),

    // alias-prior table P(concept | surface) — the wikification commonness
    // prior (Medelyan/Milne & Witten): per normalized surface form, how
    // often it resolves to each concept across the corpus. ONE corpus-sized
    // hash agg (map-side partials on short surface keys) down to a
    // dictionary-sized table; the per-surface normalizer is a second agg
    // over that TINY table joined back broadcast — never a window over the
    // match stream. The artifact entity linkers ship: Disambiguate's
    // most-frequent-sense prior, exported as a first-class table.
    "kg_alias_priors" -> ((s, dir) => {
      val cnt = matches(s, dir)
        .groupBy(upper(col("text")).as("surface"), col("class_iri"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("surface").agg(sum("n").as("n_surface"))
      cnt.join(broadcast(tot), "surface")
        .select(col("surface"), col("class_iri"), col("n"),
          round(col("n").cast("double") / col("n_surface").cast("double"), 6)
            .as("prior"))
    }),

    // per-label embedding centroids (prototype vectors / drift monitor):
    // one (label, dim) hash agg after posexplode — map-side partial avgs,
    // output rows = |labels| × 64
    "sim_centroids" -> ((s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), (col("pos") + 1).as("dim"))
        .agg(round(avg(col("x").cast("double")), 6).as("mean"))),

    // ontology-coverage report: per ontology, how many of its concepts the
    // corpus actually mentions — the dictionary-health metric a KG team
    // watches across releases. Concept universe from the dict (tiny),
    // matched set from one distinct over the match stream
    "kg_coverage" -> ((s, dir) => {
      val dict = DictBuild.flatDict(DictBuild.build(
          DictBuild.labelRows(OntologyFixture.conceptsDf(s))))
        .select(col("ont"), col("class_iri")).distinct()
      val matched = matches(s, dir).select(col("class_iri")).distinct()
        .withColumn("m", lit(1))
      dict.join(matched, Seq("class_iri"), "left")
        .groupBy("ont")
        .agg(count(lit(1)).as("n_concepts"),
          sum(coalesce(col("m"), lit(0))).as("n_matched"))
        .select(col("ont"), col("n_concepts"), col("n_matched"),
          round(col("n_matched").cast("double")
            / col("n_concepts").cast("double"), 4).as("coverage"))
    }),

    // per-concept ENTITY CARD — the KG-side observability capstone (the
    // curate_ledger discipline applied to concepts): every dictionary
    // concept LEFT-joined with its corpus footprint (docs, mentions),
    // hierarchy reach, and mapping degree. Each leg aggregates to ≤ 1 row
    // per concept before the fan-in, so the join cannot explode; the only
    // corpus-scale work is the match-stream agg every ann_* query shares.
    "kg_concept_profile" -> ((s, dir) => {
      val dict = DictBuild.flatDict(DictBuild.build(
        DictBuild.labelRows(OntologyFixture.conceptsDf(s))))
      val uni = dict.groupBy("class_iri", "ont")
        .agg(count_distinct(col("term")).as("n_terms"))
      val m = matches(s, dir).groupBy("class_iri")
        .agg(count_distinct(col("url")).as("n_docs"),
          count(lit(1)).as("n_mentions"))
      val anc = closure(s).groupBy(col("child").as("class_iri"))
        .agg(count(lit(1)).as("n_ancestors"))
      val mp = OntologyFixture.mappingsDf(s).groupBy("class_iri")
        .agg(count(lit(1)).as("n_mappings"))
      uni.join(m, Seq("class_iri"), "left")
        .join(anc, Seq("class_iri"), "left")
        .join(mp, Seq("class_iri"), "left")
        .select(col("class_iri"), col("ont"), col("n_terms"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_mentions"), lit(0L)).as("n_mentions"),
          coalesce(col("n_ancestors"), lit(0L)).as("n_ancestors"),
          coalesce(col("n_mappings"), lit(0L)).as("n_mappings"))
    }),

    // CYCLE detection — the other ontology-release QA check next to
    // transitive reduction: an is-a cycle makes hierarchy expansion
    // ill-defined, so releases are gated on "closure has no (x, x) row".
    // A crafted back-edge (root → C006) closes a 3-cycle through the
    // diamond; emitted rows = the nodes on cycles with their cycle length.
    "dict_cycle_check" -> ((s, dir) => {
      import s.implicits._
      val cyc = OntologyFixture.edgesDf(s).unionByName(
        Seq(("http://fix.onto/ONT1#C000", "http://fix.onto/ONT1#C006"))
          .toDF("child_iri", "parent_iri"))
      graph.Closure.transitiveClosure(cyc, maxLevel = 5)
        .filter(col("child") === col("ancestor"))
        .select(col("child").as("class_iri"),
          col("distance").cast("int").as("cycle_len"))
    }),

    // ontology-release QA: concept-depth histogram — depth = MIN is-a
    // distance to a ROOT (a concept that is never a child), roots at 0;
    // −1 flags a concept whose every root path exceeds the closure cap
    // (a broken release). A flattening release (depths collapsing toward
    // 0) or a deepening one both move this histogram before anything else.
    // Ontology-scale only: the corpus is never touched.
    "dict_depth_histogram" -> ((s, dir) => {
      val e = OntologyFixture.edgesDf(s)
      val concepts = OntologyFixture.conceptsDf(s).select("class_iri").distinct()
      val children = e.select(col("child_iri").as("class_iri")).distinct()
        .withColumn("has_parent", lit(true))
      val roots = concepts.join(children, Seq("class_iri"), "left_anti")
      val rootDist = graph.Closure.transitiveClosure(e, maxLevel = 5)
        .join(roots.select(col("class_iri").as("ancestor")), Seq("ancestor"))
        .groupBy(col("child").as("class_iri"))
        .agg(min(col("distance")).as("d"))
      concepts.join(children, Seq("class_iri"), "left")
        .join(rootDist, Seq("class_iri"), "left")
        .select(col("class_iri"),
          when(col("has_parent").isNull, lit(0))
            .otherwise(coalesce(col("d").cast("int"), lit(-1))).as("depth"))
        .groupBy("depth").agg(count(lit(1)).as("n_concepts"))
    }),

    // TRANSITIVE REDUCTION verdicts — ontology-release hygiene: an is-a
    // edge (u, v) is REDUNDANT when some other out-edge (u, w) already
    // reaches v through the closure (the diamond shortcut a careless release
    // adds; fixture: edgesDelta's C006→C000 is implied by C006→C001→C000).
    // One broadcast edges⋈edges probe into the closure — the edge table is
    // ontology-scale; the corpus is never touched.
    "kg_transitive_reduction" -> ((s, dir) => {
      val e = OntologyFixture.edgesDf(s)
        .unionByName(OntologyFixture.edgesDeltaDf(s)).distinct()
      val cl = graph.Closure.transitiveClosure(e, maxLevel = 5)
      val viaSibling = e.select(col("child_iri"), col("parent_iri").as("w"))
        .join(cl.select(col("child").as("w"), col("ancestor")),
          Seq("w"))
        .select(col("child_iri"), col("ancestor").as("parent_iri"))
        .distinct().withColumn("red", lit(true))
      e.join(viaSibling, Seq("child_iri", "parent_iri"), "left")
        .select(col("child_iri"), col("parent_iri"),
          coalesce(col("red"), lit(false)).as("redundant"))
    }),

    // owl:sameAs identity closure — KG identity resolution: the mapping
    // edges (CUI + LOOM, both directions) form sameAs cliques across
    // ontologies; connected components over that TINY graph yield the
    // canonical representative (min IRI) every fact table can join through.
    // The entity-resolution step between mapping derivation and triple
    // canonicalization.
    "kg_sameas_closure" -> ((s, dir) =>
      graft.graph.KgGraph.connectedComponents(
          OntologyFixture.mappingsDf(s)
            .select(col("class_iri").as("src"), col("mapped_iri").as("dst")))
        .select(col("class_iri"), col("component").as("canonical_iri"))),

    // incremental closure maintenance: the ontology-release edge delta
    // (fixture edgesDelta: bridge + chained new edge + distance-improving
    // shortcut) grafted onto the precomputed v1 closure by semi-naive
    // composition — result == a cold closure rebuild over edges ∪ delta,
    // which is exactly what the oracle recomputes recursively
    "kg_closure_delta" -> ((s, dir) => {
      // v1 closure comes from the session cache (the operator's premise:
      // the old closure is PRECOMPUTED state, not work the delta pays for)
      graph.Closure.deltaClosure(OntologyFixture.edgesDf(s),
          OntologyFixture.edgesDeltaDf(s), MaxLevel, oldClosure = closure(s))
        .select(col("child").as("child_iri"), col("ancestor").as("ancestor_iri"),
          col("distance").cast("int").as("distance"))
    }),

    // open (non-taxonomic) relation extraction: verb-frame surface matches
    // resolved to concept pairs through the dictionary, support-counted —
    // the arbitrary-predicate KG edges Hearst's is-a mining cannot produce
    "kg_openre" -> ((s, dir) => {
      val rels = graft.ops.Relations.openRelations(
        graft.ops.Relations.withRelSentences(docsTable(s, dir)))
      val dict = DictBuild.flatDict(DictBuild.build(
          DictBuild.labelRows(OntologyFixture.conceptsDf(s))))
        .select(col("term"), col("class_iri")).distinct()
      rels
        .join(broadcast(dict.select(col("term").as("s_t"),
          col("class_iri").as("subj_iri"))),
          upper(col("subj_surface")) === col("s_t"))
        .join(broadcast(dict.select(col("term").as("o_t"),
          col("class_iri").as("obj_iri"))),
          upper(col("obj_surface")) === col("o_t"))
        .filter(col("subj_iri") =!= col("obj_iri"))
        .groupBy("subj_iri", "rel", "obj_iri")
        .agg(count_distinct(col("doc_id")).as("n_docs"))
    }),

    // relation schema induction: per extracted relation, the modal
    // subject/object semantic type (domain/range) with its observation
    // share — the KG-curation relation-typing pass over the openre facts
    "kg_schema_induction" -> ((s, dir) => {
      val rels = graft.ops.Relations.openRelations(
        graft.ops.Relations.withRelSentences(docsTable(s, dir)))
      val dict = DictBuild.flatDict(DictBuild.build(
          DictBuild.labelRows(OntologyFixture.conceptsDf(s))))
        .select(col("term"), col("class_iri")).distinct()
      val facts = rels
        .join(broadcast(dict.select(col("term").as("s_t"),
          col("class_iri").as("subj_iri"))),
          upper(col("subj_surface")) === col("s_t"))
        .join(broadcast(dict.select(col("term").as("o_t"),
          col("class_iri").as("obj_iri"))),
          upper(col("obj_surface")) === col("o_t"))
        .filter(col("subj_iri") =!= col("obj_iri"))
        .select("subj_iri", "rel", "obj_iri")
      val tuis = OntologyFixture.conceptsDf(s)
        .select(col("class_iri"), explode(col("tuis")).as("tui"))
      graft.ops.Relations.schemaInduction(facts, tuis)
    }),

    // unigram-distribution drift between two crawl snapshots: top-drifted
    // tokens by L1 + the corpus JSD (the training-data shift monitor)
    "text_token_drift" -> ((s, dir) =>
      graft.ops.TextOps.tokenDrift(docsTable(s, dir))),

    // filtered negative sampling over the hasAnnotation fact set — the
    // KG-embedding training-data op (deterministic hash-indexed corruption)
    "kg_negatives" -> ((s, dir) =>
      graft.ops.Relations.negatives(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj"))
          .distinct())),

    // quality-classifier distillation: full-batch logistic regression
    // trained to mimic the gopher rule gate — per-step logloss/accuracy
    // trajectory; one corpus aggregation per step, weights ride as literals
    "curate_lr_distill" -> ((s, dir) =>
      graft.ops.Classifier.lrDistill(docsTable(s, dir))),

    // distillation discrimination audit: ROC-AUC of the trained scorer vs
    // the gopher label (binned Mann–Whitney — rank pass over score BINS,
    // never a corpus-wide window; all-BIGINT until one final division)
    "curate_auc" -> ((s, dir) =>
      graft.ops.Classifier.aucReport(docsTable(s, dir))),

    // Gini coefficient of the per-source token shares — the corpus-
    // concentration scalar on the release card (0 = perfectly balanced
    // mix, →1 = one source dominates; the inequality view of what
    // curate_mix_weights then corrects): G = ΣΣ|x_i − x_j| / (2n·Σx),
    // exact BIGINT |diffs| over the sources²-sized pair frame (20×20
    // here — sources are an enum, never rows), ONE pinned division
    "curate_gini" -> ((s, dir) => {
      val per = docsTable(s, dir).groupBy("source")
        .agg(sum(size(TextOps.tokens(col("text"))).cast("long")).as("x"))
        .localCheckpoint()
      val pairs = per.select(col("x").as("xa"))
        .crossJoin(per.select(col("x").as("xb")))
      val diff = pairs.agg(sum(abs(col("xa") - col("xb"))).as("d"))
      val tot = per.agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
      diff.crossJoin(tot)
        .select(col("n").as("n_sources"), col("t").as("n_tokens"),
          round(col("d").cast("double") /
            (lit(2.0) * col("n") * col("t")), 6).as("gini"))
    }),

    // Brier score — the probability-quality leg of the classifier triad
    // (loss: fit, AUC: ordering, Brier: the p a weighted sampler uses);
    // folded over the AUC score bins, never per-doc
    "curate_brier" -> ((s, dir) =>
      graft.ops.Classifier.brierReport(docsTable(s, dir))),

    // THE NORTH-RULE GATE AS DATA: per-predicate precision/recall of the
    // engine's triples (automaton scan + distributed expansions) against an
    // INDEPENDENT in-Spark reference-semantics derivation (naive per-term
    // \b-regex scan over a broadcast dictionary + closure/mapping joins —
    // the mgrep word-boundary contract, no shared matcher code). Expected
    // 1.0/1.0 everywhere; a boundary/normalization/longest-match divergence
    // surfaces here as a sub-1 row in the driver's own correctness file.
    // The regex side is deliberately the naive quadratic scan: it is the
    // verification surface, not the production path.
    "ann_pr_gate" -> ((s, dir) => {
      val engine = graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select("subj", "pred", "obj").distinct()
      val dictDf = {
        import s.implicits._
        OntologyFixture.dictRows().map(t => (t.term, t.classIri))
          .distinct.toDF("term", "class_iri")
      }
      val refD = docsTable(s, dir)
        .select(concat(lit("doc://"), col("doc_id")).as("subj"), col("text"))
        .join(broadcast(dictDf),
          expr("upper(text) RLIKE concat('\\\\b', term, '\\\\b')"))
        .select(col("subj"), col("class_iri")).distinct()
      val refTrip = refD
        .select(col("subj"), lit(graft.Pred.Direct).as("pred"),
          col("class_iri").as("obj"))
        .unionByName(refD.join(broadcast(closure(s)),
            refD("class_iri") === col("child"))
          .select(col("subj"), lit(graft.Pred.Expanded).as("pred"),
            col("ancestor").as("obj")))
        .unionByName(refD.join(broadcast(OntologyFixture.mappingsDf(s)),
            Seq("class_iri"))
          .select(col("subj"), lit(graft.Pred.Mapped).as("pred"),
            col("mapped_iri").as("obj")))
        .distinct()
      engine.withColumn("e", lit(1))
        .join(refTrip.withColumn("r", lit(1)),
          Seq("subj", "pred", "obj"), "full_outer")
        .groupBy("pred")
        .agg(sum(coalesce(col("e"), lit(0))).cast("long").as("n_engine"),
          sum(coalesce(col("r"), lit(0))).cast("long").as("n_ref"),
          sum(when(col("e").isNotNull && col("r").isNotNull, lit(1))
            .otherwise(lit(0))).cast("long").as("tp"))
        .select(col("pred"), col("n_engine"), col("n_ref"), col("tp"),
          round(col("tp").cast("double") / col("n_engine"), 6).as("precision"),
          round(col("tp").cast("double") / col("n_ref"), 6).as("recall"))
    }),

    // one full-batch TransE gradient step over the hasAnnotation fact set:
    // hash-init embeddings, margin loss vs the filtered negatives, gradient
    // as keyed aggs, SGD update, re-eval — loss_after < loss_before is the
    // "it learns" gate (asserted in KgGraphSpec)
    "kg_transe_step" -> ((s, dir) =>
      graft.ops.KgEmbed.transeStep(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")))),

    // link-prediction ranking eval at the deterministic init (filtered
    // local-candidate protocol): per-pred MRR + hits@1 — the KG-embedding
    // QA gate next to the training step
    "kg_transe_rank" -> ((s, dir) =>
      graft.ops.KgEmbed.transeRank(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")))),

    // the init ranking eval over TYPE-CONSTRAINED corruptions (Krompaß
    // ISWC'15 — same-semantic-type negatives are the HARD ones): read
    // against kg_transe_rank to decompose how much of the score is mere
    // type discrimination
    "kg_transe_rank_typed" -> ((s, dir) =>
      graft.ops.KgEmbed.transeRankTyped(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")),
        OntologyFixture.conceptsDf(s).select(col("class_iri").as("obj"),
          explode(col("tuis")).as("tui")))),

    // the same ranking eval AFTER 2 training epochs: mrr/hits@1 must beat
    // the init reading — the train→eval loop closed as driver-visible data
    "kg_transe_rank_trained" -> ((s, dir) =>
      graft.ops.KgEmbed.transeRank(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")),
        epochs = 2)),

    // DistMult ranking eval at the same init/negatives/protocol: the
    // diagonal-bilinear scorer (higher = better, ties against) swapped in
    // behind the shared eval machinery — the scorer-seam demonstration
    // next to the additive TransE reading
    "kg_distmult_rank" -> ((s, dir) =>
      graft.ops.KgEmbed.distmultRank(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")))),

    // ComplEx ranking eval — the complex-bilinear scorer (Trouillon 2016)
    // that fixes DistMult's (h,t) symmetry, completing the standard scorer
    // trio behind the one shared negatives/init/ranking seam; the Dim-wide
    // embedding packs Dim/2 complex dims (first half re, second half im)
    "kg_complex_rank" -> ((s, dir) =>
      graft.ops.KgEmbed.complexRank(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")))),

    // RotatE ranking eval — relations as unit-modulus complex ROTATIONS
    // (Sun 2019), via the rational Weierstrass form (transcendental-free:
    // bit-exact cross-engine); completes the scorer quartet on the seam
    "kg_rotate_rank" -> ((s, dir) =>
      graft.ops.KgEmbed.rotateRank(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")))),

    // the TRAINING LOOP: 2 degree-normalized full-batch epochs, per-epoch
    // mean-loss trajectory (epoch 0 = hash init) — each epoch's embedding
    // table pinned so plan depth is constant in epochs
    "kg_transe_epochs" -> ((s, dir) =>
      graft.ops.KgEmbed.transeEpochs(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")),
        epochs = 2)),

    // the trained artifact USED: each concept's 3 nearest neighbors in the
    // 2-epoch embedding space (exact retrieval — the ontology-scale concept
    // table broadcasts against itself; beyond ~10^6 vocab the bucketed ANN
    // tier takes over)
    "kg_embed_neighbors" -> ((s, dir) =>
      graft.ops.KgEmbed.conceptNeighbors(
        matches(s, dir).select(col("url").as("subj"),
          lit("hasAnnotation").as("pred"), col("class_iri").as("obj")),
        epochs = 2, k = 3)),

    // dict-release fact churn: the (subj, pred, obj) diff between ontology
    // versions v1 → v2 — the per-release maintenance view of the KG. v2
    // comes via the shared incrementalV1V2 path (proven == full recompute
    // by ann_incremental), so this also end-to-end-exercises the
    // production update flow. v1 is pinned in the helper; v2 pinned here
    // (both diff legs read it). The diff itself is the crawlDiff shape:
    // set EXCEPTs on short triple keys.
    "kg_fact_diff" -> ((s, dir) => {
      val (v1T, v2T) = incrementalV1V2(s, dir)
      val v1 = v1T.select("subj", "pred", "obj")
      val v2 = v2T.select("subj", "pred", "obj").localCheckpoint()
      v1.except(v2).withColumn("delta", lit("removed"))
        .unionAll(v2.except(v1).withColumn("delta", lit("added")))
    }),

    // Knowledge Vault-style fact fusion: the SAME (page, concept) fact from
    // three independent extractors — page-text annotation, lemmatized
    // annotation, incoming anchor-text linking — noisy-OR'd over the
    // per-extractor precision priors (Relations.ExtractorPriors is the
    // single source shared with the oracle literals)
    "kg_triple_confidence" -> ((s, dir) =>
      graft.ops.Relations.tripleConfidence(extractionEvidence(s, dir))),

    // functional-property truth discovery over the same 3-extractor evidence:
    // one winning concept per page + the winner-vs-runner-up margin — the
    // "send contested pages to review" curation signal (Knowledge Vault shape)
    "kg_fact_fusion" -> ((s, dir) =>
      graft.ops.Relations.factFusion(extractionEvidence(s, dir))),

    // fusion-vs-published audit: fused candidate facts bucketed by decile
    // confidence vs membership in the published KG (the direct extractor's
    // canonical set) — the triage view for promoting high-confidence
    // UNPUBLISHED facts; explicitly not a calibration curve (no external
    // truth exists in-sandbox; the in-KG rate is partly tautological)
    "kg_fusion_audit" -> ((s, dir) => {
      val ev = extractionEvidence(s, dir)
      graft.ops.Relations.fusionAudit(ev,
        ev.filter(col("extractor") === "direct"))
    }),

    // TruthFinder-style iterative source reliability (Yin, Han & Yu 2008):
    // per-extractor trust LEARNED from claim overlap via the trust <->
    // confidence mutual recursion (2 rounds, exact micro-unit arithmetic)
    // instead of the hand-set ExtractorPriors — the prior-free complement
    // of kg_triple_confidence. Corpus-scale work is ONE fact-flag agg;
    // rounds iterate on the <= 7-row source-set signature table, so
    // per-round cost is independent of corpus size
    "kg_truthfinder" -> ((s, dir) =>
      graft.ops.Relations.truthFinder(extractionEvidence(s, dir))),

    // the learned per-extractor trust table + claim counts — the release
    // sanity check against the hand-set priors (does the iteration rank
    // direct > lemma > anchor the way the priors assumed?)
    "kg_source_trust" -> ((s, dir) =>
      graft.ops.Relations.truthFinderTrust(extractionEvidence(s, dir))),

    // ---- KG publication tier (round-4 fourth continuation) -------------

    // SPARQL CONSTRUCT over the star BGP: solutions of the kg_bgp_star
    // pattern projected through the template { ?c coMentionedWith ?m } —
    // the graph-to-graph step that MINTS new triples from matched patterns;
    // CONSTRUCT's set semantics make the final DISTINCT part of the spec
    "kg_construct_rule" -> ((s, dir) =>
      graft.ops.KgPublish.construct(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        closure(s).filter(col("ancestor") === graft.ops.KgQuality.bgpRoot)
          .select(col("child").as("c")))),

    // SPARQL property path (hasAnnotation|hasMappedAnnotation)/subClassOf*
    // to the bgpRoot: alternation = one IN-filtered scan, subClassOf* =
    // broadcast {root} ∪ descendants semi-join — path evaluation folded
    // into one pruned scan, never an iterative corpus expansion
    "kg_path_query" -> ((s, dir) =>
      graft.ops.KgPublish.pathQuery(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        closure(s), graft.ops.KgQuality.bgpRoot)),

    // HDT-style dictionary-encoded store: shared term dictionary (dense
    // deterministic ids, the D6 two-pass form), triples as three ints +
    // the decoded terms in the same frame — the publication layout whose
    // downstream shuffles move 8-byte ints, not 20–80-byte IRIs
    "kg_encoded_store" -> ((s, dir) =>
      graft.ops.KgPublish.encodeTriples(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"))),

    // W3C VoID dataset descriptor: dataset-level + per-predicate partition
    // counts emitted AS RDF rows — the standard dataset card published
    // next to the dump
    "kg_void_stats" -> ((s, dir) =>
      graft.ops.KgPublish.voidStats(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        "http://graft.kg/dataset#v1")),

    // PROV-O provenance bundle: crawl-batch named graphs as prov:Entity
    // with wasGeneratedBy/used/tripleCount — the deterministic twin of the
    // pipeline's per-partition lineage rows, recomputable by the oracle
    "kg_prov_bundle" -> ((s, dir) =>
      graft.ops.KgPublish.provBundle(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        "v1")),

    // RDF statement reification: each fact becomes a content-addressed
    // statement node carrying rdf:subject/predicate/object + a dictionary-
    // snapshot derivation qualifier — the per-STATEMENT qualifier carrier
    // next to kg_prov_bundle's batch-level lineage; map-only 5-way explode
    "kg_reify" -> ((s, dir) =>
      graft.ops.KgPublish.reify(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        "v1")),

    // OWL-Horst (pD*) entailment subset: rdfp8 inverseOf over the direct
    // leg (map-only on the corpus slice), rdfp3 symmetric mappings and
    // rdfp4 transitive subClassOf from the ontology-scale sides, each row
    // tagged with its rule
    "kg_owl_horst" -> ((s, dir) =>
      graft.ops.KgPublish.owlHorst(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        OntologyFixture.mappingsDf(s), closure(s))),

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

    // Lee et al. ExactSubstr at token granularity: duplicated k-token
    // windows (non-first occurrence corpus-wide) mark positions for
    // removal; overlapping spans merge; hashed window keys, text-free
    // exchanges (the chunkDedup argument)
    "text_span_dedup" -> ((s, dir) =>
      Dedup.spanDedup(docsTable(s, dir), k = 5)),

    // collective entity-linking disambiguation: ambiguous surfaces (LOOM
    // labels living in two ontologies) resolved by co-occurrence votes
    // from the doc's unambiguous annotations; most-frequent-sense prior,
    // then class_iri, break ties
    "ann_disambiguate" -> ((s, dir) =>
      graft.annotate.Disambiguate.collective(matches(s, dir))),

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
      graft.ops.KgEmbed.sgnsStep(queries("web_walk_pairs")(s, dir))),

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
      val edges = LinkGraph.pageEdges(
        LinkGraph.links(LinkGraph.pages(docsTable(s, dir))))
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

    // corpus-trained bigram LM fluency score (add-k smoothed mean NLL)
    "text_ngram_lm" -> ((s, dir) => TextOps.ngramLmScore(docsTable(s, dir))),

    // per-domain page quota: ≤50 pages per canonical host, selected by
    // portable hash of the canonical URL (unbiased + cross-engine stable)
    "web_domain_quota" -> ((s, dir) =>
      WebOps.domainQuota(docsTable(s, dir), quota = 50)),

    // same contract, mega-host-safe plan: count → hash-threshold prefilter
    // → broadcast underflow fallback → exact window top-up over survivors;
    // ONE oracle proves both forms equal
    "web_domain_quota2" -> ((s, dir) =>
      WebOps.domainQuotaTwoPhase(docsTable(s, dir), quota = 50)),

    // near-dup CLUSTERS: connected components (large-star/small-star) over
    // the MinHash+LSH pair set, cluster label = min doc_id — the step that
    // turns pairwise dup detection into per-cluster canonical selection
    "dedup_cluster" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(
        docsTable(s, dir), n = 3, k = 16, bands = 4, threshold = 0.8)
      graft.graph.KgGraph.connectedComponents(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .select(col("class_iri").as("doc_id"), col("component").as("cluster"))
    }),

    // canonical-doc SELECTION per near-dup cluster — production keeps the
    // BEST-quality member, not the min id: one argmax `max(struct(quality,
    // −doc_id))` per cluster (map-side partials; ties → smaller id), member
    // count rides the same agg. Clusters and quality are the two audited
    // legs (dedup_cluster, text_quality) composed.
    "dedup_canonical" -> ((s, dir) => {
      val docs = docsTable(s, dir)
      val pairs = Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 4,
        threshold = 0.8)
      val clusters = graft.graph.KgGraph.connectedComponents(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .select(col("class_iri").as("doc_id"), col("component").as("cluster"))
      clusters.join(TextOps.qualityScore(docs), "doc_id")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("quality"), (-col("doc_id")).as("negid"))).as("k"))
        .select(col("cluster"), (-col("k.negid")).as("canonical_id"),
          col("k.quality").as("quality"), col("n_members"))
    }),

    // ---- KG-release QA + provenance IO (round-4 continuation) ----------

    // SHACL-lite validation report over the constructed KG: sh:maxCount
    // (hub pages over the direct-annotation cap), sh:minCount (documents
    // with no cross-ontology mapped annotation), plus two checked NEGATIVE
    // controls (sh:class dangling expanded objects, sh:pattern subject
    // IRIs) — the shape gate an ontology-release pipeline runs before
    // publishing a triple batch
    "kg_shacl_report" -> ((s, dir) =>
      graft.ops.KgQuality.shaclReport(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        OntologyFixture.conceptsDf(s).select("class_iri"))),

    // RDFS entailment materialization: rdfs2/rdfs3 domain-range typing of
    // every triple's endpoints + rdfs9 subclass lift through a two-level
    // type schema — the typed A-Box KG consumers filter on
    "kg_rdfs_types" -> ((s, dir) =>
      graft.ops.KgQuality.rdfsTypes(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"))),

    // SPARQL basic graph pattern over the triple store:
    //   ?d hasAnnotation ?c . ?d hasMappedAnnotation ?m . ?c rdfs:subClassOf+ C001
    // — the star-join a KG query engine answers: the closure-derived
    // descendant set broadcasts (ontology-scale), the triple table
    // self-joins on subj (its sink partition key)
    "kg_bgp_star" -> ((s, dir) => {
      val t = graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select("subj", "pred", "obj")
      val directLeg = t.filter(col("pred") === graft.Pred.Direct)
        .select(col("subj").as("d"), col("obj").as("c"))
      val mappedLeg = t.filter(col("pred") === graft.Pred.Mapped)
        .select(col("subj").as("d"), col("obj").as("m"))
      val desc = closure(s).filter(col("ancestor") === graft.ops.KgQuality.bgpRoot)
        .select(col("child").as("c"))
      directLeg.join(broadcast(desc), "c").join(mappedLeg, "d")
        .select("d", "c", "m").distinct()
    }),

    // SPARQL OPTIONAL over the same star pattern: the mapped-annotation leg
    // becomes a LEFT join (SPARQL's defining left-join semantics — rows
    // survive with m = NULL when the optional pattern has no solution),
    // same broadcast descendant-set pushdown as kg_bgp_star
    "kg_bgp_optional" -> ((s, dir) => {
      val t = graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select("subj", "pred", "obj")
      val directLeg = t.filter(col("pred") === graft.Pred.Direct)
        .select(col("subj").as("d"), col("obj").as("c"))
      val mappedLeg = t.filter(col("pred") === graft.Pred.Mapped)
        .select(col("subj").as("d"), col("obj").as("m"))
      val desc = closure(s).filter(col("ancestor") === graft.ops.KgQuality.bgpRoot)
        .select(col("child").as("c"))
      directLeg.join(broadcast(desc), "c").join(mappedLeg, Seq("d"), "left")
        .select("d", "c", "m").distinct()
    }),

    // restricted-Turtle round trip: prefix-compressed, predicate/object
    // lists, one subject group per line (line-splittable by construction) —
    // the ontology-tooling serialization next to NT/NQ; STRICT prefix audit
    "io_ttl_roundtrip" -> ((s, dir) => {
      val trip = graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select(col("subj"),
          concat(lit("http://graft.kg/p#"), col("pred")).as("pred"),
          col("obj"))
      val out = s"/tmp/graft-ttl-${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName
      graft.io.Turtle.write(trip, out)
      graft.io.Turtle.statements(s.read.textFile(out))
        .select("subj", "pred", "obj")
    }),

    // N-Quads named-graph round trip: triples + a crawl-batch provenance
    // graph IRI (doc_id % 4 — the batch a subject arrived in), serialized
    // as N-Quads lines, written as splittable text, read back and
    // STRICT-parsed — the provenance-preserving interchange dump next to
    // N-Triples/JSONL/ORC/WARC
    "io_nquads_roundtrip" -> ((s, dir) => {
      val quads = graft.annotate.NativeAnnotate
        .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
        .select(col("subj"),
          concat(lit("http://graft.kg/p#"), col("pred")).as("pred"),
          col("obj"),
          concat(lit("http://graft.kg/g#batch"),
            (regexp_extract(col("subj"), "[0-9]+$", 0).cast("bigint") % 4)
              .cast("string")).as("graph"))
      val out = s"/tmp/graft-nquads-${s.sparkContext.applicationId}/" +
        new java.io.File(dir).getName
      graft.io.NTriples.quadLines(quads).write.mode("overwrite").text(out)
      graft.io.NTriples.quadStatements(s.read.textFile(out))
        .select("subj", "pred", "obj", "graph")
    }),

    // hreflang alternate clusters: the page-DECLARED language-variant
    // grouping (one logical document, N language editions) — extraction is
    // map-only, the cluster key needs exactly one per-page window
    "web_hreflang_clusters" -> ((s, dir) =>
      LinkGraph.hreflangClusters(
        LinkGraph.withHreflangLinks(LinkGraph.pages(docsTable(s, dir))))),

    // AMIE-style chain-rule mining over the KB (triples ∪ subClassOf ∪
    // mappedTo): support / head coverage / std + PCA confidence per
    // (p1, p2 ⇒ head) — the pipeline's own expansion semantics must
    // re-emerge as confidence-1.0 rules (asserted in KgQualitySpec)
    "kg_rule_mine" -> ((s, dir) =>
      graft.ops.RuleMine.mineRules(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        OntologyFixture.edgesDf(s), OntologyFixture.mappingsDf(s))),

    // KB completion from the mined rules: instantiate every rule with
    // pca_conf ≥ the floor over the same body pairs, anti-join out facts
    // already in the KB — the expansions the pipeline does NOT perform
    // (ancestors of mapped concepts) surface here as ranked candidates
    "kg_rule_infer" -> ((s, dir) =>
      graft.ops.RuleMine.inferTriples(
        graft.annotate.NativeAnnotate
          .annotateTriples(corpus(s, dir), model(s), fusedMaps(s), "v1")
          .select("subj", "pred", "obj"),
        OntologyFixture.edgesDf(s), OntologyFixture.mappingsDf(s))),

    // Flesch reading-ease + FK grade (vowel-group syllable heuristic,
    // synthetic sentence length 5 + doc_id % 5) — map-only, zero shuffles
    "text_readability" -> ((s, dir) => TextOps.readability(docsTable(s, dir))),

    // domain-mixture α=0.5 sampling weights + effective epochs at the
    // shared token budget — one tiny agg + broadcast scalar total
    "curate_mix_weights" -> ((s, dir) => TextOps.mixWeights(docsTable(s, dir))),

    // materialize the mixture: 100-doc sample apportioned per source by
    // largest remainder over the τ-weights (Σ quotas = 100 exactly),
    // hash-rank selection within source (the domainQuota discipline)
    "curate_mix_sample" -> ((s, dir) => TextOps.mixSample(docsTable(s, dir))),

    // typed-literal facts: ISO dates + unit quantities → xsd-typed triple
    // rows (injected-literal synthesis, 3/4 of docs negative controls)
    "kg_literals" -> ((s, dir) =>
      graft.ops.Relations.literalFacts(
        graft.ops.Relations.withLiterals(docsTable(s, dir)))),

    // Schwartz–Hearst abbreviation definitions: first-letter-rule
    // validation, false-positive spans kept with valid = false
    "ann_abbrev" -> ((s, dir) =>
      graft.ops.Relations.abbrevDefs(
        graft.ops.Relations.withAbbrevs(docsTable(s, dir))))
  )

  /** Registry with a LOUD duplicate-name gate. `Map(...)` varargs silently
    * keep only the last entry per key — that bit once in round 4 (a
    * duplicate `io_jsonl_roundtrip` key shrank the surface and only the
    * dump count exposed it), so the Seq→Map conversion now fails fast. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dups = queriesSeq.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty, s"duplicate query names in registry: ${dups.mkString(", ")}")
    queriesSeq.toMap
  }

  // ---- oracle SQL -------------------------------------------------------

  /** DuckDB twin of [[graft.ops.TextOps.qualityScore]] — ONE source for
    * every oracle's quality leg. Exact-rational half-up 4dp in BIGINT
    * (`//` is DuckDB integer division): the former float-ROUND form
    * disagreed with the engine on scores landing EXACTLY on a .xxxx5
    * boundary (three sf0.1 docs). References the bare `text` column of the
    * enclosing FROM table. */
  private val quality4ExprSql: String =
    """((10000 * (4 * LEAST(len(string_split(text, ' ')), 100)
            * len(string_split(text, ' '))
          + 300 * len(list_distinct(string_split(text, ' ')))
          + 300 * (len(string_split(text, ' '))
              - len(list_filter(string_split(text, ' '),
                  x -> x IN ('the', 'a')))))
          + 500 * len(string_split(text, ' ')))
        // (1000 * len(string_split(text, ' '))))"""

  private val qualityExprSql: String =
    s"(CAST($quality4ExprSql AS DOUBLE) / 10000.0)"

  private def dictCte =
    s"dict(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValues}) v(a,b,c,d))"
  /** v2 dictionary under the SAME CTE name, so `directCte` composes with
    * either version (the incremental oracle is a full v2 recomputation). */
  private def dictV2Cte =
    s"dict(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValuesV2}) v(a,b,c,d))"
  private def edgesCte =
    s"edges(child_iri, parent_iri) AS (SELECT * FROM (VALUES ${OntologyFixture.edgesValues}) v(a,b))"
  private def mappingsCte =
    s"maps(class_iri, mapped_iri, kind) AS (SELECT * FROM (VALUES ${OntologyFixture.mappingsValues}) v(a,b,c))"
  private def resolutionCte =
    s"res(class_iri, preferred_iri) AS (SELECT * FROM (VALUES ${OntologyFixture.cuiResolutionValues}) v(a,b))"
  private val directCte =
    raw"""direct AS (SELECT DISTINCT 'doc://' || doc_id AS url, d.class_iri, d.ont,
          CASE WHEN d.pref THEN 'PREF' ELSE 'SYN' END AS match_type
          FROM documents, dict d
          WHERE regexp_matches(upper(text), '\b' || d.term || '\b'))"""
  /** MinHash+LSH pipeline CTEs (signatures → banding → bucket cap →
    * candidates → exact shingle intersection + sizes) — shared by the
    * dedup_minhash oracle (jaccard select) and the dedup_cluster oracle
    * (recursive components over the thresholded pair set). */
  private def minhashCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
          pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
          sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
          hh AS (SELECT doc_id,
                   ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 576460752303423433 AS h1,
                   ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 576460752303423433 AS h2
                 FROM sh),
          hs AS (SELECT doc_id, i AS hi,
                   MIN((h1 + i * h2) % 576460752303423433) AS mh
                 FROM hh, (SELECT unnest(range(16)) AS i) GROUP BY doc_id, hi),
          sig AS (SELECT doc_id, array_agg(CAST(mh AS VARCHAR) ORDER BY hi) AS mhs
                  FROM hs GROUP BY doc_id),
          bands AS (SELECT doc_id, b,
                      array_to_string(mhs[b*4+1 : b*4+4], '|') AS bucket
                    FROM sig, (SELECT unnest(range(4)) AS b)),
          pop AS (SELECT b, bucket, COUNT(*) AS n FROM bands GROUP BY b, bucket),
          cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                   FROM bands l
                   JOIN bands r ON l.b = r.b AND l.bucket = r.bucket
                     AND l.doc_id < r.doc_id
                   JOIN pop p ON p.b = l.b AND p.bucket = l.bucket AND p.n <= 1000),
          inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                    FROM sh a
                    JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
                    GROUP BY 1, 2),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)"""

  /** ONE unrolled directed-PR round generator shared by ALL directed-
    * PageRank-family oracles (uniform, personalized, and both TrustRank
    * chains) — the `directedPrCore` twin: per round the dangling scalar
    * (rank mass on out-edge-less nodes, via anti-join on `ow`) and the
    * contribution agg over `ew`, then pr = (1−d)·t + d·(contrib + dm·t)
    * with the teleport column `t` read from `tnodes` (uniform 1/n or the
    * seed vector — the SAME abstraction the engine uses, so the arithmetic
    * shape is engine-identical in every variant). Rank CTEs MATERIALIZED —
    * each is referenced twice per round (dangling + contributions), which
    * plain-CTE inlining would expand 2^iters-fold. Callers provide the
    * `ow`/`ew` scaffolding and a `$prefix0` base CTE. */
  private def prRoundsCtesSql(iters: Int, prefix: String, tnodes: String,
                              ow: String = "ow", ew: String = "ew"): String =
    (1 to iters).map { i =>
      s"""dang$prefix$i AS (SELECT COALESCE(SUM(x.pr), CAST(0 AS DOUBLE)) AS dm
            FROM $prefix${i - 1} x LEFT JOIN $ow o ON o.a = x.node
            WHERE o.a IS NULL),
          ctr$prefix$i AS (SELECT e.b AS node, SUM(x.pr * e.w / e.s) AS c
            FROM $ew e JOIN $prefix${i - 1} x ON x.node = e.a GROUP BY e.b),
          $prefix$i AS MATERIALIZED (SELECT n.node,
              CAST(0.15 AS DOUBLE) * n.t
                + CAST(0.85 AS DOUBLE) * (COALESCE(c.c, CAST(0 AS DOUBLE))
                    + (SELECT dm FROM dang$prefix$i) * n.t) AS pr
            FROM $tnodes n LEFT JOIN ctr$prefix$i c ON c.node = n.node)"""
    }.mkString(",\n")

  /** Shared page-level PR scaffolding: link edges aggregated to
    * (a, b, w), out-weights, edge+strength, and the node universe. */
  private def pageEdgesPrScaffoldSql: String =
    s"""${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS a,
            dst_url AS b, CAST(COUNT(*) AS DOUBLE) AS w
          FROM lnk GROUP BY 1, 2),
        ow AS MATERIALIZED (SELECT a, SUM(w) AS s FROM edges GROUP BY a),
        ew AS MATERIALIZED (SELECT e.a, e.b, e.w, o.s
          FROM edges e JOIN ow o USING (a)),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges))"""

  /** The HLL estimator as SQL over folded-register columns `n`/`s` —
    * raw harmonic form + the linear-counting branch, the
    * [[graft.ops.Sketch.hllDistinct]] constants (shared by the sketch_hll
    * and sketch_hll_overlap oracles). */
  private def hllEstCaseSql(n: String, s: String): String = {
    import graft.ops.Sketch.{HllM, HllRawNum, HllScale}
    s"""CASE WHEN $HllRawNum / CAST($s + ($HllM - $n) * $HllScale AS DOUBLE)
              <= ${2.5 * HllM} AND $n < $HllM
         THEN ${HllM.toDouble} * ln(${HllM.toDouble}
                / CAST($HllM - $n AS DOUBLE))
         ELSE $HllRawNum / CAST($s + ($HllM - $n) * $HllScale AS DOUBLE)
         END"""
  }

  /** Unrolled h-index-coreness oracle ([[graft.graph.KgGraph.coreness]]
    * twin over the page graph): canonical least/greatest undirected
    * edges, c0 = degree, `iters` rounds of the `MAX(LEAST(rn, cv))`
    * H-index identity — the engine's exact-convergence `require` licenses
    * the fixed unroll (post-convergence rounds are no-ops). */
  private def corenessOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""nb$r AS (SELECT u.node, c.c AS cv
            FROM und u JOIN c${r - 1} c ON c.node = u.nbr),
          c$r AS MATERIALIZED (SELECT node, MAX(LEAST(rn, cv)) AS c FROM
            (SELECT node, cv,
               CAST(ROW_NUMBER() OVER (PARTITION BY node ORDER BY cv DESC)
                 AS BIGINT) AS rn
             FROM nb$r) z
            GROUP BY 1)"""
    }.mkString(",\n")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        pe AS (SELECT DISTINCT
                 ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                 dst_url AS dst FROM lnk),
        ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                GREATEST(src, dst) AS b FROM pe WHERE src <> dst),
        und AS MATERIALIZED (SELECT a AS node, b AS nbr FROM ce
               UNION ALL SELECT b AS node, a AS nbr FROM ce),
        c0 AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c
               FROM und GROUP BY 1),
        $rounds
        SELECT node AS page, c AS coreness FROM c$iters"""
  }

  /** Unrolled DIRECTED-PageRank oracle ([[graft.graph.KgGraph
    * .pageRankDirected]] twin over [[graft.ops.LinkGraph]] page edges):
    * [[prRoundsCtesSql]] rounds with the uniform teleport column. */
  private def pageRankDirectedOracleSql(iters: Int): String =
    s"""WITH $pageEdgesPrScaffoldSql,
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        unodes AS MATERIALIZED (SELECT node,
            CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
        pr0 AS (SELECT node, t AS pr FROM unodes),
        ${prRoundsCtesSql(iters, "pr", "unodes")}
        SELECT node AS page, ROUND(pr, 6) AS pagerank FROM pr$iters"""

  /** Unrolled deterministic-walk oracle ([[graft.graph.KgGraph
    * .randomWalks]] twin over page edges): sorted adjacency lists, step t
    * indexes `hash60(start|t|node) % deg` — the portable md5 hash verbatim;
    * frontier CTEs MATERIALIZED (each feeds the next step AND the union). */
  private def walksOracleSql(length: Int): String = {
    val steps = (1 to length).map { t =>
      s"""w$t AS MATERIALIZED (SELECT w.start, $t AS step,
            a.nbrs[CAST(('0x' || substr(md5(w.start || '|' || $t || '|'
                || w.node), 1, 15))::BIGINT % len(a.nbrs) + 1 AS INT)] AS node
          FROM w${t - 1} w JOIN adj a ON a.src = w.node)"""
    }.mkString(",\n")
    val union = (0 to length).map(t => s"SELECT * FROM w$t")
      .mkString(" UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        pedges AS (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
            dst_url AS dst FROM lnk),
        adj AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS nbrs
          FROM pedges GROUP BY src HAVING COUNT(*) <= 10000),
        w0 AS (SELECT src AS start, 0 AS step, src AS node FROM adj),
        $steps
        $union"""
  }

  /** web_node2vec oracle ([[graft.graph.KgGraph.node2vecWalks]] twin):
    * step 1 is the DeepWalk hash-mod pick; each later step unnests the
    * current node's neighbor list WITH ORDINALITY, weighs candidates by
    * the shared CASE (prev / in-N(prev) / out), and keeps the single row
    * whose cumulative-weight interval contains the hash draw — exact
    * BIGINT cumsums over ≤ maxDegree rows per walk. */
  private def node2vecOracleSql(length: Int): String = {
    import graft.graph.KgGraph.{N2vWBase, N2vWOut, N2vWReturn}
    val steps = (2 to length).map { t =>
      s"""c$t AS (SELECT w.start, w.node, w.prev, a.nbrs, pa.nbrs AS pnbrs,
              ('0x' || substr(md5(w.start || '|' || $t || '|' || w.prev
                || '|' || w.node), 1, 15))::BIGINT AS h
            FROM n$t w JOIN adj a ON a.src = w.node
            JOIN adj pa ON pa.src = w.prev),
          e$t AS (SELECT start, node, prev, h, nbrs, pnbrs,
              unnest(generate_series(1, len(nbrs))) AS i FROM c$t),
          x$t AS (SELECT start, node, prev, h, i, nbrs[i] AS x,
              CASE WHEN nbrs[i] = prev THEN $N2vWReturn
                   WHEN list_contains(pnbrs, nbrs[i]) THEN $N2vWBase
                   ELSE $N2vWOut END AS wt
            FROM e$t),
          k$t AS (SELECT *,
              SUM(wt) OVER (PARTITION BY start ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              SUM(wt) OVER (PARTITION BY start) AS tot
            FROM x$t),
          n${t + 1} AS MATERIALIZED (SELECT start, node AS prev, x AS node
            FROM k$t WHERE cum - wt <= h % tot AND h % tot < cum)"""
    }.mkString(",\n")
    val union = (0 to length).map(t =>
      s"SELECT start, $t AS step, node FROM n${t + 1}").mkString(" UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        pedges AS (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
            dst_url AS dst FROM lnk),
        adj AS MATERIALIZED (SELECT src, list(dst ORDER BY dst) AS nbrs
          FROM pedges GROUP BY src HAVING COUNT(*) <= 10000),
        n1 AS (SELECT src AS start, CAST(NULL AS VARCHAR) AS prev,
               src AS node FROM adj),
        n2 AS MATERIALIZED (SELECT w.start, w.node AS prev,
            a.nbrs[CAST(('0x' || substr(md5(w.start || '|' || 1 || '|'
                || w.node), 1, 15))::BIGINT % len(a.nbrs) + 1 AS INT)] AS node
          FROM n1 w JOIN adj a ON a.src = w.node),
        $steps
        $union"""
  }

  /** web_sgns_step oracle ([[graft.ops.KgEmbed.sgnsStep]] twin): the walk
    * pairs rebuilt, the context-side corruption chain (hash-index pick,
    * self/true-pair drop), bit-identical `w:`/`c:` md5 inits in long
    * format, ROUND(6) dots, σ terms as the same single divisions, mean
    * gradients, SGD update, rescore — then the per-center softplus loss
    * rollup before/after. */
  private def sgnsStepOracleSql: String = materializeCtes {
    val dim = graft.ops.KgEmbed.Dim
    val negK = graft.ops.KgEmbed.NegK
    val lr = graft.ops.KgEmbed.Lr
    val two60 = "1152921504606846976.0"
    def init(prefix: String, idExpr: String) =
      s"('0x' || substr(md5('$prefix' || $idExpr || ':' ||" +
        s" CAST(dd.d AS VARCHAR)), 1, 15))::BIGINT / $two60 * 2 - 1"
    def pdSql(name: String, we: String, ce: String) =
      s"""$name AS (SELECT n.center, n.context, n.slot, n.neg_ctx, dd.d,
            w.v * cp.v AS vp, w.v * cn.v AS vn
          FROM negf n
          CROSS JOIN dims dd
          JOIN $we w ON w.ent = n.center AND w.d = dd.d
          JOIN $ce cp ON cp.ent = n.context AND cp.d = dd.d
          JOIN $ce cn ON cn.ent = n.neg_ctx AND cn.d = dd.d)"""
    def psSql(name: String, from: String) =
      s"""$name AS (SELECT center, context, slot, neg_ctx,
            ROUND(SUM(vp), 6) AS sp, ROUND(SUM(vn), 6) AS sn
          FROM $from GROUP BY 1, 2, 3, 4)"""
    val lossExpr = "ln(1.0 + exp(-sp)) + ln(1.0 + exp(sn))"
    s"""WITH walks AS MATERIALIZED (
          SELECT * FROM (${walksOracleSql(length = 4)}) w),
        wpairs AS (SELECT DISTINCT a.node AS center, b.node AS context
          FROM walks a JOIN walks b
            ON b.start = a.start AND b.step <> a.step
            AND ABS(a.step - b.step) <= 2),
        ents AS (SELECT ctx, ROW_NUMBER() OVER (ORDER BY ctx) - 1 AS eid
          FROM (SELECT DISTINCT context AS ctx FROM wpairs)),
        nn AS (SELECT COUNT(*) AS n FROM ents),
        cand AS (SELECT p.center, p.context, CAST(s.slot AS INT) AS slot,
            ('0x' || substr(md5(p.center || '|' || p.context || '|'
              || CAST(s.slot AS VARCHAR)), 1, 15))::BIGINT
              % (SELECT n FROM nn) AS eid
          FROM wpairs p,
            (SELECT unnest(generate_series(0, ${negK - 1})) AS slot) s),
        negs AS (SELECT c.center, c.context, c.slot, e.ctx AS neg_ctx
          FROM cand c JOIN ents e USING (eid)
          WHERE e.ctx <> c.context),
        negf AS (SELECT n.center, n.context, n.slot, n.neg_ctx
          FROM negs n LEFT JOIN wpairs p
            ON p.center = n.center AND p.context = n.neg_ctx
          WHERE p.center IS NULL),
        dims AS (SELECT unnest(generate_series(1, $dim)) AS d),
        we0 AS (SELECT center AS ent, dd.d, ${init("w:", "center")} AS v
          FROM (SELECT DISTINCT center FROM wpairs), dims dd),
        ce0 AS (SELECT ctx AS ent, dd.d, ${init("c:", "ctx")} AS v
          FROM ents, dims dd),
        ${pdSql("pd0", "we0", "ce0")},
        ${psSql("ps0", "pd0")},
        gg AS (SELECT center, context, slot, neg_ctx,
            -1.0 / (1.0 + exp(sp)) AS gp, 1.0 / (1.0 + exp(-sn)) AS gn
          FROM ps0),
        wcon AS (
          SELECT g.center AS ent, dd.d, g.gp * cp.v AS gc
          FROM gg g CROSS JOIN dims dd
          JOIN ce0 cp ON cp.ent = g.context AND cp.d = dd.d
          UNION ALL
          SELECT g.center AS ent, dd.d, g.gn * cn.v AS gc
          FROM gg g CROSS JOIN dims dd
          JOIN ce0 cn ON cn.ent = g.neg_ctx AND cn.d = dd.d),
        ccon AS (
          SELECT g.context AS ent, dd.d, g.gp * w.v AS gc
          FROM gg g CROSS JOIN dims dd
          JOIN we0 w ON w.ent = g.center AND w.d = dd.d
          UNION ALL
          SELECT g.neg_ctx AS ent, dd.d, g.gn * w.v AS gc
          FROM gg g CROSS JOIN dims dd
          JOIN we0 w ON w.ent = g.center AND w.d = dd.d),
        wg AS (SELECT ent, d, ROUND(AVG(gc), 6) AS g FROM wcon GROUP BY 1, 2),
        cg AS (SELECT ent, d, ROUND(AVG(gc), 6) AS g FROM ccon GROUP BY 1, 2),
        we1 AS (SELECT x.ent, x.d, x.v - $lr * COALESCE(g.g, 0.0) AS v
          FROM we0 x LEFT JOIN wg g ON g.ent = x.ent AND g.d = x.d),
        ce1 AS (SELECT x.ent, x.d, x.v - $lr * COALESCE(g.g, 0.0) AS v
          FROM ce0 x LEFT JOIN cg g ON g.ent = x.ent AND g.d = x.d),
        ${pdSql("pd1", "we1", "ce1")},
        ${psSql("ps1", "pd1")},
        lb AS (SELECT center, COUNT(*) AS n_pairs,
            ROUND(AVG($lossExpr), 6) AS loss_before
          FROM ps0 GROUP BY 1),
        la AS (SELECT center, ROUND(AVG($lossExpr), 6) AS loss_after
          FROM ps1 GROUP BY 1)
        SELECT center, n_pairs, loss_before, loss_after
        FROM lb JOIN la USING (center)"""
  }

  /** Unrolled WARM-START oracle ([[graft.graph.KgGraph.pageRankWarmStart]]
    * twin): 5 cold rounds on the v1 edge set, then the published (6dp-
    * rounded) ranks seed `itersWarm` rounds over the UPDATED edge set
    * (v1 ∪ the hash-selected reversed 10%, counts merged) — the
    * incremental-maintenance contract `kg_fact_diff`'s sibling. */
  private def warmPrOracleSql(itersCold: Int, itersWarm: Int): String =
    s"""WITH $pageEdgesPrScaffoldSql,
        dflt AS (SELECT b AS a, a AS b, w FROM edges
          WHERE ('0x' || substr(md5(a || '|' || b), 1, 15))::BIGINT % 10 = 0),
        edges2 AS MATERIALIZED (SELECT a, b, SUM(w) AS w FROM
          (SELECT * FROM edges UNION ALL SELECT * FROM dflt) GROUP BY 1, 2),
        ow2 AS MATERIALIZED (SELECT a, SUM(w) AS s FROM edges2 GROUP BY a),
        ew2 AS MATERIALIZED (SELECT e.a, e.b, e.w, o.s
          FROM edges2 e JOIN ow2 o USING (a)),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        unodes AS MATERIALIZED (SELECT node,
            CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
        pr0 AS (SELECT node, t AS pr FROM unodes),
        ${prRoundsCtesSql(itersCold, "pr", "unodes")},
        wpr0 AS (SELECT n.node, COALESCE(i.pr, n.t) AS pr
          FROM unodes n LEFT JOIN
            (SELECT node, ROUND(pr, 6) AS pr FROM pr$itersCold) i
            ON i.node = n.node),
        ${prRoundsCtesSql(itersWarm, "wpr", "unodes", ow = "ow2", ew = "ew2")}
        SELECT node AS page, ROUND(pr, 6) AS pagerank FROM wpr$itersWarm"""

  /** Unrolled PERSONALIZED-PageRank oracle ([[graft.graph.KgGraph
    * .pageRankPersonalized]] twin): the teleport vector (1/|S| on the
    * `nSeeds` lexicographically-first nodes) rides the node CTE;
    * [[prRoundsCtesSql]] rounds against it. */
  private def pprOracleSql(iters: Int, nSeeds: Int): String =
    s"""WITH $pageEdgesPrScaffoldSql,
        seeds AS (SELECT node FROM nodes ORDER BY node LIMIT $nSeeds),
        ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds),
        tnodes AS MATERIALIZED (SELECT n.node,
            COALESCE(s.t, CAST(0 AS DOUBLE)) AS t
          FROM nodes n LEFT JOIN
            (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) AS t
             FROM seeds) s ON s.node = n.node),
        pr0 AS (SELECT node, t AS pr FROM tnodes),
        ${prRoundsCtesSql(iters, "pr", "tnodes")}
        SELECT node AS page, ROUND(pr, 6) AS pagerank FROM pr$iters"""

  /** Unrolled TrustRank oracle ([[graft.ops.LinkGraph.trustRank]] twin):
    * TWO directed-PR chains over the HOST graph — uniform teleport (`upr*`)
    * and seed-restricted teleport (`tpr*`) — sharing the edge/out-weight/
    * node CTEs, each round mirroring [[graft.graph.KgGraph]]'s
    * `directedPrCore` including the per-round dangling scalar; the mass
    * ratio is computed on the 6dp-ROUNDED ranks exactly as the engine. */
  /** Unrolled bounded-horizon Brandes oracle ([[graft.graph.KgGraph
    * .betweenness]] twin): forward levels with exact BIGINT σ sums and
    * NOT-EXISTS visited accumulators, the shortest-path DAG as a
    * level-(+1) three-way join, then the backward dependency sweep one
    * CTE per level deepest-first — the SAME left-assoc double arithmetic
    * σ_u/σ_w·(1+δ_w), 6dp. */
  private def betweennessOracleSql(maxDepth: Int, nSeeds: Int): String = {
    val fwd = (1 to maxDepth).map { d =>
      s"""bf$d AS MATERIALIZED (SELECT v.source, e.d AS node, $d AS dist,
            CAST(SUM(v.sigma) AS BIGINT) AS sigma
          FROM bv${d - 1} v JOIN bhe e ON e.s = v.node
          GROUP BY 1, 2),
          bv$d AS MATERIALIZED (SELECT f.source, f.node, f.dist, f.sigma
                   FROM bf$d f
                   WHERE NOT EXISTS (SELECT 1 FROM ba${d - 1} p
                     WHERE p.source = f.source AND p.node = f.node)),
          ba$d AS MATERIALIZED (SELECT * FROM ba${d - 1}
                   UNION ALL SELECT * FROM bv$d)"""
    }.mkString(",\n")
    val bwd = ((maxDepth - 1) to 1 by -1).map { d =>
      s"""bd$d AS MATERIALIZED (SELECT x.source, x.node,
            COALESCE(s.v, CAST(0 AS DOUBLE)) AS delta
          FROM (SELECT source, node FROM ba$maxDepth WHERE dist = $d) x
          LEFT JOIN (SELECT g.source, g.u AS node,
              SUM(CAST(g.sigma_u AS DOUBLE) / CAST(g.sigma_w AS DOUBLE)
                  * (CAST(1 AS DOUBLE) + dn.delta)) AS v
            FROM bdag g JOIN bd${d + 1} dn
              ON dn.source = g.source AND dn.node = g.w
            WHERE g.du = $d GROUP BY 1, 2) s
            ON s.source = x.source AND s.node = x.node)"""
    }.mkString(",\n")
    val unions = (1 to maxDepth)
      .map(d => s"SELECT source, node, delta FROM bd$d")
      .mkString("\n           UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        bhe AS MATERIALIZED (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS s,
            dst_url AS d
          FROM lnk
          WHERE ${graft.ops.WebOps.canonUrlSqlOf("src_url")} <> dst_url),
        bnodes AS (SELECT DISTINCT n FROM
          (SELECT s AS n FROM bhe UNION ALL SELECT d FROM bhe)),
        bseeds AS (SELECT n AS node FROM bnodes ORDER BY n LIMIT $nSeeds),
        bv0 AS MATERIALIZED (SELECT node AS source, node, 0 AS dist,
                  CAST(1 AS BIGINT) AS sigma FROM bseeds),
        ba0 AS MATERIALIZED (SELECT * FROM bv0),
        $fwd,
        bdag AS MATERIALIZED (SELECT u.source, u.node AS u, u.dist AS du,
                   u.sigma AS sigma_u, w.node AS w, w.sigma AS sigma_w
                 FROM ba$maxDepth u JOIN bhe e ON e.s = u.node
                 JOIN ba$maxDepth w ON w.source = u.source AND w.node = e.d
                   AND w.dist = u.dist + 1),
        bd$maxDepth AS MATERIALIZED (SELECT source, node,
                          CAST(0 AS DOUBLE) AS delta
                        FROM ba$maxDepth WHERE dist = $maxDepth),
        $bwd
        SELECT node AS page, ROUND(SUM(delta), 6) AS betweenness
        FROM ($unions)
        GROUP BY 1"""
  }

  /** Unrolled k-truss oracle ([[graft.graph.KgGraph.ktruss]] twin, the
    * kcoreOracleSql discipline): exactly `iters` peel rounds — peeling is
    * idempotent after convergence, so the fixed unroll equals the
    * engine's converged fixpoint (asserted engine-side). Every te CTE is
    * MATERIALIZED: each is referenced three times by the next round and
    * DuckDB inlines plain CTEs. */
  private def ktrussOracleSql(k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""tu$i AS MATERIALIZED (SELECT a, b FROM te${i - 1}
            UNION ALL SELECT b, a FROM te${i - 1}),
          te$i AS MATERIALIZED (SELECT e.a, e.b FROM te${i - 1} e
            JOIN tu$i x ON x.a = e.a
            JOIN tu$i y ON y.a = e.b AND y.b = x.b
            GROUP BY e.a, e.b HAVING COUNT(*) >= ${k - 2})"""
    }.mkString(",\n")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        tpe AS MATERIALIZED (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS pa,
            dst_url AS pb
          FROM lnk),
        te0 AS MATERIALIZED (SELECT LEAST(pa, pb) AS a,
            GREATEST(pa, pb) AS b
          FROM tpe WHERE pa <> pb GROUP BY 1, 2),
        $rounds,
        fu AS (SELECT a, b FROM te$iters UNION ALL SELECT b, a FROM te$iters)
        SELECT e.a AS src, e.b AS dst, CAST(COUNT(*) AS BIGINT) AS support
        FROM te$iters e JOIN fu x ON x.a = e.a
        JOIN fu y ON y.a = e.b AND y.b = x.b
        GROUP BY 1, 2"""
  }

  private def trustRankOracleSql(iters: Int, nSeeds: Int): String = {
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT sh AS a, dh AS b,
            CAST(COUNT(*) AS DOUBLE) AS w
          FROM (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS sh,
                       ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dh
                FROM lnk)
          WHERE sh <> dh GROUP BY 1, 2),
        ow AS MATERIALIZED (SELECT a, SUM(w) AS s FROM edges GROUP BY a),
        ew AS MATERIALIZED (SELECT e.a, e.b, e.w, o.s
          FROM edges e JOIN ow o USING (a)),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        seeds AS (SELECT node FROM nodes ORDER BY node LIMIT $nSeeds),
        ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM seeds),
        unodes AS MATERIALIZED (SELECT node,
            CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
        tnodes AS MATERIALIZED (SELECT n.node,
            COALESCE(s.t, CAST(0 AS DOUBLE)) AS t
          FROM nodes n LEFT JOIN
            (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) AS t
             FROM seeds) s ON s.node = n.node),
        upr0 AS (SELECT node, t AS pr FROM unodes),
        tpr0 AS (SELECT node, t AS pr FROM tnodes),
        ${prRoundsCtesSql(iters, "upr", "unodes")},
        ${prRoundsCtesSql(iters, "tpr", "tnodes")}
        SELECT u.node AS host, ROUND(u.pr, 6) AS pagerank,
          ROUND(t.pr, 6) AS trust,
          ROUND((ROUND(u.pr, 6) - ROUND(t.pr, 6)) / ROUND(u.pr, 6), 6)
            AS rel_spam_mass
        FROM upr$iters u JOIN tpr$iters t ON t.node = u.node"""
  }

  /** Unrolled threshold-sieved SimRank oracle ([[graft.graph.KgGraph
    * .simRank]] twin over the PAGE graph): per round, expand the canonical
    * half-matrix to both orientations, propagate pair → successor-pair
    * through two edge joins, one (a, b) aggregation, the SAME
    * `c·t/(ia·ib)` scale + sieve, diagonal re-union. Scores unrounded
    * across rounds (the PageRank contract), ONE ROUND(6) at the end. */
  private def simRankOracleSql(iters: Int, c: Double, degCap: Int,
                               minScore: Double): String = {
    val rounds = (1 to iters).map { r =>
      s"""f$r AS (SELECT a, b, s FROM s${r - 1} UNION ALL
            SELECT b AS a, a AS b, s FROM s${r - 1} WHERE a <> b),
          p$r AS (SELECT e1.dst AS a, e2.dst AS b, e1.ind AS ia,
                    e2.ind AS ib, SUM(f.s) AS t
                  FROM f$r f
                  JOIN e e1 ON e1.src = f.a
                  JOIN e e2 ON e2.src = f.b
                  WHERE e1.dst < e2.dst GROUP BY 1, 2, 3, 4),
          s$r AS MATERIALIZED (
            SELECT a, b, CAST($c AS DOUBLE) * t / (ia * ib) AS s FROM p$r
            WHERE CAST($c AS DOUBLE) * t / (ia * ib)
                  >= CAST($minScore AS DOUBLE)
            UNION ALL SELECT a, b, s FROM diag)"""
    }.mkString(",\n")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        he AS MATERIALIZED (SELECT DISTINCT sh AS src, dh AS dst
          FROM (SELECT ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS sh,
                       dst_url AS dh
                FROM lnk)
          WHERE sh <> dh),
        ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS ind
                FROM he GROUP BY 1),
        e AS MATERIALIZED (SELECT h.src, h.dst, i.ind
          FROM he h JOIN ind i USING (dst) WHERE i.ind <= $degCap),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM he UNION ALL SELECT dst FROM he)),
        diag AS MATERIALIZED (SELECT node AS a, node AS b,
          CAST(1.0 AS DOUBLE) AS s FROM nodes),
        s0 AS (SELECT a, b, s FROM diag),
        $rounds
        SELECT a AS page_a, b AS page_b, ROUND(s, 6) AS simrank
        FROM s$iters WHERE a <> b"""
  }

  /** Shared curation-leg CTE chain (exact-dedup keep set, benchmark
    * contamination, Gopher gate, repetition gate over the doc_id >= 10
    * corpus split) — ONE definition feeding both the `curate_corpus_full`
    * capstone and the `curate_ledger` provenance report. */
  private val curateLegsSql: String =
    """corpus AS (SELECT * FROM documents WHERE doc_id >= 10),
          keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text),
          toksall AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                  FROM toksall WHERE len(t) >= 3),
          sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
          bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10),
          contaminated AS (SELECT s.doc_id FROM sh s JOIN bench b ON s.shingle = b.shingle
                           WHERE s.doc_id >= 10 GROUP BY s.doc_id HAVING COUNT(*) >= 2),
          gv AS (SELECT doc_id, len(t) AS n_words,
                   list_sum(list_transform(t, x -> length(x))) / CAST(len(t) AS DOUBLE) AS mean_len,
                   len(list_filter(t, x -> NOT regexp_matches(x, '[A-Za-z0-9]')))
                     / CAST(len(t) AS DOUBLE) AS sym_ratio,
                   len(list_filter(t, x -> x IN ('the', 'a'))) AS stop_hits
                 FROM toksall WHERE doc_id >= 10),
          gopher AS (SELECT doc_id FROM gv WHERE n_words BETWEEN 50 AND 100000
                     AND mean_len BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
                     AND sym_ratio <= CAST(0.1 AS DOUBLE) AND stop_hits >= 2),
          bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                 FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                       FROM toksall WHERE doc_id >= 10 AND len(t) >= 2)),
          f AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
          m AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS nb FROM f GROUP BY 1),
          lowrep AS (SELECT t.doc_id
                     FROM (SELECT doc_id FROM toksall WHERE doc_id >= 10) t
                     LEFT JOIN m ON t.doc_id = m.doc_id
                     WHERE COALESCE(ROUND(m.mx / CAST(m.nb AS DOUBLE), 4),
                                    CAST(0.0 AS DOUBLE)) <= CAST(0.2 AS DOUBLE))"""

  /** Exact brute-force top-3 oracle (the `sim_topk` twin) — a val so the
    * recall gate can nest it as a subquery next to the IVF chain. */
  private val bruteTopKOracleSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
          q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10),
          s AS (SELECT query_id, e.vec_id AS neighbor_id,
                ROUND(list_dot_product(q_emb, emb) /
                  sqrt(list_dot_product(q_emb, q_emb) * list_dot_product(emb, emb)), 4) AS cos
                FROM q, e WHERE e.vec_id <> q.query_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
          FROM r WHERE rank <= 3"""

  /** Shared RM3 oracle chain ([[graft.ops.TextOps.rm3Weights]] twin): the
    * text_qlm first pass (ROUND(6) per-doc scores), rank-weighted top-5
    * feedback docs (1/rank — mirrors the engine's named exp(score)
    * stand-in), relevance-model term weights ROUND(6), top-5
    * (w desc, term) expansion terms with the original query excluded.
    * `u`/`fb`/`expterms` MATERIALIZED (each feeds several consumers). */
  private val rm3ChainCtes: String =
    """toks0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       lens AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS len FROM toks0),
       u AS MATERIALIZED (SELECT doc_id, unnest(t) AS term FROM toks0),
       tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_toks FROM u),
       q AS (SELECT unnest(['spark', 'join', 'data']) AS term),
       tfq AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM u
               WHERE term IN ('spark', 'join', 'data') GROUP BY 1, 2),
       cfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM u
               WHERE term IN ('spark', 'join', 'data') GROUP BY 1),
       sc1 AS (SELECT l.doc_id,
                 ln((COALESCE(t.tf, CAST(0.0 AS DOUBLE))
                      + CAST(300.0 AS DOUBLE)
                        * COALESCE(c.cf, CAST(0.0 AS DOUBLE)) / tt.n_toks)
                    / (l.len + CAST(300.0 AS DOUBLE))) AS sco
               FROM lens l CROSS JOIN q
               LEFT JOIN tfq t ON t.doc_id = l.doc_id AND t.term = q.term
               LEFT JOIN cfq c ON c.term = q.term
               CROSS JOIN tot tt),
       agg1 AS (SELECT doc_id, ROUND(SUM(sco), 6) AS score
                FROM sc1 GROUP BY 1),
       fb AS MATERIALIZED (SELECT doc_id, CAST(1.0 AS DOUBLE) / rn AS wd
             FROM (SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
                   FROM agg1) z
             WHERE rn <= 5),
       ftf AS (SELECT u.doc_id, u.term, CAST(COUNT(*) AS DOUBLE) AS tf
               FROM u JOIN fb ON fb.doc_id = u.doc_id GROUP BY 1, 2),
       expterms AS MATERIALIZED (SELECT term,
           ROUND(SUM(f.wd * t.tf / l.len), 6) AS w
         FROM ftf t
         JOIN fb f ON f.doc_id = t.doc_id
         JOIN lens l ON l.doc_id = t.doc_id
         WHERE term NOT IN ('spark', 'join', 'data')
         GROUP BY 1 ORDER BY w DESC, term LIMIT 5)"""

  /** Unrolled BPE-training oracle ([[graft.ops.TextOps.bpeMerges]] twin):
    * per round an adjacency-pair count over the delimiter-framed word
    * strings, the (count desc, lhs, rhs) argmax, and the SAME left-to-right
    * non-overlapping `replace` application — DuckDB's `replace` and Spark's
    * share that scan rule, which is what makes the string representation a
    * cross-engine contract. w/t CTEs MATERIALIZED (each feeds the next
    * round AND the final union / replace). */
  private def bpeTrainCtes(vocabWords: Int, merges: Int): String = {
    val rounds = (1 to merges).map { r =>
      s"""p$r AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT l[i] AS a, l[i + 1] AS b, freq FROM (
              SELECT string_split(trim(s, '|'), '||') AS l, freq,
                unnest(generate_series(1,
                  len(string_split(trim(s, '|'), '||')) - 1)) AS i
              FROM w${r - 1}) z) GROUP BY 1, 2),
          t$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r
            ORDER BY cnt DESC, a, b LIMIT 1),
          w$r AS MATERIALIZED (SELECT replace(s,
              '|' || t.a || '||' || t.b || '|',
              '|' || t.a || t.b || '|') AS s, freq
            FROM w${r - 1}, t$r t)"""
    }.mkString(",\n")
    s"""words AS (SELECT lower(tok) AS word, COUNT(*) AS freq FROM
            (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE regexp_matches(lower(tok), '^[a-z]+$$')
          GROUP BY 1 ORDER BY freq DESC, word LIMIT $vocabWords),
        w0 AS (SELECT '|' || array_to_string(string_split(word, ''), '||')
            || '|' AS s, freq FROM words),
        $rounds"""
  }

  private def bpeOracleSql(vocabWords: Int, merges: Int): String = {
    val union = (1 to merges).map { r =>
      s"SELECT $r AS round, a AS lhs, b AS rhs, cnt AS pair_count FROM t$r"
    }.mkString(" UNION ALL ")
    s"""WITH ${bpeTrainCtes(vocabWords, merges)}
        $union"""
  }

  /** Encode-chain CTEs shared by the `text_bpe_encode` oracle and the
    * `text_bpe_stats` oracle: the SAME trained t1..tN merge tables applied
    * over the corpus token stream as the SAME sequential replace chain (one
    * CTE per round — merge ORDER is the tokenizer), split back into
    * positioned pieces as `enc_pieces(doc_id, word_pos, piece_pos, piece)`. */
  private def bpeEncodeCtes(vocabWords: Int, merges: Int): String = {
    val apply = (1 to merges).map { r =>
      // LEFT JOIN ON true: if training exhausted pairs before round r
      // (empty t$r), the round is an identity pass instead of emptying the
      // whole chain — matching bpeEncode, which folds only existing merges
      s"""e$r AS MATERIALIZED (SELECT doc_id, word_pos, COALESCE(replace(s,
            '|' || t.a || '||' || t.b || '|',
            '|' || t.a || t.b || '|'), s) AS s
          FROM e${r - 1} LEFT JOIN t$r t ON true)"""
    }.mkString(",\n")
    s"""${bpeTrainCtes(vocabWords, merges)},
        dtok AS (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) z),
        wtok AS (SELECT doc_id, CAST(i AS INT) AS word_pos, lower(l[i]) AS word
          FROM dtok WHERE regexp_matches(lower(l[i]), '^[a-z]+$$')),
        e0 AS (SELECT doc_id, word_pos,
            '|' || array_to_string(string_split(word, ''), '||') || '|' AS s
          FROM wtok),
        $apply,
        pieces AS (SELECT doc_id, word_pos,
            string_split(trim(s, '|'), '||') AS p FROM e$merges),
        enc_pieces AS (SELECT doc_id, word_pos, CAST(j AS INT) AS piece_pos,
            p[j] AS piece
          FROM (SELECT doc_id, word_pos, p,
                  unnest(generate_series(1, len(p))) AS j FROM pieces) z)"""
  }

  private def bpeEncodeOracleSql(vocabWords: Int, merges: Int): String =
    s"""WITH ${bpeEncodeCtes(vocabWords, merges)}
        SELECT doc_id, word_pos, piece_pos, piece FROM enc_pieces"""

  /** Unrolled HITS oracle ([[graft.graph.KgGraph.hits]] twin): both
    * half-rounds (auth-from-hubs, hubs-from-auths) of every iteration, each
    * L1-normalized by a scalar-subquery sum, exactly the engine's order of
    * operations. All score CTEs MATERIALIZED (each is read twice: by its
    * normalizer and by the next half-round). */
  private def hitsOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT n.node, COALESCE(s.x, CAST(0 AS DOUBLE)) AS x
            FROM nodes n LEFT JOIN
              (SELECT e.dst AS node, SUM(h.hub * e.w) AS x
               FROM edges e JOIN hub${i - 1} h ON h.node = e.src
               GROUP BY e.dst) s ON s.node = n.node),
          auth$i AS MATERIALIZED (SELECT node,
              x / (SELECT SUM(x) FROM ar$i) AS auth FROM ar$i),
          hr$i AS MATERIALIZED (SELECT n.node, COALESCE(s.x, CAST(0 AS DOUBLE)) AS x
            FROM nodes n LEFT JOIN
              (SELECT e.src AS node, SUM(a.auth * e.w) AS x
               FROM edges e JOIN auth$i a ON a.node = e.dst
               GROUP BY e.src) s ON s.node = n.node),
          hub$i AS MATERIALIZED (SELECT node,
              x / (SELECT SUM(x) FROM hr$i) AS hub FROM hr$i)"""
    }.mkString(",\n")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
            dst_url AS dst, CAST(COUNT(*) AS DOUBLE) AS w
          FROM lnk GROUP BY 1, 2),
        nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        hub0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes),
        $iterCtes
        SELECT h.node AS page, ROUND(h.hub, 6) AS hub,
               ROUND(a.auth, 6) AS authority
        FROM hub$iters h JOIN auth$iters a ON a.node = h.node"""
  }

  /** Unrolled fixed-iteration PageRank oracle: pr_i from pr_{i-1} as plain
    * CTEs (recursive CTEs cannot aggregate per step, but a FIXED iteration
    * count needs no recursion). All arithmetic forced to DOUBLE — DuckDB's
    * bare `1.0` literal is DECIMAL, which would diverge from Spark's double
    * semantics. 6dp rounding absorbs cross-engine float-sum ordering.
    * ONE builder for both variants, mirroring the engine (pageRank ==
    * pageRankWeighted at w = 1): contribution = pr·w/strength; unweighted
    * w = 1.0 makes strength the degree and pr·1.0/s bit-identical to pr/d. */
  private def pageRankOracleSql(iters: Int, weighted: Boolean): String = {
    val w = if (weighted) "COUNT(*)" else "1"
    val iterCtes = (1 to iters).map { i =>
      s"""pr$i AS (SELECT u.b AS node,
            (CAST(0.15 AS DOUBLE) / (SELECT n FROM nn))
              + CAST(0.85 AS DOUBLE) * SUM(p.pr * u.w / st.s) AS pr
          FROM und u JOIN pr${i - 1} p ON p.node = u.a
          JOIN st ON st.a = u.a
          GROUP BY u.b)"""
    }.mkString(",\n")
    s"""WITH $dictCte, $directCte,
        pairs AS (SELECT DISTINCT url, class_iri FROM direct),
        cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                        CAST($w AS DOUBLE) AS w
                 FROM pairs a JOIN pairs b
                   ON a.url = b.url AND a.class_iri < b.class_iri
                 GROUP BY 1, 2),
        und AS (SELECT src AS a, dst AS b, w FROM cooc
                UNION ALL SELECT dst, src, w FROM cooc),
        st AS (SELECT a, SUM(w) AS s FROM und GROUP BY a),
        nodes AS (SELECT DISTINCT a AS node FROM und),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr
                FROM nodes),
        $iterCtes
        SELECT node AS class_iri, ROUND(pr, 6) AS pagerank FROM pr$iters"""
  }

  /** Unrolled bounded-horizon Katz oracle ([[graft.graph.KgGraph.katz]]
    * twin): x_i = 1 + α·Σ_neighbors x_{i-1} as plain CTEs over the
    * symmetrized distinct co-occurrence edges; α is the one shared
    * [[graft.graph.KgGraph.KatzAlpha]] constant, all arithmetic DOUBLE,
    * node-complete via LEFT join, 6dp absorbs float-sum ordering. */
  private def katzOracleSql(iters: Int): String = {
    val alpha = graft.graph.KgGraph.KatzAlpha
    val iterCtes = (1 to iters).map { i =>
      s"""kx$i AS MATERIALIZED (SELECT n.node,
            CAST(1.0 AS DOUBLE) + CAST($alpha AS DOUBLE) *
              COALESCE(s.v, CAST(0 AS DOUBLE)) AS x
          FROM nodes n LEFT JOIN
            (SELECT u.a AS node, SUM(p.x) AS v
             FROM und u JOIN kx${i - 1} p ON p.node = u.b
             GROUP BY 1) s ON s.node = n.node)"""
    }.mkString(",\n")
    s"""WITH $dictCte, $directCte,
        pairs AS (SELECT DISTINCT url, class_iri FROM direct),
        cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                 FROM pairs a JOIN pairs b
                   ON a.url = b.url AND a.class_iri < b.class_iri),
        und AS (SELECT src AS a, dst AS b FROM cooc
                UNION SELECT dst, src FROM cooc),
        nodes AS (SELECT DISTINCT a AS node FROM und),
        kx0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS x FROM nodes),
        $iterCtes
        SELECT node AS class_iri, ROUND(x, 6) AS katz FROM kx$iters"""
  }

  /** Unrolled k-core peeling oracle ([[graft.graph.KgGraph.kcore]] twin):
    * exactly `iters` peel rounds as plain CTEs — peeling is idempotent
    * after convergence, so the fixed unroll equals the engine's converged
    * result (the engine asserts convergence within the same bound). */
  private def kcoreOracleSql(k: Int, iters: Int): String = {
    // each e_i is referenced THREE times by round i+1 (both UNION ALL arms
    // of u_{i+1} and the join in e_{i+1}); DuckDB inlines plain CTEs, which
    // would expand the tree 3^iters-fold — MATERIALIZED keeps it linear
    val rounds = (1 to iters).map { i =>
      s"""u$i AS (SELECT a, b FROM e${i - 1} UNION ALL SELECT b, a FROM e${i - 1}),
          k$i AS (SELECT a FROM u$i GROUP BY a HAVING COUNT(*) >= $k),
          e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
                  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)"""
    }.mkString(",\n")
    s"""WITH $dictCte, $directCte,
        pairs AS (SELECT DISTINCT url, class_iri FROM direct),
        e0 AS MATERIALIZED (SELECT a.class_iri AS a, b.class_iri AS b
               FROM pairs a JOIN pairs b
                 ON a.url = b.url AND a.class_iri < b.class_iri
               GROUP BY 1, 2),
        $rounds
        SELECT a AS class_iri, COUNT(*) AS core_degree
        FROM (SELECT a, b FROM e$iters UNION ALL SELECT b, a FROM e$iters)
        GROUP BY a"""
  }

  /** Unrolled label-propagation oracle ([[graft.graph.KgGraph
    * .labelPropagation]] twin): `iters` synchronous rounds as plain CTEs,
    * each taking the neighbor label with the highest count (smallest label
    * on ties — expressed as the same deterministic order, via ROW_NUMBER
    * here and min(struct(-c, label)) in the engine). `und` is MATERIALIZED
    * (referenced every round). */
  private def labelPropOracleSql(iters: Int): String =
    s"""WITH $dictCte, $directCte, ${labelPropChainCtes(iters)}
        SELECT node AS class_iri, label AS community FROM l$iters"""

  /** The shared label-propagation CTE chain (weighted cooc edges + `iters`
    * synchronous rounds), reused by the kg_labelprop and kg_modularity
    * oracles. `cooc` carries the edge weight `w` (doc count) even though
    * propagation ignores it — modularity consumes it downstream. */
  private def labelPropChainCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT u.src AS node, l.label, COUNT(*) AS c
            FROM und u JOIN l${i - 1} l ON u.dst = l.node GROUP BY 1, 2),
          l$i AS (SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM r$i) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""pairs AS (SELECT DISTINCT url, class_iri FROM direct),
        cooc AS MATERIALIZED (SELECT a.class_iri AS src, b.class_iri AS dst,
                 CAST(COUNT(*) AS BIGINT) AS w
                 FROM pairs a JOIN pairs b
                   ON a.url = b.url AND a.class_iri < b.class_iri
                 GROUP BY 1, 2),
        und AS MATERIALIZED (SELECT src, dst FROM cooc
               UNION ALL SELECT dst AS src, src AS dst FROM cooc),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
        $rounds"""
  }

  /** [[graft.graph.KgGraph.modularity]] twin over the label-propagation
    * partition: the same weighted-degree / intra-weight / total-weight
    * rollups with the identical division order, 6dp. */
  private def modularityOracleSql(iters: Int): String =
    s"""WITH $dictCte, $directCte, ${labelPropChainCtes(iters)},
        comm AS (SELECT node AS class_iri, label AS community FROM l$iters),
        deg AS (SELECT class_iri, CAST(SUM(w) AS BIGINT) AS k
                FROM (SELECT src AS class_iri, w FROM cooc
                      UNION ALL SELECT dst AS class_iri, w FROM cooc)
                GROUP BY 1),
        tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS m FROM cooc),
        cd AS (SELECT community, COUNT(*) AS n_nodes,
                 CAST(SUM(k) AS BIGINT) AS degree_w
               FROM deg JOIN comm USING (class_iri) GROUP BY 1),
        intra AS (SELECT ca.community, CAST(SUM(e.w) AS BIGINT) AS internal_w
                  FROM cooc e
                  JOIN comm ca ON e.src = ca.class_iri
                  JOIN comm cb ON e.dst = cb.class_iri
                  WHERE ca.community = cb.community GROUP BY 1)
        SELECT cd.community, cd.n_nodes,
               COALESCE(i.internal_w, 0) AS internal_w, cd.degree_w,
               ROUND(COALESCE(i.internal_w, 0) / m
                 - POW(cd.degree_w / (2.0 * m), 2.0), 6) AS q_contrib
        FROM cd LEFT JOIN intra i USING (community), tot"""

  /** [[graft.graph.KgGraph.conductance]] twin over the post-Louvain-move
    * partition (the label-propagation partition collapses to ONE community
    * on this corpus — conductance of the trivial cut is the NULL case, not
    * a test): the same per-endpoint union (each edge contributes w to both
    * endpoints' communities, crossing iff they differ), exact-BIGINT
    * cut/vol/2m sums, one pinned division, ROUND(6) — with the identical
    * whole-graph-community NULL CASE. */
  private def conductanceOracleSql(iters: Int): String =
    s"""WITH $dictCte, $directCte, ${louvainMoveChainCtes(iters)},
        mv AS (SELECT node AS class_iri, community FROM rk WHERE rn = 1),
        tagged AS (SELECT ca.community AS ca, cb.community AS cb, e.w
                   FROM cooc e
                   JOIN mv ca ON e.src = ca.class_iri
                   JOIN mv cb ON e.dst = cb.class_iri),
        perend AS (SELECT ca AS community, w, ca <> cb AS crossing FROM tagged
                   UNION ALL
                   SELECT cb AS community, w, ca <> cb AS crossing FROM tagged),
        members AS (SELECT community, COUNT(*) AS n_nodes FROM mv GROUP BY 1),
        tot AS (SELECT CAST(2 * SUM(w) AS BIGINT) AS vol2m FROM cooc),
        agg AS (SELECT community,
                  CAST(SUM(CASE WHEN crossing THEN w ELSE 0 END) AS BIGINT)
                    AS cut_w,
                  CAST(SUM(w) AS BIGINT) AS vol_w
                FROM perend GROUP BY 1)
        SELECT a.community, m.n_nodes, a.cut_w, a.vol_w,
          CASE WHEN LEAST(a.vol_w, vol2m - a.vol_w) = 0 THEN NULL
               ELSE ROUND(CAST(a.cut_w AS DOUBLE)
                          / LEAST(a.vol_w, vol2m - a.vol_w), 6)
          END AS phi
        FROM agg a JOIN members m USING (community), tot"""

  /** kg_louvain_move oracle ([[graft.graph.KgGraph.louvainMove]] twin from
    * the singleton partition): weighted degrees, community Σtot, per-
    * (node, candidate community) k_in with the guaranteed own-community
    * zero row, then the exact-BIGINT gain2 argmax via ROW_NUMBER with the
    * same (gain2 DESC, own-first, community ASC) order; dq = one pinned
    * division, ROUND(6). Reuses the LPA chain's cooc/und CTEs (the unused
    * round CTEs are plain — DuckDB never executes unreferenced ones). */
  private def louvainMoveOracleSql(iters: Int): String =
    s"""WITH $dictCte, $directCte, ${louvainMoveChainCtes(iters)}
        SELECT r.node AS class_iri, r.community,
          r.community <> r.own AS moved,
          CAST(r.gain2 - og.own_gain2 AS BIGINT) AS gain2,
          ROUND(2.0 * (r.gain2 - og.own_gain2)
            / (CAST(r.m2 AS DOUBLE) * CAST(r.m2 AS DOUBLE)), 6) AS dq
        FROM rk r JOIN og ON og.node = r.node WHERE r.rn = 1"""

  /** The shared Louvain-local-move CTE chain (singleton start → exact-
    * BIGINT gain2 scoring → per-node argmax `rk` + own-gain `og`), reused
    * by the kg_louvain_move oracle and — as the partition under test — the
    * kg_conductance oracle. */
  private def louvainMoveChainCtes(iters: Int): String =
    s"""${labelPropChainCtes(iters)},
        comm AS (SELECT node, node AS community FROM
                   (SELECT src AS node FROM cooc UNION SELECT dst FROM cooc)),
        undw AS MATERIALIZED (SELECT src AS node, dst AS nbr, w FROM cooc
                UNION ALL SELECT dst AS node, src AS nbr, w FROM cooc),
        deg AS (SELECT node, CAST(SUM(w) AS BIGINT) AS k
                FROM undw GROUP BY 1),
        sigma AS (SELECT community, CAST(SUM(k) AS BIGINT) AS sigma
                  FROM deg JOIN comm USING (node) GROUP BY 1),
        m2 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM undw),
        kin AS (SELECT u.node, c.community, CAST(SUM(u.w) AS BIGINT) AS kin
                FROM undw u JOIN comm c ON c.node = u.nbr GROUP BY 1, 2),
        cand AS (SELECT node, community, MAX(kin) AS kin FROM (
                   SELECT node, community, kin FROM kin
                   UNION ALL SELECT node, community, CAST(0 AS BIGINT) FROM comm)
                 GROUP BY 1, 2),
        sc AS (SELECT cand.node, cand.community, o.community AS own, m2.m2,
                 m2.m2 * cand.kin
                   - (s.sigma - CASE WHEN cand.community = o.community
                       THEN d.k ELSE 0 END) * d.k AS gain2
               FROM cand
               JOIN comm o ON o.node = cand.node
               JOIN deg d ON d.node = cand.node
               JOIN sigma s ON s.community = cand.community, m2),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                 ORDER BY gain2 DESC,
                   CASE WHEN community = own THEN 0 ELSE 1 END,
                   community) AS rn
               FROM sc),
        og AS (SELECT node, gain2 AS own_gain2 FROM sc WHERE community = own)"""

  /** Full dedup_jaccard oracle — a val so `dedup_lsh_recall` can nest the
    * ground-truth chain as a derived table (the ivfOracleSql precedent). */
  private val jaccardPairsOracleSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
        pos AS (SELECT doc_id, t,
                unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
        sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
        sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
        keep AS (SELECT shingle FROM sh GROUP BY shingle
                 HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 100),
        rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               ROUND(n_common / (sa.n_shingles + sb.n_shingles - n_common), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.8"""

  /** Full dedup_minhash oracle (same nesting rationale). */
  private def minhashPairsOracleSql =
    s"""WITH $minhashCtes
        SELECT doc_a, doc_b,
               ROUND(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_common / (sa.n + sb.n - n_common) >= 0.8"""

  /** Unrolled seeded-Lloyd IVF oracle pieces ([[graft.ops.Similarity.ivfTopK]]
    * twin): c0 = first-8 seed, each round re-assigns the training sample
    * (cosine argmax, c_id tie-break) and rebuilds centroids as per-dim
    * means rounded to 6dp. Dim loop = generate_series(1, 64) (the
    * embeddings table is 64-dim, already baked into the LSH oracles).
    * The Lloyd-chain + final-assignment CTEs (up to `aff`/`asgf`) are
    * shared by the ivf top-k oracles and the `sim_ivf_stats` oracle. */
  private def ivfChainCtes(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""s$i AS (SELECT t.vec_id, t.emb, c.c_id,
            list_dot_product(t.emb, c.c_emb) /
              sqrt(list_dot_product(t.emb, t.emb) * list_dot_product(c.c_emb, c.c_emb)) AS ccos
          FROM train t, c${i - 1} c),
         a$i AS (SELECT vec_id, emb, c_id AS bucket,
            row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn FROM s$i),
         m$i AS (SELECT bucket, d, ROUND(AVG(emb[d]), 6) AS m
            FROM (SELECT * FROM a$i WHERE rn = 1) af,
                 (SELECT unnest(generate_series(1, 64)) AS d)
            GROUP BY bucket, d),
         c$i AS (SELECT bucket AS c_id, array_agg(m ORDER BY d) AS c_emb
                 FROM m$i GROUP BY bucket)"""
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        train AS (SELECT vec_id, emb FROM e WHERE vec_id < 2048),
        c0 AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
        $iterCtes,
        sf AS (SELECT e.vec_id, e.emb, c.c_id,
                 list_dot_product(e.emb, c.c_emb) /
                   sqrt(list_dot_product(e.emb, e.emb) * list_dot_product(c.c_emb, c.c_emb)) AS ccos
               FROM e, c$iters c),
        asgf AS (SELECT vec_id, emb, c_id AS bucket,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
                FROM sf),
        aff AS (SELECT vec_id, emb, bucket FROM asgf WHERE rn = 1)"""
  }

  private def ivfOracleSql(iters: Int, nprobe: Int = 1): String = {
    s"""WITH ${ivfChainCtes(iters)},
        q AS (SELECT vec_id AS query_id, emb AS q_emb, bucket AS q_bucket
              FROM asgf WHERE vec_id < 10 AND rn <= $nprobe),
        s AS (SELECT query_id, aff.vec_id AS neighbor_id,
                ROUND(list_dot_product(q_emb, emb) /
                  sqrt(list_dot_product(q_emb, q_emb) * list_dot_product(emb, emb)), 4) AS cos
              FROM q JOIN aff ON q.q_bucket = aff.bucket AND aff.vec_id <> q.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
        FROM r WHERE rank <= 3"""
  }

  /** Unrolled product-quantization oracle ([[graft.ops.Similarity.pqTopK]]
    * twin): per subspace s — seed codebook = first-16 subvectors, one Lloyd
    * round (squared-L2 argmin ROUND 6dp with code tie-break; per-(code, dim)
    * means ROUND 6dp; empty codes keep their seed via LEFT JOIN + COALESCE),
    * then every vector encodes against the trained codebook. ADC score =
    * left-associated Σ_s list_dot_product(q_s, codeword_s) over the fixed
    * subspace order (matches the Column `reduce(_ + _)` fold), approximate
    * norm = √(left-associated Σ_s ‖codeword_s‖²). */
  private def pqOracleSql(subspaces: Int = 4, w: Int = 16, nCodes: Int = 16,
                          trainSample: Int = 2048, nQueries: Int = 10,
                          k: Int = 3): String = {
    def d2(sv: String, c: String) =
      s"ROUND(list_dot_product($sv, $sv) - 2 * list_dot_product($sv, $c)" +
        s" + list_dot_product($c, $c), 6)"
    val perSub = (0 until subspaces).map { s =>
      val (lo, hi) = (s * w + 1, s * w + w)
      s"""sub$s AS (SELECT vec_id, emb[$lo:$hi] AS sv FROM e),
          cb${s}_0 AS (SELECT vec_id AS code, sv AS c FROM sub$s
                       WHERE vec_id < $nCodes),
          asg$s AS (SELECT vec_id, sv, code FROM (
            SELECT t.vec_id, t.sv, c.code,
              row_number() OVER (PARTITION BY t.vec_id
                ORDER BY ${d2("t.sv", "c.c")}, c.code) AS rn
            FROM (SELECT * FROM sub$s WHERE vec_id < $trainSample) t, cb${s}_0 c)
            WHERE rn = 1),
          cb$s AS (SELECT p.code, COALESCE(n.c, p.c) AS c
            FROM cb${s}_0 p LEFT JOIN (
              SELECT code, array_agg(m ORDER BY d) AS c FROM (
                SELECT code, d, ROUND(AVG(sv[d]), 6) AS m
                FROM asg$s, (SELECT unnest(generate_series(1, $w)) AS d)
                GROUP BY code, d) GROUP BY code) n ON n.code = p.code),
          enc$s AS (SELECT vec_id, code FROM (
            SELECT v.vec_id, c.code,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${d2("v.sv", "c.c")}, c.code) AS rn
            FROM sub$s v, cb$s c) WHERE rn = 1)"""
    }.mkString(",\n")
    val encJoins = (0 until subspaces).map { s =>
      s"JOIN enc$s ON enc$s.vec_id = v.vec_id JOIN cb$s c$s ON c$s.code = enc$s.code"
    }.mkString("\n               ")
    val adot = (0 until subspaces).map { s =>
      val (lo, hi) = (s * w + 1, s * w + w)
      s"list_dot_product(q.q_emb[$lo:$hi], c$s.c)"
    }.mkString(" + ")
    val anorm2 = (0 until subspaces)
      .map(s => s"list_dot_product(c$s.c, c$s.c)").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        $perSub,
        q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < $nQueries),
        sc AS (SELECT q.query_id, v.vec_id AS neighbor_id,
                 ROUND(($adot) / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                   * sqrt($anorm2)), 4) AS cos
               FROM q, e v
               $encJoins
               WHERE v.vec_id <> q.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM sc)
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
        FROM r WHERE rank <= $k"""
  }

  private val cntsCte =
    raw"""cnts AS (SELECT 'doc://' || doc_id AS url, d.class_iri, d.pref,
          len(regexp_extract_all(upper(text), '\b' || d.term || '\b')) AS cnt
          FROM documents, dict d)"""
  /** The lemma-annotator match chain (SQL lemmatizer, lemma-space scan,
    * offset back-mapping) ending at `mapped(doc_id, class_iri, ont, pref,
    * f, t)` — shared by the ann_lemma and ann_agreement oracles. Requires
    * dictCte upstream. */
  private def lemmaMatchCtes: String =
    s"""ldict AS (
            SELECT DISTINCT array_to_string(
              list_transform(string_split(term, ' '), t -> ${lemmaCaseSql("t")}), ' ') AS term,
              class_iri, ont, pref
            FROM dict),
          docs AS (
            SELECT doc_id, text,
              regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks,
              regexp_split_to_array(text, '[A-Za-z0-9_]+') AS seps
            FROM documents),
          tokrows AS (
            SELECT doc_id, text, i, toks[i] AS tok, seps[i] AS sep,
              (${lemmaCaseSql("upper(toks[i])")}) AS lem
            FROM (SELECT *, unnest(generate_series(1, len(toks))) AS i FROM docs)),
          cums AS (
            SELECT doc_id, i, lem, tok,
              SUM(length(sep) + length(lem)) OVER w - length(lem) AS lemma_start,
              SUM(length(sep) + length(tok)) OVER w - length(tok) AS orig_start,
              SUM(length(sep) + length(tok)) OVER w AS orig_end
            FROM tokrows WINDOW w AS (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING)),
          ltext AS (
            SELECT t.doc_id, string_agg(t.sep || t.lem, '' ORDER BY t.i)
                   || MIN(d.seps[len(d.toks)+1]) AS ltxt
            FROM tokrows t JOIN docs d USING (doc_id) GROUP BY t.doc_id),
          hsegs AS (
            SELECT lt.doc_id, l.class_iri, l.ont, l.pref, length(l.term) AS tl,
              regexp_split_to_array(lt.ltxt, '\\b' || l.term || '\\b') AS parts
            FROM ltext lt, ldict l),
          hpos AS (
            SELECT doc_id, class_iri, ont, pref, tl, parts,
              unnest(generate_series(1, len(parts) - 1)) AS k
            FROM hsegs WHERE len(parts) > 1),
          hits AS (
            SELECT doc_id, class_iri, ont, pref, tl,
              CAST((SELECT COALESCE(SUM(length(p)), 0) FROM unnest(parts[1:k]) AS t(p))
                   + (k - 1) * tl AS BIGINT) AS f0
            FROM hpos),
          mapped AS (
            SELECT h.doc_id, h.class_iri, h.ont, h.pref,
              CAST(cs.orig_start + 1 AS INT) AS f, CAST(ce.orig_end AS INT) AS t
            FROM hits h
            JOIN cums cs ON cs.doc_id = h.doc_id AND cs.lemma_start = h.f0
            JOIN cums ce ON ce.doc_id = h.doc_id
              AND ce.lemma_start + length(ce.lem) = h.f0 + h.tl)"""

  /** DuckDB twin of the engine's 64-bit rolling fingerprint
    * ([[graft.ops.TextOps.fingerprint64]] / the codegen'd Fingerprint64
    * expression): h = h*131 + char over HUGEINT with an explicit mod-2^64
    * wrap per step (Java long overflow semantics), then two's-complement to
    * signed BIGINT. Valid for ASCII input (Java chars == code points there;
    * the driver corpus is ASCII, asserted by the all-ascii check in specs). */
  private def fpSql(colExpr: String): String =
    s"""list_reduce([1125899906842597::HUGEINT] ||
        list_transform(string_split($colExpr, ''), c -> unicode(c)::HUGEINT),
        (acc, c) -> (acc * 131 + c) % 18446744073709551616::HUGEINT)"""
  private def toSignedSql(v: String): String =
    s"""CASE WHEN $v >= 9223372036854775808::HUGEINT
        THEN ($v - 18446744073709551616::HUGEINT)::BIGINT ELSE $v::BIGINT END"""

  /** DuckDB twin of [[graft.annotate.Lemma.lemmaToken]] (uppercase in/out):
    * the same if/else-if rule chain as a CASE over `v`. Kept rule-for-rule
    * identical — both sides of lemma matching MUST share one lemma function. */
  private def lemmaCaseSql(v: String): String =
    s"""CASE WHEN length($v) <= 3 THEN $v
        WHEN $v LIKE '%IES' AND length($v) > 4 THEN substr($v, 1, length($v)-3) || 'Y'
        WHEN $v LIKE '%SSES' THEN substr($v, 1, length($v)-2)
        WHEN $v LIKE '%XES' OR $v LIKE '%CHES' OR $v LIKE '%SHES' THEN substr($v, 1, length($v)-2)
        WHEN $v LIKE '%ING' AND length($v) > 5 THEN
          CASE WHEN length($v)-3 > 2 AND substr($v, length($v)-3, 1) = substr($v, length($v)-4, 1)
                    AND substr($v, length($v)-3, 1) NOT IN ('A','E','I','O','U')
               THEN substr($v, 1, length($v)-4) ELSE substr($v, 1, length($v)-3) END
        WHEN $v LIKE '%ED' AND length($v) > 4 THEN
          CASE WHEN length($v)-2 > 2 AND substr($v, length($v)-2, 1) = substr($v, length($v)-3, 1)
                    AND substr($v, length($v)-2, 1) NOT IN ('A','E','I','O','U')
               THEN substr($v, 1, length($v)-3) ELSE substr($v, 1, length($v)-2) END
        WHEN $v LIKE '%S' AND $v NOT LIKE '%SS' AND $v NOT LIKE '%US' AND $v NOT LIKE '%IS'
          THEN substr($v, 1, length($v)-1)
        ELSE $v END"""

  /** cvalue per-(doc, term) parts: occurrence count, PREF/SYN weight, term
    * word count — the oracle twin of [[graft.annotate.Scoring.cvalueScores]]. */
  private val cvCte =
    raw"""cvparts AS (SELECT 'doc://' || doc_id AS url, d.class_iri,
          len(regexp_extract_all(upper(text), '\b' || d.term || '\b')) AS cnt,
          CASE WHEN d.pref THEN 10.0 ELSE 8.0 END AS w,
          len(string_split(d.term, ' ')) AS words
          FROM documents, dict d)"""
  private val closureCte =
    """closure(child_iri, ancestor_iri, distance) AS (
       SELECT child_iri, parent_iri, 1 FROM edges
       UNION ALL
       SELECT c.child_iri, e.parent_iri, c.distance + 1
       FROM closure c JOIN edges e ON c.ancestor_iri = e.child_iri
       WHERE c.distance < 5)"""
  private val minClosureCte =
    """mincl AS (SELECT child_iri, ancestor_iri, MIN(distance) AS distance
       FROM closure GROUP BY child_iri, ancestor_iri)"""
  /** The canonical (subj, pred, obj) triple table as a composable CTE — the
    * ann_triples oracle body verbatim, shared by every KG-QA oracle that
    * consumes the triple store (SHACL report, RDFS typing, BGP star,
    * N-Quads dump). Requires dictCte + edgesCte + mappingsCte + directCte +
    * closureCte upstream (and WITH RECURSIVE for the closure). */
  private val kgTriplesCte =
    """triples AS (
       SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
       UNION
       SELECT DISTINCT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
       FROM (SELECT DISTINCT url, class_iri FROM direct) dr
       JOIN closure cl ON dr.class_iri = cl.child_iri
       UNION
       SELECT DISTINCT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
       FROM (SELECT DISTINCT url, class_iri FROM direct) dr
       JOIN maps m ON dr.class_iri = m.class_iri)"""

  /** Unrolled multi-source-BFS oracle ([[graft.graph.KgGraph.shortestPaths]]
    * twin over the page-link graph): frontier d = dst of frontier d−1 minus
    * everything already labeled — BFS discovers each node once, so the
    * unroll is exact. Frontier CTEs MATERIALIZED (each is referenced by the
    * next round AND the cumulative set). */
  private def shortestPathsOracleSql(depth: Int): String = {
    val rounds = (1 to depth).map { d =>
      s"""fr$d AS MATERIALIZED (SELECT DISTINCT e.b AS node, $d AS dist
            FROM edges e JOIN fr${d - 1} f ON f.node = e.a
            WHERE e.b NOT IN (SELECT node FROM all${d - 1})),
          all$d AS MATERIALIZED (SELECT node FROM all${d - 1}
            UNION ALL SELECT node FROM fr$d)"""
    }.mkString(",\n")
    val unioned = (0 to depth).map(d => s"SELECT node, dist FROM fr$d")
      .mkString(" UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS a, dst_url AS b
          FROM lnk),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
        fr0 AS MATERIALIZED (SELECT node, 0 AS dist FROM nodes
          WHERE regexp_matches(node, '/p/1($$|\\?)')),
        all0 AS (SELECT node FROM fr0),
        $rounds
        SELECT node AS page, dist FROM ($unioned)"""
  }

  /** [[graft.graph.KgGraph.harmonicFromSeeds]] twin: the per-seed variant
    * of the BFS unroll (frontier keyed by (seed, node), per-seed visited
    * exclusion), reciprocals summed as the exact integer 12/d before the
    * single final division. */
  private def harmonicOracleSql(depth: Int): String = {
    val rounds = (1 to depth).map { d =>
      s"""fr$d AS MATERIALIZED (SELECT DISTINCT f.seed, e.b AS node, $d AS dist
            FROM edges e JOIN fr${d - 1} f ON f.node = e.a
            WHERE NOT EXISTS (SELECT 1 FROM all${d - 1} a
                              WHERE a.seed = f.seed AND a.node = e.b)),
          all$d AS MATERIALIZED (SELECT seed, node FROM all${d - 1}
            UNION ALL SELECT seed, node FROM fr$d)"""
    }.mkString(",\n")
    val unioned = (1 to depth).map(d => s"SELECT seed, node, dist FROM fr$d")
      .mkString(" UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS a, dst_url AS b
          FROM lnk),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
        fr0 AS MATERIALIZED (SELECT node AS seed, node, 0 AS dist FROM nodes
          WHERE regexp_matches(node, '/p/1($$|\\?)')),
        all0 AS (SELECT seed, node FROM fr0),
        $rounds,
        reached AS (SELECT seed, node, dist FROM ($unioned))
        SELECT node AS page, CAST(COUNT(*) AS BIGINT) AS n_reached,
               ROUND(CAST(SUM(CAST(12 / dist AS BIGINT)) AS BIGINT) / 12.0, 6)
                 AS harmonic
        FROM reached GROUP BY 1"""
  }

  /** [[graft.graph.KgGraph.landmarkDistances]] twin: ONE per-seed BFS
    * unroll over sources ∪ landmarks (the harmonic oracle's (seed, node)
    * form, dist-0 rows kept — `d(l, l) = 0` carries the `v = l` estimate),
    * then the d(s,l) leg, the min landmark assembly, and the stretch. */
  private def landmarkOracleSql(depth: Int): String = {
    val rounds = (1 to depth).map { d =>
      s"""fr$d AS MATERIALIZED (SELECT DISTINCT f.seed, e.b AS node, $d AS dist
            FROM edges e JOIN fr${d - 1} f ON f.node = e.a
            WHERE NOT EXISTS (SELECT 1 FROM all${d - 1} a
                              WHERE a.seed = f.seed AND a.node = e.b)),
          all$d AS MATERIALIZED (SELECT seed, node FROM all${d - 1}
            UNION ALL SELECT seed, node FROM fr$d)"""
    }.mkString(",\n")
    val unioned = (0 to depth).map(d => s"SELECT seed, node, dist FROM fr$d")
      .mkString(" UNION ALL ")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT DISTINCT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS a, dst_url AS b
          FROM lnk),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
        srcs AS (SELECT node FROM nodes
                 WHERE regexp_matches(node, '/p/1($$|\\?)')),
        lms AS (SELECT node FROM nodes
                WHERE regexp_matches(node, '/p/2($$|\\?)')),
        fr0 AS MATERIALIZED (SELECT node AS seed, node, 0 AS dist FROM nodes
          WHERE regexp_matches(node, '/p/1($$|\\?)')
             OR regexp_matches(node, '/p/2($$|\\?)')),
        all0 AS (SELECT seed, node FROM fr0),
        $rounds,
        reached AS MATERIALIZED (SELECT seed, node, dist FROM ($unioned) u),
        sl AS (SELECT r.seed AS src, r.node AS l, r.dist AS d1
               FROM reached r
               JOIN srcs s ON s.node = r.seed
               JOIN lms m ON m.node = r.node),
        est AS (SELECT sl.src, r2.node, MIN(sl.d1 + r2.dist) AS landmark_d
                FROM sl JOIN reached r2 ON r2.seed = sl.l
                GROUP BY 1, 2),
        base AS (SELECT r.seed AS src, r.node, r.dist AS exact_d
                 FROM reached r JOIN srcs s ON s.node = r.seed
                 WHERE r.seed <> r.node)
        SELECT b.src, b.node AS page, b.exact_d, e.landmark_d,
          CASE WHEN e.landmark_d IS NULL THEN NULL
               ELSE ROUND(CAST(e.landmark_d AS DOUBLE) / b.exact_d, 4)
          END AS stretch
        FROM base b
        LEFT JOIN est e ON e.src = b.src AND e.node = b.node"""
  }

  /** [[graft.graph.KgGraph.attackRobustness]] twin, shared by the attack
    * (in-degree rank) and failure (portable-hash rank) curves. */
  private def robustnessOracleSql(random: Boolean): String = {
    val hubsCte =
      if (random)
        s"""hubs AS (SELECT node, ROW_NUMBER() OVER (ORDER BY
              ('0x' || substr(md5(node), 1, 15))::BIGINT, node) AS rn
            FROM nodes)"""
      else
        """hubs AS (SELECT node,
              ROW_NUMBER() OVER (ORDER BY deg DESC, node) AS rn
            FROM ind)"""
    val per = Seq(0, 5, 10).map { k =>
      s"""rem$k AS (SELECT node FROM hubs WHERE rn <= $k),
          undk$k AS (SELECT a, b FROM und
             WHERE a NOT IN (SELECT node FROM rem$k)
               AND b NOT IN (SELECT node FROM rem$k)),
          reach$k(a, b) AS (SELECT a, b FROM undk$k
             UNION
             SELECT r.a, u.b FROM reach$k r JOIN undk$k u ON r.b = u.a),
          comp$k AS (SELECT a, LEAST(a, MIN(b)) AS component
                     FROM reach$k GROUP BY a),
          giant$k AS (SELECT COALESCE(MAX(c), 1) AS g FROM
             (SELECT COUNT(*) AS c FROM comp$k GROUP BY component) z),
          nleft$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
             WHERE node NOT IN (SELECT node FROM rem$k))"""
    }.mkString(",\n")
    val rows = Seq(0, 5, 10).map { k =>
      s"""SELECT $k AS k_removed, (SELECT n FROM nleft$k) AS n_nodes,
            CAST((SELECT g FROM giant$k) AS BIGINT) AS giant_size,
            ROUND(CAST((SELECT g FROM giant$k) AS DOUBLE)
              / (SELECT n FROM nleft$k), 6) AS giant_frac"""
    }.mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${graft.ops.LinkGraph.linksCteSql},
        pe AS (SELECT DISTINCT
                 ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                 dst_url AS dst FROM lnk),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM pe UNION ALL SELECT dst FROM pe) u),
        und AS (SELECT src AS a, dst AS b FROM pe
                UNION SELECT dst, src FROM pe),
        ind AS (SELECT dst AS node, COUNT(*) AS deg FROM pe GROUP BY 1),
        $hubsCte,
        $per
        $rows"""
  }

  /** One oracle for BOTH domain-quota plans (single-window and two-phase). */
  /** Knowledge Vault fusion oracle: recompute all three extractor event
    * sets (direct = dict regex containment; lemma = the ann_lemma oracle's
    * lemmatized-text containment, set form; anchor = the
    * web_anchor_entities oracle's dict-over-anchors scan), then the SAME
    * noisy-OR with flag columns and literal priors generated from
    * [[graft.ops.Relations.ExtractorPriors]] in the SAME order (left-assoc
    * multiplication ⇒ IEEE-identical to the Column expression). */
  /** The [[graft.ops.Relations.tripleConfidence]] ground-truth chain as CTEs
    * ending at `conf(subj, obj, n_extractors, confidence)` — shared by the
    * kg_triple_confidence and kg_fact_fusion oracles. */
  private def tripleConfidenceCtes: String = {
    val priors = graft.ops.Relations.ExtractorPriors
    val flagCols = priors.map { case (e, _) =>
      s"MAX(CASE WHEN extractor = '$e' THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS f_$e"
    }.mkString(",\n               ")
    val missProduct = priors.map { case (e, p) =>
      s"(CAST(1 AS DOUBLE) - CAST($p AS DOUBLE) * f_$e)"
    }.mkString("\n            * ")
    val nSum = priors.map(e => s"f_${e._1}").mkString(" + ")
    s"""$dictCte, ${graft.ops.LinkGraph.linksCteSql},
        umap AS (SELECT doc_id, ${graft.ops.WebOps.canonUrlSqlOf("url")} AS subj
                 FROM urls),
        ev_d AS (SELECT DISTINCT u.subj, d.class_iri AS obj,
                   'direct' AS extractor
                 FROM documents doc JOIN umap u ON u.doc_id = doc.doc_id, dict d
                 WHERE regexp_matches(upper(doc.text), '\\b' || d.term || '\\b')),
        ldict AS (SELECT DISTINCT array_to_string(
                    list_transform(string_split(term, ' '), t -> ${lemmaCaseSql("t")}), ' ') AS term,
                    class_iri
                  FROM dict),
        ltxt AS (SELECT doc_id, string_agg(sep || lem, '' ORDER BY i) AS lt
                 FROM (SELECT doc_id, i, seps[i] AS sep,
                         (${lemmaCaseSql("upper(toks[i])")}) AS lem
                       FROM (SELECT doc_id,
                               regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks,
                               regexp_split_to_array(text, '[A-Za-z0-9_]+') AS seps,
                               unnest(generate_series(1,
                                 len(regexp_extract_all(text, '[A-Za-z0-9_]+')))) AS i
                             FROM documents))
                 GROUP BY doc_id),
        ev_l AS (SELECT DISTINCT u.subj, l.class_iri AS obj,
                   'lemma' AS extractor
                 FROM ltxt JOIN umap u USING (doc_id), ldict l
                 WHERE regexp_matches(ltxt.lt, '\\b' || l.term || '\\b')),
        ev_a AS (SELECT DISTINCT a.dst_url AS subj, d.class_iri AS obj,
                   'anchor' AS extractor
                 FROM (SELECT DISTINCT dst_url, anchor FROM lnk) a, dict d
                 WHERE regexp_matches(upper(a.anchor), '\\b' || d.term || '\\b')),
        ev AS (SELECT * FROM ev_d UNION ALL SELECT * FROM ev_l
               UNION ALL SELECT * FROM ev_a),
        fl AS (SELECT subj, obj,
               $flagCols
               FROM ev GROUP BY 1, 2),
        conf AS (SELECT subj, obj,
          CAST($nSum AS INT) AS n_extractors,
          ROUND(CAST(1 AS DOUBLE) -
            $missProduct, 6) AS confidence
        FROM fl)"""
  }

  /** [[graft.ops.Relations.negatives]] ground-truth chain (requires
    * dictCte + directCte upstream) ending at
    * `neg(subj, pred, obj, slot, neg_obj)` — shared by the kg_negatives
    * and kg_transe_step oracles. */
  private def negativesChainCtes: String =
    s"""pos AS (SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred,
                       class_iri AS obj FROM direct),
        ents AS (SELECT obj AS neg_obj,
            ROW_NUMBER() OVER (ORDER BY obj) - 1 AS eid
          FROM (SELECT DISTINCT obj FROM pos)),
        nn AS (SELECT COUNT(*) AS n FROM ents),
        cand AS (SELECT p.subj, p.pred, p.obj, CAST(s.slot AS INT) AS slot,
            ('0x' || substr(md5(p.subj || '|' || p.pred || '|' || p.obj
              || '|' || CAST(s.slot AS VARCHAR)), 1, 15))::BIGINT
              % (SELECT n FROM nn) AS eid
          FROM pos p, (SELECT unnest(generate_series(0, 1)) AS slot) s),
        withent AS (SELECT c.subj, c.pred, c.obj, c.slot, e.neg_obj
          FROM cand c JOIN ents e USING (eid)
          WHERE e.neg_obj <> c.obj),
        neg AS (SELECT w.subj, w.pred, w.obj, w.slot, w.neg_obj
          FROM withent w LEFT JOIN pos p2
            ON p2.subj = w.subj AND p2.pred = w.pred AND p2.obj = w.neg_obj
          WHERE p2.subj IS NULL)"""

  /** SQL-string helpers of the TransE oracle chain (shared by the step and
    * rank oracles): `pd` = per-(pair, dim) difference rows against a given
    * embedding/relation pair of tables, `ps` = per-pair ROUND(6) scores. */
  private def transePdSql(name: String, emb: String, rel: String) =
    s"""$name AS (SELECT n.subj, n.pred, n.obj, n.slot, n.neg_obj, dd.d,
          h.v + r.v - t.v AS dp, h.v + r.v - x.v AS dn
        FROM neg n
        CROSS JOIN dims dd
        JOIN $emb h ON h.ent = n.subj AND h.d = dd.d
        JOIN $rel r ON r.pred = n.pred AND r.d = dd.d
        JOIN $emb t ON t.ent = n.obj AND t.d = dd.d
        JOIN $emb x ON x.ent = n.neg_obj AND x.d = dd.d)"""

  private def transePsSql(name: String, from: String) =
    s"""$name AS (SELECT subj, pred, obj, slot, neg_obj,
          ROUND(SUM(dp * dp), 6) AS spos, ROUND(SUM(dn * dn), 6) AS sneg
        FROM $from GROUP BY 1, 2, 3, 4, 5)"""

  /** The shared TransE ground-truth prefix (requires dictCte + directCte
    * upstream): negatives chain → dims → bit-identical md5-derived init
    * embeddings → per-(pair, dim) diffs `pd0` → per-pair scores `ps0`. */
  /** The post-negatives TransE chain (init embeddings + pd0/ps0 scores) —
    * shared between the untyped and type-constrained negatives chains. */
  private def transeEmbScoreCtes: String = {
    val dim = graft.ops.KgEmbed.Dim
    val two60 = "1152921504606846976.0"
    def init(prefix: String, idExpr: String) =
      s"('0x' || substr(md5('$prefix' || $idExpr || ':' ||" +
        s" CAST(dd.d AS VARCHAR)), 1, 15))::BIGINT / $two60 * 2 - 1"
    s"""dims AS (SELECT unnest(generate_series(1, $dim)) AS d),
        kent AS (SELECT subj AS ent FROM pos UNION SELECT obj FROM pos),
        emb0 AS (SELECT ent, dd.d, ${init("e:", "ent")} AS v
                 FROM kent, dims dd),
        rel0 AS (SELECT pred, dd.d, ${init("r:", "pred")} AS v
                 FROM (SELECT DISTINCT pred FROM pos), dims dd),
        ${transePdSql("pd0", "emb0", "rel0")},
        ${transePsSql("ps0", "pd0")}"""
  }

  private def transeChainCtes: String =
    s"""$negativesChainCtes,
        $transeEmbScoreCtes"""

  /** [[graft.ops.Relations.negativesTyped]] twin: the same corruption
    * machinery with the pool partitioned by the object's MIN semantic
    * type — per-type dense eids, per-type pool sizes, the same portable
    * hash mod the TYPE pool. Emits the same `pos`/`neg` CTE names so
    * [[transeEmbScoreCtes]] composes unchanged. */
  private def negativesTypedChainCtes: String =
    s"""pos AS (SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred,
                       class_iri AS obj FROM direct),
        semtypes(class_iri, tui) AS (
          SELECT * FROM (VALUES ${OntologyFixture.tuisValues}) v(a, b)),
        ot AS (SELECT class_iri AS obj, MIN(tui) AS tui
               FROM semtypes GROUP BY 1),
        ents AS (SELECT neg_obj, tui,
            ROW_NUMBER() OVER (PARTITION BY tui ORDER BY neg_obj) - 1 AS eid
          FROM (SELECT DISTINCT o.obj AS neg_obj, t.tui
                FROM (SELECT DISTINCT obj FROM pos) o
                JOIN ot t ON t.obj = o.obj) z),
        tsz AS (SELECT tui, COUNT(*) AS n_t FROM ents GROUP BY 1),
        cand AS (SELECT p.subj, p.pred, p.obj, t.tui,
            CAST(s.slot AS INT) AS slot,
            ('0x' || substr(md5(p.subj || '|' || p.pred || '|' || p.obj
              || '|' || CAST(s.slot AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM pos p JOIN ot t ON t.obj = p.obj,
               (SELECT unnest(generate_series(0, 1)) AS slot) s),
        withent AS (SELECT c.subj, c.pred, c.obj, c.slot, e.neg_obj
          FROM cand c
          JOIN tsz z ON z.tui = c.tui
          JOIN ents e ON e.tui = c.tui AND e.eid = c.h % z.n_t
          WHERE e.neg_obj <> c.obj),
        neg AS (SELECT w.subj, w.pred, w.obj, w.slot, w.neg_obj
          FROM withent w LEFT JOIN pos p2
            ON p2.subj = w.subj AND p2.pred = w.pred AND p2.obj = w.neg_obj
          WHERE p2.subj IS NULL)"""

  /** kg_transe_rank_typed oracle: the typed negatives chain + the shared
    * init/score chain + the identical rank rollup. */
  private def transeRankTypedOracleSql: String = materializeCtes {
    s"""WITH $dictCte, $directCte,
        $negativesTypedChainCtes,
        $transeEmbScoreCtes,
        rk AS (SELECT subj, pred, obj,
                 1 + SUM(CASE WHEN sneg <= spos THEN 1 ELSE 0 END) AS rank
               FROM ps0 GROUP BY 1, 2, 3)
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
          ROUND(AVG(CAST(1.0 AS DOUBLE) / rank), 6) AS mrr,
          ROUND(AVG(CASE WHEN rank = 1 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END), 6) AS hits1
        FROM rk GROUP BY pred"""
  }

  /** One oracle training epoch `e`: active pairs from `ps{e}`, gradient
    * means, updated `emb{e+1}`/`rel{e+1}`, re-scored `pd{e+1}`/`ps{e+1}` —
    * the repeatable block behind the step and epochs oracles (gradient
    * legs, update arithmetic, and the margin literal mirror
    * [[graft.ops.KgEmbed]] term for term). */
  private def transeEpochBlockSql(e: Int): String = {
    val margin = graft.ops.KgEmbed.Margin
    val lr = graft.ops.KgEmbed.Lr
    s"""act$e AS (SELECT pd$e.* FROM pd$e
                JOIN ps$e USING (subj, pred, obj, slot, neg_obj)
                WHERE $margin + spos - sneg > 0),
        egrad$e AS (SELECT ent, d, ROUND(AVG(g), 6) AS g FROM (
              SELECT subj AS ent, d, 2.0 * (dp - dn) AS g FROM act$e
              UNION ALL SELECT obj AS ent, d, -2.0 * dp AS g FROM act$e
              UNION ALL SELECT neg_obj AS ent, d, 2.0 * dn AS g FROM act$e)
            GROUP BY ent, d),
        rgrad$e AS (SELECT pred, d, ROUND(AVG(2.0 * (dp - dn)), 6) AS g
                  FROM act$e GROUP BY pred, d),
        emb${e + 1} AS (SELECT x.ent, x.d, x.v - $lr * COALESCE(g.g, 0.0) AS v
                 FROM emb$e x LEFT JOIN egrad$e g
                   ON g.ent = x.ent AND g.d = x.d),
        rel${e + 1} AS (SELECT x.pred, x.d, x.v - $lr * COALESCE(g.g, 0.0) AS v
                 FROM rel$e x LEFT JOIN rgrad$e g
                   ON g.pred = x.pred AND g.d = x.d),
        ${transePdSql(s"pd${e + 1}", s"emb${e + 1}", s"rel${e + 1}")},
        ${transePsSql(s"ps${e + 1}", s"pd${e + 1}")}"""
  }

  /** kg_transe_step oracle: one [[transeEpochBlockSql]] epoch, then the
    * before/after pair-loss rollup. */
  /** DuckDB re-inlines CTEs referenced multiple times; the chained epoch
    * blocks re-reference pd/ps/emb CTEs combinatorially and a plain WITH
    * took minutes where `AS MATERIALIZED` runs in under a second — so the
    * transe oracles pin every CTE (DuckDB-only syntax; Spark never parses
    * these strings). */
  private def materializeCtes(sql: String): String =
    sql.replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")

  private def transeStepOracleSql: String = materializeCtes {
    val margin = graft.ops.KgEmbed.Margin
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        ${transeEpochBlockSql(0)},
        pl AS (SELECT p0.pred,
                 GREATEST(0.0, $margin + p0.spos - p0.sneg) AS lb,
                 GREATEST(0.0, $margin + p1.spos - p1.sneg) AS la
               FROM ps0 p0 JOIN ps1 p1
                 USING (subj, pred, obj, slot, neg_obj))
        SELECT pred, COUNT(*) AS n_pairs,
          CAST(SUM(CASE WHEN lb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
          ROUND(AVG(lb), 6) AS loss_before, ROUND(AVG(la), 6) AS loss_after
        FROM pl GROUP BY pred"""
  }

  /** kg_transe_epochs oracle: the unrolled training loop — `epochs` chained
    * [[transeEpochBlockSql]] blocks, one loss row per (epoch, pred) from
    * each epoch's pair scores (epoch 0 = the hash init). */
  private def transeEpochsOracleSql(epochs: Int): String = materializeCtes {
    val margin = graft.ops.KgEmbed.Margin
    val blocks = (0 until epochs).map(transeEpochBlockSql).mkString(",\n")
    val losses = (0 to epochs).map { e =>
      s"""SELECT $e AS epoch, pred,
            ROUND(AVG(GREATEST(0.0, $margin + spos - sneg)), 6) AS loss
          FROM ps$e GROUP BY pred"""
    }.mkString("\nUNION ALL\n")
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        $blocks
        $losses"""
  }

  /** kg_transe_rank oracle: filtered local-candidate ranking at the init —
    * rank = 1 + |corruptions scoring ≤ the positive| (ties count against,
    * [[graft.ops.KgEmbed.transeRank]]'s contract), then the per-predicate
    * MRR / hits@1 rollup. */
  private def transeRankOracleSql(epochs: Int = 0): String = materializeCtes {
    val blocks =
      if (epochs == 0) ""
      else (0 until epochs).map(transeEpochBlockSql).mkString(",\n") + ","
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        $blocks
        rk AS (SELECT subj, pred, obj,
                 1 + SUM(CASE WHEN sneg <= spos THEN 1 ELSE 0 END) AS rank
               FROM ps$epochs GROUP BY 1, 2, 3)
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
          ROUND(AVG(CAST(1.0 AS DOUBLE) / rank), 6) AS mrr,
          ROUND(AVG(CASE WHEN rank = 1 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END), 6) AS hits1
        FROM rk GROUP BY pred"""
  }

  /** kg_distmult_rank oracle ([[graft.ops.KgEmbed.distmultRank]] twin):
    * the shared negatives/init chain, per-(pair, dim) PRODUCTS instead of
    * the TransE diffs, ROUND(6) per-pair dots, then the higher-is-better
    * filtered ranking (`sneg >= spos` beats) and the same per-predicate
    * rollup. */
  private def distmultRankOracleSql: String = materializeCtes {
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        dmd AS (SELECT n.subj, n.pred, n.obj, n.slot, n.neg_obj, dd.d,
            h.v * r.v * t.v AS pp, h.v * r.v * x.v AS pn
          FROM neg n
          CROSS JOIN dims dd
          JOIN emb0 h ON h.ent = n.subj AND h.d = dd.d
          JOIN rel0 r ON r.pred = n.pred AND r.d = dd.d
          JOIN emb0 t ON t.ent = n.obj AND t.d = dd.d
          JOIN emb0 x ON x.ent = n.neg_obj AND x.d = dd.d),
        dms AS (SELECT subj, pred, obj, slot, neg_obj,
            ROUND(SUM(pp), 6) AS spos, ROUND(SUM(pn), 6) AS sneg
          FROM dmd GROUP BY 1, 2, 3, 4, 5),
        drk AS (SELECT subj, pred, obj,
                 1 + SUM(CASE WHEN sneg >= spos THEN 1 ELSE 0 END) AS rank
               FROM dms GROUP BY 1, 2, 3)
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
          ROUND(AVG(CAST(1.0 AS DOUBLE) / rank), 6) AS mrr,
          ROUND(AVG(CASE WHEN rank = 1 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END), 6) AS hits1
        FROM drk GROUP BY pred"""
  }

  /** Shared CTE chain for the JSON-LD oracles — `jlpg` (synthesized pages)
    * → `js` (regex-cut script body) → `f` (json_extract_string fields) →
    * `jtr` (the deduplicated triple set, [[graft.ops.Relations
    * .jsonLdTriples]]'s twin). */
  private def jsonLdTriplesCtes: String =
    s"""${graft.ops.Relations.jsonLdPagesCteSql},
        js AS (SELECT url, regexp_extract(html,
                 '${graft.ops.Relations.JsonLdScriptRe}', 1) AS j
               FROM jlpg),
        f AS (SELECT url, json_extract_string(j, '$$."@type"') AS ty,
                json_extract_string(j, '$$.name') AS nm,
                json_extract_string(j, '$$.author."@type"') AS aty,
                json_extract_string(j, '$$.author.name') AS anm
              FROM js),
        jtr AS (SELECT DISTINCT subj, pred, obj FROM (
          SELECT url AS subj, 'rdf:type' AS pred, 'schema:' || ty AS obj
          FROM f WHERE ty IS NOT NULL
          UNION ALL
          SELECT url, 'schema:name', nm FROM f WHERE nm IS NOT NULL
          UNION ALL
          SELECT url, 'schema:author', url || '#author'
          FROM f WHERE anm IS NOT NULL
          UNION ALL
          SELECT url || '#author', 'rdf:type', 'schema:' || aty
          FROM f WHERE anm IS NOT NULL AND aty IS NOT NULL
          UNION ALL
          SELECT url || '#author', 'schema:name', anm
          FROM f WHERE anm IS NOT NULL))"""

  /** kg_complex_rank oracle ([[graft.ops.KgEmbed.complexRank]] twin): the
    * shared negatives/init chain; per complex dim j (re at d = j, im at
    * d = j + Dim/2) the four-term Re(⟨h, r, conj(t)⟩) product, ROUND(6)
    * per-pair sums, the higher-is-better filtered ranking, the same
    * per-predicate rollup. */
  private def complexRankOracleSql: String = materializeCtes {
    val half = graft.ops.KgEmbed.Dim / 2
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        cxd AS (SELECT n.subj, n.pred, n.obj, n.slot, n.neg_obj, dd.d,
            hre.v * rre.v * tre.v + him.v * rre.v * tim.v
              + hre.v * rim.v * tim.v - him.v * rim.v * tre.v AS pp,
            hre.v * rre.v * xre.v + him.v * rre.v * xim.v
              + hre.v * rim.v * xim.v - him.v * rim.v * xre.v AS pn
          FROM neg n
          CROSS JOIN (SELECT d FROM dims WHERE d <= $half) dd
          JOIN emb0 hre ON hre.ent = n.subj AND hre.d = dd.d
          JOIN emb0 him ON him.ent = n.subj AND him.d = dd.d + $half
          JOIN rel0 rre ON rre.pred = n.pred AND rre.d = dd.d
          JOIN rel0 rim ON rim.pred = n.pred AND rim.d = dd.d + $half
          JOIN emb0 tre ON tre.ent = n.obj AND tre.d = dd.d
          JOIN emb0 tim ON tim.ent = n.obj AND tim.d = dd.d + $half
          JOIN emb0 xre ON xre.ent = n.neg_obj AND xre.d = dd.d
          JOIN emb0 xim ON xim.ent = n.neg_obj AND xim.d = dd.d + $half),
        cxs AS (SELECT subj, pred, obj, slot, neg_obj,
            ROUND(SUM(pp), 6) AS spos, ROUND(SUM(pn), 6) AS sneg
          FROM cxd GROUP BY 1, 2, 3, 4, 5),
        crk AS (SELECT subj, pred, obj,
                 1 + SUM(CASE WHEN sneg >= spos THEN 1 ELSE 0 END) AS rank
               FROM cxs GROUP BY 1, 2, 3)
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
          ROUND(AVG(CAST(1.0 AS DOUBLE) / rank), 6) AS mrr,
          ROUND(AVG(CASE WHEN rank = 1 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END), 6) AS hits1
        FROM crk GROUP BY pred"""
  }

  /** kg_rotate_rank oracle ([[graft.ops.KgEmbed.rotateRank]] twin): the
    * same negatives/init CTE chain; per complex dim the rotation's
    * cos/sin come from the SAME rational Weierstrass expressions with a
    * MIRRORED operation tree (pure IEEE ±/×/÷ — bit-exact cross-engine,
    * no library cos/sin), squared-distance terms summed + ROUND(6), then
    * the lower-is-better filtered ranking (sneg ≤ spos beats) and the
    * per-predicate rollup. */
  private def rotateRankOracleSql: String = materializeCtes {
    val half = graft.ops.KgEmbed.Dim / 2
    def dist(hre: String, him: String, tre: String, tim: String) =
      s"""(($hre.v * ((1.0 - rre.v * rre.v) / (1.0 + rre.v * rre.v))
             - $him.v * ((2.0 * rre.v) / (1.0 + rre.v * rre.v))) - $tre.v)
           * (($hre.v * ((1.0 - rre.v * rre.v) / (1.0 + rre.v * rre.v))
             - $him.v * ((2.0 * rre.v) / (1.0 + rre.v * rre.v))) - $tre.v)
         + (($hre.v * ((2.0 * rre.v) / (1.0 + rre.v * rre.v))
             + $him.v * ((1.0 - rre.v * rre.v) / (1.0 + rre.v * rre.v))) - $tim.v)
           * (($hre.v * ((2.0 * rre.v) / (1.0 + rre.v * rre.v))
             + $him.v * ((1.0 - rre.v * rre.v) / (1.0 + rre.v * rre.v))) - $tim.v)"""
    s"""WITH $dictCte, $directCte, $transeChainCtes,
        rtd AS (SELECT n.subj, n.pred, n.obj, n.slot, n.neg_obj, dd.d,
            ${dist("hre", "him", "tre", "tim")} AS pp,
            ${dist("hre", "him", "xre", "xim")} AS pn
          FROM neg n
          CROSS JOIN (SELECT d FROM dims WHERE d <= $half) dd
          JOIN emb0 hre ON hre.ent = n.subj AND hre.d = dd.d
          JOIN emb0 him ON him.ent = n.subj AND him.d = dd.d + $half
          JOIN rel0 rre ON rre.pred = n.pred AND rre.d = dd.d
          JOIN emb0 tre ON tre.ent = n.obj AND tre.d = dd.d
          JOIN emb0 tim ON tim.ent = n.obj AND tim.d = dd.d + $half
          JOIN emb0 xre ON xre.ent = n.neg_obj AND xre.d = dd.d
          JOIN emb0 xim ON xim.ent = n.neg_obj AND xim.d = dd.d + $half),
        rts AS (SELECT subj, pred, obj, slot, neg_obj,
            ROUND(SUM(pp), 6) AS spos, ROUND(SUM(pn), 6) AS sneg
          FROM rtd GROUP BY 1, 2, 3, 4, 5),
        rrk AS (SELECT subj, pred, obj,
                 1 + SUM(CASE WHEN sneg <= spos THEN 1 ELSE 0 END) AS rank
               FROM rts GROUP BY 1, 2, 3)
        SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
          ROUND(AVG(CAST(1.0 AS DOUBLE) / rank), 6) AS mrr,
          ROUND(AVG(CASE WHEN rank = 1 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END), 6) AS hits1
        FROM rrk GROUP BY pred"""
  }

  /** kg_embed_neighbors oracle ([[graft.ops.KgEmbed.conceptNeighbors]]
    * twin): the trained `emb{epochs}` chain restricted to concept entities
    * (the positives' objects), pairwise squared-L2 per (a, b) as a
    * dim-keyed join + ROUND(6) sum (the engine's ascending fixed-order sum
    * agrees inside the contract), then the per-concept top-k with the
    * (dist, neighbor) tiebreak. */
  private def embedNeighborsOracleSql(epochs: Int, k: Int): String =
    materializeCtes {
      val blocks = (0 until epochs).map(transeEpochBlockSql).mkString(",\n")
      s"""WITH $dictCte, $directCte, $transeChainCtes,
          $blocks,
          cemb AS (SELECT e.ent, e.d, e.v FROM emb$epochs e
                   JOIN (SELECT DISTINCT obj FROM pos) c ON e.ent = c.obj),
          pw AS (SELECT a.ent AS concept, b.ent AS neighbor,
                   ROUND(SUM((a.v - b.v) * (a.v - b.v)), 6) AS dist
                 FROM cemb a JOIN cemb b ON a.d = b.d AND a.ent <> b.ent
                 GROUP BY 1, 2),
          rk AS (SELECT concept, neighbor, dist,
                   ROW_NUMBER() OVER (PARTITION BY concept
                     ORDER BY dist, neighbor) AS rank
                 FROM pw)
          SELECT concept, neighbor, dist, CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= $k"""
    }

  /** curate_lr_distill oracle ([[graft.ops.Classifier.lrDistill]] twin):
    * the gopher feature chain, then `steps` unrolled full-batch logistic
    * steps — weights carried through CTEs as exact arithmetic on ROUND(6)
    * mean gradients, metrics ROUND(6) per step. */
  private def lrDistillOracleSql(lr: Double, steps: Int): String = materializeCtes {
    s"""WITH ${lrDistillChainCtes(lr, steps)}
        ${(0 to steps).map(k => s"SELECT step, logloss, accuracy FROM m$k")
          .mkString("\nUNION ALL\n")}"""
  }

  /** curate_auc oracle ([[graft.ops.Classifier.aucReport]] twin): the
    * trained-weight chain's final `w{steps}` scores every doc (the same
    * left-associated dot-product order, binned ROUND(4)), then the binned
    * Mann–Whitney fold — all-BIGINT rank arithmetic, one pinned final
    * division ROUND(6). */
  private def lrAucOracleSql(lr: Double, steps: Int): String = materializeCtes {
    val nf = graft.ops.Classifier.NFeatures
    val dp = graft.ops.Classifier.AucBinDp
    val dot = (0 until nf).map(j => s"w.w$j * f.x$j").mkString(" + ")
    s"""WITH ${lrDistillChainCtes(lr, steps)},
        zt AS (SELECT ROUND($dot, $dp) AS z, CAST(f.y AS BIGINT) AS y
               FROM f, w$steps w),
        gz AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(y) AS BIGINT) AS pos
               FROM zt GROUP BY z),
        cz AS (SELECT pos, cnt,
                 COALESCE(SUM(cnt) OVER (ORDER BY z
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
               FROM gz)
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
               ROUND((SUM(pos * (2 * cum + cnt + 1)) - SUM(pos) * (SUM(pos) + 1))
                 / (2.0 * SUM(pos) * (SUM(cnt) - SUM(pos))), 6) AS auc
        FROM cz"""
  }

  /** curate_brier oracle ([[graft.ops.Classifier.brierReport]] twin): the
    * same binned-z chain, per-bin `pos·(p−1)² + (cnt−pos)·p²` with
    * p = σ(z) on the rounded z, one division, ROUND(6). */
  private def lrBrierOracleSql(lr: Double, steps: Int): String =
    materializeCtes {
      val nf = graft.ops.Classifier.NFeatures
      val dp = graft.ops.Classifier.AucBinDp
      val dot = (0 until nf).map(j => s"w.w$j * f.x$j").mkString(" + ")
      s"""WITH ${lrDistillChainCtes(lr, steps)},
          zt AS (SELECT ROUND($dot, $dp) AS z, CAST(f.y AS BIGINT) AS y
                 FROM f, w$steps w),
          gz AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(y) AS BIGINT) AS pos
                 FROM zt GROUP BY z),
          pb AS (SELECT cnt, pos, 1.0 / (1.0 + exp(-z)) AS p FROM gz)
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs,
            ROUND(SUM(pos * (p - 1.0) * (p - 1.0) + (cnt - pos) * p * p)
              / SUM(cnt), 6) AS brier
          FROM pb"""
    }

  /** The shared distillation CTE chain (gopher features + `steps` unrolled
    * GD steps), reused by the curate_lr_distill and curate_auc oracles —
    * ends with per-step metrics `m0..m{steps}` and weights `w0..w{steps}`. */
  private def lrDistillChainCtes(lr: Double, steps: Int): String = {
    val nf = graft.ops.Classifier.NFeatures
    val stepCtes = (0 to steps).map { k =>
      val pcte =
        s"""p$k AS (SELECT f.*, ${(0 until nf).map(j => s"w.w$j").mkString(", ")},
              1.0 / (1.0 + exp(-(${(0 until nf).map(j => s"w.w$j * f.x$j").mkString(" + ")}))) AS p
            FROM f, w$k w)"""
      val mcte =
        s"""m$k AS (SELECT $k AS step,
              ROUND(AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS logloss,
              ROUND(AVG(CASE WHEN (p >= 0.5) = (y = 1.0)
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6) AS accuracy
            FROM p$k)"""
      val wcte =
        if (k < steps) Some(s"""w${k + 1} AS (SELECT
              ${(0 until nf).map(j =>
                s"MAX(w$j) - $lr * ROUND(AVG((p - y) * x$j), 6) AS w$j").mkString(",\n              ")}
            FROM p$k)""")
        else None
      (Seq(pcte, mcte) ++ wcte).mkString(",\n")
    }.mkString(",\n")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        v AS (SELECT doc_id,
                len(tk) AS n_words,
                list_sum(list_transform(tk, x -> length(x)))
                  / CAST(len(tk) AS DOUBLE) AS mean_len,
                len(list_filter(tk, x -> NOT regexp_matches(x, '[A-Za-z0-9]')))
                  / CAST(len(tk) AS DOUBLE) AS sym_ratio,
                len(list_filter(tk, x -> x IN ('the', 'a'))) AS stop_hits
              FROM t),
        f AS (SELECT CAST(1.0 AS DOUBLE) AS x0,
                n_words / 100.0 AS x1,
                ROUND(mean_len, 4) AS x2,
                ROUND(sym_ratio, 4) * 10.0 AS x3,
                stop_hits / 10.0 AS x4,
                CASE WHEN (n_words BETWEEN 50 AND 100000
                  AND mean_len BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
                  AND sym_ratio <= CAST(0.1 AS DOUBLE)
                  AND stop_hits >= 2)
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y
              FROM v),
        w0 AS (SELECT ${(0 until nf).map(j => s"CAST(0.0 AS DOUBLE) AS w$j").mkString(", ")}),
        $stepCtes"""
  }

  private def tripleConfidenceOracleSql: String =
    s"""WITH $tripleConfidenceCtes
        SELECT subj, obj, n_extractors, confidence FROM conf"""

  /** kg_fusion_audit oracle ([[graft.ops.Relations.fusionAudit]] twin):
    * the conf chain LEFT joined against the direct-extractor published set
    * on the fact key, decile bucketed by the exact floor (confidences are
    * ROUND(6) combinations of the literal priors — the same doubles in
    * both engines). */
  private def fusionAuditOracleSql: String =
    s"""WITH $tripleConfidenceCtes,
        cal AS (SELECT c.confidence,
                  CASE WHEN g.subj IS NOT NULL THEN 1 ELSE 0 END AS g
                FROM conf c
                LEFT JOIN (SELECT DISTINCT subj, obj FROM ev_d) g
                  ON g.subj = c.subj AND g.obj = c.obj)
        SELECT CAST(FLOOR(confidence * 10) AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_facts,
               CAST(SUM(g) AS BIGINT) AS n_in_kg,
               ROUND(AVG(confidence), 6) AS mean_conf,
               ROUND(SUM(g) * 1.0 / COUNT(*), 6) AS in_kg_rate
        FROM cal GROUP BY 1"""

  /** kg_truthfinder / kg_source_trust shared chain
    * ([[graft.ops.Relations.truthFinder]] twins): the `fl` flag columns
    * from [[tripleConfidenceCtes]] cast to exact ints, the signature-count
    * rollup, then [[graft.ops.Relations.TfRounds]] unrolled rounds of the
    * trust↔confidence recursion — the noisy-OR with PINNED multiplication
    * order over the current trust row, confidences carried as micro-unit
    * BIGINTs so the claims-weighted trust mean is integer arithmetic until
    * one final pinned division (IEEE-identical to the Column code). Ends at
    * `tf_sig`, `tf_conf<R>`, `tf_trust<R>`. */
  private def truthFinderCtes: String = {
    val srcs = graft.ops.Relations.ExtractorPriors.map(_._1)
    val prior = graft.ops.Relations.TfPrior
    val nR = graft.ops.Relations.TfRounds
    val fs = srcs.map(e => s"f_$e").mkString(", ")
    val rounds = (1 to nR).map { r =>
      val miss = srcs
        .map(e => s"(CAST(1 AS DOUBLE) - t.t_$e * c.f_$e)")
        .mkString(" * ")
      val trustCols = srcs.map { e =>
        s"""CASE WHEN SUM(CASE WHEN f_$e = 1 THEN n ELSE 0 END) > 0
             THEN ROUND(SUM(CASE WHEN f_$e = 1 THEN n * conf6 ELSE 0 END)
               / (SUM(CASE WHEN f_$e = 1 THEN n ELSE 0 END) * 1000000.0), 6)
             ELSE CAST($prior AS DOUBLE) END AS t_$e"""
      }.mkString(",\n             ")
      s"""tf_conf$r AS (SELECT ${srcs.map(e => s"c.f_$e").mkString(", ")}, c.n,
            CAST(ROUND((CAST(1 AS DOUBLE) - $miss) * 1000000.0, 0) AS BIGINT)
              AS conf6
          FROM tf_cnt c, tf_trust${r - 1} t),
          tf_trust$r AS (SELECT $trustCols FROM tf_conf$r)"""
    }.mkString(",\n        ")
    s"""$tripleConfidenceCtes,
        tf_sig AS (SELECT subj, obj,
            ${srcs.map(e => s"CAST(f_$e AS BIGINT) AS f_$e").mkString(", ")}
          FROM fl),
        tf_cnt AS (SELECT $fs, COUNT(*) AS n FROM tf_sig
                   GROUP BY ${srcs.indices.map(_ + 1).mkString(", ")}),
        tf_trust0 AS (SELECT
          ${srcs.map(e => s"CAST($prior AS DOUBLE) AS t_$e").mkString(", ")}),
        $rounds"""
  }

  private def truthFinderOracleSql: String = {
    val srcs = graft.ops.Relations.ExtractorPriors.map(_._1)
    val nR = graft.ops.Relations.TfRounds
    s"""WITH $truthFinderCtes
        SELECT s.subj, s.obj,
               CAST(${srcs.map(e => s"s.f_$e").mkString(" + ")} AS INT)
                 AS n_extractors,
               c.conf6 / 1000000.0 AS confidence
        FROM tf_sig s JOIN tf_conf$nR c
          USING (${srcs.map(e => s"f_$e").mkString(", ")})"""
  }

  private def sourceTrustOracleSql: String = {
    val srcs = graft.ops.Relations.ExtractorPriors.map(_._1)
    val nR = graft.ops.Relations.TfRounds
    val legs = srcs.map { e =>
      s"""SELECT '$e' AS extractor, t_$e AS trust,
            (SELECT CAST(SUM(CASE WHEN f_$e = 1 THEN n ELSE 0 END) AS BIGINT)
             FROM tf_conf$nR) AS n_facts
          FROM tf_trust$nR"""
    }.mkString("\n        UNION ALL ")
    s"""WITH $truthFinderCtes
        $legs"""
  }

  /** web_partition_lp oracle ([[graft.ops.LinkGraph.partitionLp]] twin):
    * the hash init, then each LP round unrolled — neighbor-label counts,
    * P-row loads, the same ROUND(6) score + stickiness, argmax via
    * ROW_NUMBER (score DESC, part ASC — the max(struct) tiebreak), label
    * carry-forward for isolated nodes — then the edge-cut rollup. */
  private def partitionLpOracleSql: String = {
    val p = graft.ops.LinkGraph.LpParts
    val (alpha, sticky) =
      (graft.ops.LinkGraph.LpAlpha, graft.ops.LinkGraph.LpSticky)
    val rounds = (1 to graft.ops.LinkGraph.LpRounds).map { r =>
      s"""cnt$r AS MATERIALIZED (SELECT u.a AS node, l.part, COUNT(*) AS cnt
            FROM und u JOIN lab${r - 1} l ON l.node = u.b GROUP BY 1, 2),
          load$r AS (SELECT part, COUNT(*) AS load FROM lab${r - 1} GROUP BY 1),
          sc$r AS (SELECT c.node, c.part,
              ROUND(c.cnt - $alpha * ld.load / (SELECT n FROM nn), 6) +
                CASE WHEN c.part = cur.part THEN $sticky ELSE 0.0 END AS s
            FROM cnt$r c JOIN load$r ld USING (part)
            JOIN lab${r - 1} cur ON cur.node = c.node),
          best$r AS (SELECT node, part FROM (
              SELECT node, part, ROW_NUMBER() OVER (PARTITION BY node
                ORDER BY s DESC, part) AS rn FROM sc$r) WHERE rn = 1),
          lab$r AS MATERIALIZED (SELECT l.node, COALESCE(b.part, l.part) AS part
            FROM lab${r - 1} l LEFT JOIN best$r b USING (node))"""
    }.mkString(",\n")
    val last = s"lab${graft.ops.LinkGraph.LpRounds}"
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS MATERIALIZED (SELECT
            ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src, dst_url AS dst
          FROM lnk GROUP BY 1, 2),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        und AS MATERIALIZED (SELECT DISTINCT a, b FROM
            (SELECT src AS a, dst AS b FROM edges
             UNION ALL SELECT dst, src FROM edges)
          WHERE a <> b),
        lab0 AS (SELECT node,
            ('0x' || substr(md5(node), 1, 15))::BIGINT % $p AS part
          FROM nodes),
        $rounds,
        ep AS (SELECT l1.part AS ps, l2.part AS pd
               FROM edges e
               JOIN $last l1 ON l1.node = e.src
               JOIN $last l2 ON l2.node = e.dst),
        es AS (SELECT ps AS part, CAST(COUNT(*) AS BIGINT) AS n_edges,
                 CAST(SUM(CASE WHEN ps = pd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_local
               FROM ep GROUP BY 1)
        SELECT l.part, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               ANY_VALUE(es.n_edges) AS n_edges,
               ANY_VALUE(es.n_local) AS n_local,
               ROUND(ANY_VALUE(es.n_local) * 1.0 / ANY_VALUE(es.n_edges), 6)
                 AS pct_local
        FROM $last l LEFT JOIN es ON es.part = l.part
        GROUP BY l.part"""
  }

  /** web_edge_cut oracle ([[graft.ops.LinkGraph.edgeCutStats]] twin): the
    * pageEdges set, each endpoint placed by the portable md5-60 hash mod
    * the layout width, per-partition local-edge rollup. */
  private def edgeCutOracleSql: String = {
    val p = graft.ops.LinkGraph.EdgeCutPartitions
    def h(c: String) = s"(('0x' || substr(md5($c), 1, 15))::BIGINT % $p)"
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        edges AS (SELECT ${graft.ops.WebOps.canonUrlSqlOf("src_url")} AS src,
                    dst_url AS dst
                  FROM lnk GROUP BY 1, 2)
        SELECT ${h("src")} AS part,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN ${h("src")} = ${h("dst")} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_local,
               ROUND(SUM(CASE WHEN ${h("src")} = ${h("dst")} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS pct_local
        FROM edges GROUP BY 1"""
  }

  /** kg_fact_fusion oracle: per-subject top-2 by (confidence DESC, obj),
    * winner row + margin vs the runner-up — the same pivot the Column code
    * does after its WindowGroupLimit top-2. */
  private def factFusionOracleSql: String =
    s"""WITH $tripleConfidenceCtes,
        r AS (SELECT subj, obj, n_extractors, confidence,
                row_number() OVER (PARTITION BY subj
                  ORDER BY confidence DESC, obj) AS rn FROM conf)
        SELECT subj,
          MAX(CASE WHEN rn = 1 THEN obj END) AS obj,
          MAX(CASE WHEN rn = 1 THEN confidence END) AS confidence,
          MAX(CASE WHEN rn = 1 THEN n_extractors END) AS n_extractors,
          ROUND(MAX(CASE WHEN rn = 1 THEN confidence END)
            - COALESCE(MAX(CASE WHEN rn = 2 THEN confidence END),
                       CAST(0 AS DOUBLE)), 6) AS margin
        FROM r WHERE rn <= 2 GROUP BY subj"""

  /** One UNION ALL leg per [[graft.ops.Relations.HearstRules]] entry, over
    * the `hpage` CTE — the SAME regex strings, group orientation, and
    * occurrence-index zip as the Column code. */
  /** ONE per-rule regex group-zip skeleton (two capture groups extracted,
    * zipped by occurrence index) shared by the Hearst AND OpenRE oracle
    * legs — a fix to the zip/indexing shape lands in one place. */
  private def regexPairLegSql(table: String, re: String,
                              selectList: String): String =
    s"""SELECT doc_id, $selectList
          FROM (SELECT doc_id, a, b,
                  unnest(generate_series(1, len(a))) AS i
                FROM (SELECT doc_id,
                        regexp_extract_all(text, '$re', 1) AS a,
                        regexp_extract_all(text, '$re', 2) AS b
                      FROM $table))"""

  private def hearstLegsSql: String =
    graft.ops.Relations.HearstRules.map { case (name, re, swapped) =>
      val (hy, ho) = if (swapped) ("b[i]", "a[i]") else ("a[i]", "b[i]")
      regexPairLegSql("hpage", re,
        s"lower($hy) AS hypernym, lower($ho) AS hyponym, '$name' AS pattern")
    }.mkString("\n           UNION ALL\n           ")

  /** Per-frame extraction legs of the `kg_openre` oracle (the shared
    * [[regexPairLegSql]] skeleton over [[graft.ops.Relations.VerbRules]]). */
  private def openreLegsSql: String =
    graft.ops.Relations.VerbRules.map { case (name, re) =>
      regexPairLegSql("rpage", re,
        s"lower(a[i]) AS subj_surface, '$name' AS rel, lower(b[i]) AS obj_surface")
    }.mkString("\n           UNION ALL\n           ")

  /** web_anf oracle ([[graft.graph.KgGraph.anf]] twin): unrolled FM-sketch
    * rounds — init = lowest set bit of the 30-bit-masked md5 hash, each
    * round a bit_or re-aggregation over own + out-neighbor sketches
    * (bitwise OR is order-free: the one iterative op needing NO float
    * contract until the final 2^(mean-b) estimate, where est rounds 6dp
    * and the sum 2dp like every other float rollup). */
  private def anfOracleSql(rounds: Int, trials: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (SELECT node, t, bit_or(s) AS s FROM (
            SELECT node, t, s FROM s${r - 1}
            UNION ALL
            SELECT e.src AS node, s.t, s.s FROM hg e
            JOIN s${r - 1} s ON s.node = e.dst)
          GROUP BY node, t)"""
    }.mkString(",\n")
    val nfSelects = (0 to rounds).map { r =>
      s"""SELECT $r AS r, ROUND(SUM(est), 2) AS nf FROM (
            SELECT node,
              ROUND(POW(CAST(2.0 AS DOUBLE),
                  SUM(CAST(bit_count(xor(s, s + 1)) AS BIGINT) - 1) / $trials)
                / CAST(0.77351 AS DOUBLE), 6) AS est
            FROM s$r GROUP BY node)"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${graft.ops.LinkGraph.linksCteSql},
        hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("src_url")} AS src,
                         ${graft.ops.WebOps.canonHostSqlOf("dst_url")} AS dst
                  FROM lnk),
        hg AS (SELECT DISTINCT src, dst FROM hosts WHERE src <> dst),
        nd AS (SELECT src AS node FROM hg UNION SELECT dst FROM hg),
        tr AS (SELECT unnest(generate_series(0, ${trials - 1})) AS t),
        h0 AS (SELECT node, t,
                 ('0x' || substr(md5(node || ':' || CAST(t AS VARCHAR)), 1, 15))::BIGINT
                   & ${(1L << 30) - 1} AS hh
               FROM nd, tr),
        s0 AS (SELECT node, t, hh & (-hh) AS s FROM h0),
        $roundCtes
        $nfSelects"""
  }

  private def domainQuotaOracleSql: String =
    s"""WITH ${graft.ops.WebOps.canonCteSql},
        r AS (SELECT doc_id, host, canon_url,
                ROW_NUMBER() OVER (PARTITION BY host
                  ORDER BY ('0x' || substr(md5(canon_url), 1, 15))::BIGINT,
                           doc_id) AS rn
              FROM canon)
        SELECT doc_id, host, canon_url FROM r WHERE rn <= 50"""

  private val oracleSqlSeq: Seq[(String, String)] = Seq(
    "ann_direct" ->
      s"WITH $dictCte, $directCte SELECT url, class_iri, ont, match_type FROM direct",

    "ann_direct_typed" ->
      s"WITH $dictCte, $directCte SELECT url, class_iri, ont, match_type FROM direct",

    // sharded scan must be indistinguishable from the single-automaton scan
    "ann_sharded" ->
      s"WITH $dictCte, $directCte SELECT url, class_iri, ont, match_type FROM direct",

    "ann_counts" ->
      s"""WITH $dictCte, $cntsCte
          SELECT url, class_iri, CAST(SUM(cnt) AS BIGINT) AS n_matches
          FROM cnts WHERE cnt > 0 GROUP BY url, class_iri""",

    "ann_hier" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $directCte, $closureCte
          SELECT dr.url, cl.ancestor_iri, CAST(MIN(cl.distance) AS INT) AS distance
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN closure cl ON dr.class_iri = cl.child_iri
          GROUP BY dr.url, cl.ancestor_iri""",

    "ann_mapped" ->
      s"""WITH $dictCte, $mappingsCte, $directCte
          SELECT DISTINCT dr.url, m.mapped_iri, m.kind
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN maps m ON dr.class_iri = m.class_iri""",

    "ann_canon" ->
      s"""WITH $dictCte, $resolutionCte, $directCte
          SELECT DISTINCT dr.url, dr.class_iri,
                 COALESCE(r.preferred_iri, dr.class_iri) AS canon_iri
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          LEFT JOIN res r ON dr.class_iri = r.class_iri""",

    "ann_triples" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte
          SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN closure cl ON dr.class_iri = cl.child_iri
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN maps m ON dr.class_iri = m.class_iri""",

    "ann_triples_native" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte
          SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN closure cl ON dr.class_iri = cl.child_iri
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN maps m ON dr.class_iri = m.class_iri""",

    "dict_diff" ->
      s"""WITH d1(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValues}) v(a,b,c,d)),
            d2(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValuesV2}) v(a,b,c,d))
          SELECT *, 'removed' AS delta FROM (SELECT * FROM d1 EXCEPT SELECT * FROM d2)
          UNION ALL
          SELECT *, 'added' AS delta FROM (SELECT * FROM d2 EXCEPT SELECT * FROM d1)""",

    // stop-induction twin: per-TERM distinct-doc frequency from the same
    // regexp match the direct CTE uses, corpus total as a scalar CTE, the
    // UNROUNDED ratio compared against the shared floor in both engines
    // (identical int division → identical double)
    "dict_stop_candidates" ->
      s"""WITH $dictCte,
          dterm AS (SELECT DISTINCT 'doc://' || doc_id AS url, d.term
                    FROM documents, dict d
                    WHERE regexp_matches(upper(text), '\\b' || d.term || '\\b')),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
          SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
            ROUND(COUNT(*) / CAST(tot.n AS DOUBLE), 6) AS df_ratio
          FROM dterm, tot GROUP BY term, tot.n
          HAVING COUNT(*) / CAST(tot.n AS DOUBLE) >= $StopDfFloor""",

    // emerging-bigram twin: support agg + stopword/min-support filters +
    // NOT IN the dict terms; the normalize expression is the dict_terms
    // oracle's (bigrams are single-space, so it reduces to upper())
    "dict_candidates" ->
      s"""WITH $dictCte,
          ctoks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
          bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                 FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t) - 1)) AS i
                       FROM ctoks)),
          sup AS (SELECT b, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                    CAST(COUNT(*) AS BIGINT) AS n_mentions
                  FROM bg GROUP BY 1)
          SELECT upper(trim(regexp_replace(b, '\\s+', ' ', 'g')))
                   AS term_candidate,
                 n_docs, n_mentions
          FROM sup
          WHERE n_docs >= 5
            AND string_split(b, ' ')[1] NOT IN (${graft.dict.DictBuild
              .CandidateStopwords.map(w => s"'$w'").mkString(", ")})
            AND string_split(b, ' ')[2] NOT IN (${graft.dict.DictBuild
              .CandidateStopwords.map(w => s"'$w'").mkString(", ")})
            AND upper(trim(regexp_replace(b, '\\s+', ' ', 'g')))
              NOT IN (SELECT term FROM dict)""",

    // FastSS deletion-neighborhood candidates + levenshtein verify over
    // the typo-injected synthesis ([[graft.dict.DictBuild.spellVariants]]
    // twin — same minLen 4 / hotKeyCap 100 constants)
    "dict_spell_variants" ->
      s"""WITH $dictCte,
          tx AS (SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                         AND len(string_split(text, ' ')) >= 3
                         AND length(string_split(text, ' ')[3]) >= 4
                        THEN text || ' ' ||
                          substr(string_split(text, ' ')[3], 1, 1) ||
                          substr(string_split(text, ' ')[3], 3)
                        ELSE text END AS text
                 FROM documents),
          tok AS (SELECT upper(t) AS token,
                    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                        FROM tx) z
                  WHERE length(t) >= 4 GROUP BY 1),
          fterms AS (SELECT DISTINCT term FROM dict WHERE length(term) >= 4),
          oov AS (SELECT t.token, t.df FROM tok t
                  LEFT JOIN fterms d ON d.term = t.token
                  WHERE d.term IS NULL),
          tokk AS (SELECT token, df,
                     unnest(list_distinct(list_prepend(token,
                       list_transform(generate_series(1, length(token)),
                         i -> substr(token, 1, i - 1) || substr(token, i + 1)
                       )))) AS k
                   FROM oov),
          termk0 AS (SELECT term,
                       unnest(list_distinct(list_prepend(term,
                         list_transform(generate_series(1, length(term)),
                           i -> substr(term, 1, i - 1) || substr(term, i + 1)
                         )))) AS k
                     FROM fterms),
          termk AS (SELECT t.term, t.k FROM termk0 t JOIN
                      (SELECT k FROM termk0 GROUP BY k
                       HAVING COUNT(*) <= 100) c USING (k)),
          cand AS (SELECT DISTINCT token, term, df
                   FROM tokk JOIN termk USING (k))
          SELECT token, term, df FROM cand
          WHERE levenshtein(token, term) = 1""",

    // per-(ont, pref, word-count) over the dict VALUES; AVG from exact
    // integer sums on both sides
    "dict_term_stats" ->
      s"""WITH $dictCte
          SELECT ont, pref,
                 CAST(len(string_split(term, ' ')) AS INT) AS n_words,
                 CAST(COUNT(*) AS BIGINT) AS n_terms,
                 ROUND(AVG(length(term)), 4) AS mean_chars
          FROM dict GROUP BY 1, 2, 3""",

    // canonical-host TLD rollup over the synthesized page urls
    "web_tld_stats" ->
      s"""WITH ${graft.ops.LinkGraph.pagesCteSql},
          hosts AS (SELECT ${graft.ops.WebOps.canonHostSqlOf("url")} AS host
                    FROM pages)
          SELECT string_split(host, '.')[-1] AS tld,
                 CAST(COUNT(*) AS BIGINT) AS n_pages,
                 CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
          FROM hosts GROUP BY 1""",

    // mapping table joined twice against the dict class universe; coverage
    // division order mirrored, 6dp
    "kg_ontology_overlap" ->
      s"""WITH $dictCte, $mappingsCte,
          cls AS (SELECT DISTINCT class_iri, ont FROM dict),
          sizes AS (SELECT ont, CAST(COUNT(DISTINCT class_iri) AS BIGINT) AS n
                    FROM cls GROUP BY 1),
          mp AS (SELECT DISTINCT ca.ont AS ont_a, cb.ont AS ont_b,
                   m.class_iri, m.mapped_iri
                 FROM maps m
                 JOIN cls ca ON m.class_iri = ca.class_iri
                 JOIN cls cb ON m.mapped_iri = cb.class_iri
                 WHERE ca.ont < cb.ont),
          agg AS (SELECT ont_a, ont_b,
                    CAST(COUNT(*) AS BIGINT) AS n_mapped_pairs,
                    CAST(COUNT(DISTINCT class_iri) AS BIGINT) AS n_classes_a,
                    CAST(COUNT(DISTINCT mapped_iri) AS BIGINT) AS n_classes_b
                  FROM mp GROUP BY 1, 2)
          SELECT agg.ont_a, agg.ont_b, n_mapped_pairs, n_classes_a,
                 n_classes_b,
                 ROUND(n_classes_a / sa.n, 6) AS coverage_a,
                 ROUND(n_classes_b / sb.n, 6) AS coverage_b
          FROM agg
          JOIN sizes sa ON sa.ont = agg.ont_a
          JOIN sizes sb ON sb.ont = agg.ont_b""",

    // per-lang doc totals LEFT-joined with the distinct annotated-url set
    "ann_coverage_by_lang" ->
      s"""WITH $dictCte, $directCte,
          d AS (SELECT 'doc://' || doc_id AS url, lang FROM documents),
          ann AS (SELECT DISTINCT url FROM direct)
          SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN a.url IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_annotated,
            ROUND(SUM(CASE WHEN a.url IS NOT NULL THEN 1 ELSE 0 END)
              / COUNT(*), 6) AS coverage
          FROM d LEFT JOIN ann a ON d.url = a.url GROUP BY 1""",

    // the text_quality formula + lang, floored into 0.1 buckets
    "curate_quality_buckets" ->
      s"""WITH q AS (SELECT doc_id, lang, $qualityExprSql AS quality
           FROM documents)
          SELECT lang, CAST(FLOOR(quality * 10) AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM q GROUP BY 1, 2""",

    // per-lang token totals + declared target shares; rate/planned in the
    // engine's division order (doubles forced — DuckDB decimals would
    // otherwise change the arithmetic)
    "curate_token_budget" ->
      """WITH tt AS (SELECT lang,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1),
          w AS (SELECT lang, n_tokens,
              CASE lang WHEN 'en' THEN CAST(0.30 AS DOUBLE)
                        WHEN 'fr' THEN CAST(0.20 AS DOUBLE)
                        WHEN 'es' THEN CAST(0.20 AS DOUBLE)
                        WHEN 'de' THEN CAST(0.15 AS DOUBLE)
                        WHEN 'zh' THEN CAST(0.15 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END AS target_share
            FROM tt)
          SELECT lang, n_tokens, target_share,
            ROUND(LEAST(1.0, 20000.0 * target_share / n_tokens), 6)
              AS sample_rate,
            ROUND(LEAST(20000.0 * target_share, CAST(n_tokens AS DOUBLE)), 1)
              AS planned_tokens
          FROM w""",

    // the same diff rolled up per (ontology, change class)
    "dict_release_notes" ->
      s"""WITH d1(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValues}) v(a,b,c,d)),
            d2(term, class_iri, ont, pref) AS (SELECT * FROM (VALUES ${OntologyFixture.dictValuesV2}) v(a,b,c,d)),
          diff AS (
            SELECT *, 'removed' AS delta FROM (SELECT * FROM d1 EXCEPT SELECT * FROM d2)
            UNION ALL
            SELECT *, 'added' AS delta FROM (SELECT * FROM d2 EXCEPT SELECT * FROM d1))
          SELECT ont, delta, CAST(COUNT(*) AS BIGINT) AS n_terms,
                 CAST(COUNT(DISTINCT class_iri) AS BIGINT) AS n_classes
          FROM diff GROUP BY 1, 2""",

    // semantic-profile pairs: direct ∪ ancestor concepts per doc, capped
    // posting self-join (the jaccard oracle shape on the semantic space)
    "kg_related_docs" ->
      s"""WITH RECURSIVE $dictCte, $directCte, $edgesCte, $closureCte,
          d AS (SELECT DISTINCT url, class_iri FROM direct),
          prof AS (SELECT DISTINCT url, sem FROM (
              SELECT url, class_iri AS sem FROM d
              UNION ALL
              SELECT d.url, c.ancestor_iri AS sem
              FROM d JOIN closure c ON d.class_iri = c.child_iri)),
          sizes AS (SELECT url, CAST(COUNT(*) AS BIGINT) AS n_sem
                    FROM prof GROUP BY 1),
          keep AS (SELECT sem FROM prof GROUP BY sem
                   HAVING COUNT(DISTINCT url) BETWEEN 2 AND 100),
          rare AS (SELECT prof.url, prof.sem FROM prof JOIN keep USING (sem)),
          inter AS (SELECT a.url AS doc_a, b.url AS doc_b,
                      CAST(COUNT(*) AS BIGINT) AS n_shared
                    FROM rare a JOIN rare b
                      ON a.sem = b.sem AND a.url < b.url
                    GROUP BY 1, 2)
          SELECT doc_a, doc_b, n_shared, sa.n_sem AS size_a,
                 sb.n_sem AS size_b,
                 ROUND(n_shared / (sa.n_sem + sb.n_sem - n_shared), 4)
                   AS sem_jaccard
          FROM inter
          JOIN sizes sa ON sa.url = doc_a
          JOIN sizes sb ON sb.url = doc_b
          WHERE n_shared >= 3""",

    // first-mention offsets recovered from regexp-split segment lengths
    // (the ann_context machinery); counts == the ann_counts contract
    "kg_salience" ->
      s"""WITH $dictCte,
          segs AS (SELECT doc_id, text, d.class_iri, length(d.term) AS tl,
              regexp_split_to_array(upper(text), '\\b' || d.term || '\\b') AS parts
            FROM documents, dict d),
          pos AS (SELECT doc_id, text, class_iri, tl, parts,
              unnest(generate_series(1, len(parts) - 1)) AS k
            FROM segs WHERE len(parts) > 1),
          hits AS (SELECT doc_id, text, class_iri,
              CAST((SELECT COALESCE(SUM(length(p)), 0)
                    FROM unnest(parts[1:k]) AS t(p))
                + (k - 1) * tl + 1 AS BIGINT) AS f
            FROM pos)
          SELECT 'doc://' || doc_id AS url, class_iri,
            COUNT(*) AS n_mentions, CAST(MIN(f) AS INT) AS first_pos,
            ROUND(CAST(1.0 AS DOUBLE) - CAST(MIN(f) - 1 AS DOUBLE)
              / CAST(MAX(length(text)) AS DOUBLE), 6) AS lead_score
          FROM hits GROUP BY 1, 2""",

    "sim_centroids" ->
      """SELECT label, CAST(d AS INT) AS dim, ROUND(AVG(emb[d]), 6) AS mean
         FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
              (SELECT unnest(generate_series(1, 64)) AS d)
         GROUP BY 1, 2""",

    // same corruption arithmetic: portable 60-bit md5 hash of
    // 'subj|pred|obj|slot' mod |entity pool|, dense entity ids by ORDER BY
    // (ASCII IRIs: binary collation agrees across engines)
    "kg_negatives" ->
      s"""WITH $dictCte, $directCte, $negativesChainCtes
          SELECT subj, pred, obj, slot, neg_obj FROM neg""",

    "kg_transe_step" -> transeStepOracleSql,
    "curate_lr_distill" ->
      lrDistillOracleSql(graft.ops.Classifier.Lr, graft.ops.Classifier.Steps),
    "curate_auc" ->
      lrAucOracleSql(graft.ops.Classifier.Lr, graft.ops.Classifier.Steps),
    "curate_brier" ->
      lrBrierOracleSql(graft.ops.Classifier.Lr, graft.ops.Classifier.Steps),

    // exact-BIGINT pairwise |diffs| over the sources² frame, one division
    "curate_gini" ->
      """WITH per AS (SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS x
           FROM documents GROUP BY 1),
          d AS (SELECT CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS d
                FROM per a CROSS JOIN per b),
          t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS t FROM per)
          SELECT n AS n_sources, t AS n_tokens,
            ROUND(CAST(d AS DOUBLE) / (2.0 * n * t), 6) AS gini
          FROM d, t""",

    "kg_transe_rank" -> transeRankOracleSql(),
    "kg_transe_rank_typed" -> transeRankTypedOracleSql,
    "kg_transe_rank_trained" -> transeRankOracleSql(epochs = 2),
    "kg_distmult_rank" -> distmultRankOracleSql,
    "kg_complex_rank" -> complexRankOracleSql,

    "kg_rotate_rank" -> rotateRankOracleSql,
    "kg_transe_epochs" -> transeEpochsOracleSql(epochs = 2),
    "kg_embed_neighbors" -> embedNeighborsOracleSql(epochs = 2, k = 3),

    // the oracle's engine and reference sides coincide BY CONSTRUCTION (both
    // are the regex-semantics triple chain), so it pins n_engine == n_ref ==
    // tp and P/R == 1.0 — which the Spark side only reproduces if the
    // automaton scan really equals the independent regex derivation
    "ann_pr_gate" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          trip AS (
            SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
            UNION
            SELECT DISTINCT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
            FROM (SELECT DISTINCT url, class_iri FROM direct) dr
            JOIN closure cl ON dr.class_iri = cl.child_iri
            UNION
            SELECT DISTINCT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
            FROM (SELECT DISTINCT url, class_iri FROM direct) dr
            JOIN maps m ON dr.class_iri = m.class_iri)
          SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_engine,
            CAST(COUNT(*) AS BIGINT) AS n_ref,
            CAST(COUNT(*) AS BIGINT) AS tp,
            CAST(1.0 AS DOUBLE) AS "precision",
            CAST(1.0 AS DOUBLE) AS "recall"
          FROM trip GROUP BY pred""",

    // BOTH dictionary versions ride one version-tagged dict CTE (the two
    // fixed-name dict/direct CTEs cannot coexist), then the same three
    // triple legs as ann_incremental carry the tag into two EXCEPT legs
    "kg_fact_diff" ->
      s"""WITH RECURSIVE
          dict(v, term, class_iri, ont, pref) AS (
            SELECT 'v1', * FROM (VALUES ${OntologyFixture.dictValues}) x(a,b,c,d)
            UNION ALL
            SELECT 'v2', * FROM (VALUES ${OntologyFixture.dictValuesV2}) x(a,b,c,d)),
          $edgesCte, $mappingsCte, $closureCte,
          directv AS (SELECT DISTINCT d.v, 'doc://' || doc_id AS url, d.class_iri
            FROM documents, dict d
            WHERE regexp_matches(upper(text), '\\b' || d.term || '\\b')),
          trip AS (
            SELECT v, url AS subj, 'hasAnnotation' AS pred, class_iri AS obj
            FROM directv
            UNION
            SELECT dr.v, dr.url AS subj, 'hasExpandedAnnotation' AS pred,
                   cl.ancestor_iri AS obj
            FROM directv dr JOIN closure cl ON dr.class_iri = cl.child_iri
            UNION
            SELECT dr.v, dr.url AS subj, 'hasMappedAnnotation' AS pred,
                   m.mapped_iri AS obj
            FROM directv dr JOIN maps m ON dr.class_iri = m.class_iri)
          SELECT subj, pred, obj, 'removed' AS delta FROM
            (SELECT subj, pred, obj FROM trip WHERE v = 'v1'
             EXCEPT SELECT subj, pred, obj FROM trip WHERE v = 'v2')
          UNION ALL
          SELECT subj, pred, obj, 'added' AS delta FROM
            (SELECT subj, pred, obj FROM trip WHERE v = 'v2'
             EXCEPT SELECT subj, pred, obj FROM trip WHERE v = 'v1')""",

    // full v2 recomputation — the incremental path must land exactly here
    "ann_incremental" ->
      s"""WITH RECURSIVE $dictV2Cte, $edgesCte, $mappingsCte, $directCte, $closureCte
          SELECT DISTINCT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN closure cl ON dr.class_iri = cl.child_iri
          UNION
          SELECT DISTINCT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
          FROM (SELECT DISTINCT url, class_iri FROM direct) dr
          JOIN maps m ON dr.class_iri = m.class_iri""",

    "ann_response" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte,
          cnts2 AS (SELECT 'doc://' || doc_id AS url, d.class_iri, d.ont,
            CASE WHEN d.pref THEN 'PREF' ELSE 'SYN' END AS mt,
            CASE WHEN d.pref THEN 10.0 ELSE 8.0 END AS w,
            len(regexp_extract_all(upper(text), '\\b' || d.term || '\\b')) AS cnt
            FROM documents, dict d),
          bytype AS (SELECT url, class_iri, ont, mt, SUM(cnt) AS cnt,
              SUM(cnt * w) AS sc
            FROM cnts2 WHERE cnt > 0 GROUP BY url, class_iri, ont, mt),
          spans AS (SELECT url, class_iri, ont,
              string_agg(mt || ':' || cnt, ';' ORDER BY mt || ':' || cnt) AS annotations,
              CAST(SUM(sc) AS DOUBLE) AS score
            FROM bytype GROUP BY url, class_iri, ont),
          direct AS (SELECT DISTINCT url, class_iri FROM bytype),
          $closureCte,
          hier AS (SELECT dr.url, dr.class_iri, cl.ancestor_iri, MIN(cl.distance) AS d
            FROM direct dr JOIN closure cl ON dr.class_iri = cl.child_iri
            GROUP BY dr.url, dr.class_iri, cl.ancestor_iri),
          hierstr AS (SELECT url, class_iri,
              string_agg(ancestor_iri || ':' || d, ';' ORDER BY ancestor_iri || ':' || d) AS hierarchy
            FROM hier GROUP BY url, class_iri),
          mapdist AS (SELECT DISTINCT dr.url, dr.class_iri, m.mapped_iri
            FROM direct dr JOIN maps m ON dr.class_iri = m.class_iri),
          mapstr AS (SELECT url, class_iri,
              string_agg(mapped_iri, ';' ORDER BY mapped_iri) AS mappings
            FROM mapdist GROUP BY url, class_iri)
          SELECT s.url, s.class_iri, s.ont, s.annotations,
                 COALESCE(h.hierarchy, '') AS hierarchy,
                 COALESCE(p.mappings, '') AS mappings, s.score
          FROM spans s
          LEFT JOIN hierstr h ON s.url = h.url AND s.class_iri = h.class_iri
          LEFT JOIN mapstr p ON s.url = p.url AND s.class_iri = p.class_iri""",

    "ann_score" ->
      s"""WITH $dictCte, $cntsCte
          SELECT url, class_iri,
                 CAST(SUM(cnt * CASE WHEN pref THEN 10.0 ELSE 8.0 END)
                   AS DOUBLE) AS score,
                 CAST(SUM(cnt) AS BIGINT) AS n_matches,
                 MIN(CASE WHEN pref THEN 'PREF' ELSE 'SYN' END) AS match_type
          FROM cnts WHERE cnt > 0 GROUP BY url, class_iri""",

    "ann_stats" ->
      s"""WITH $dictCte, $cntsCte
          SELECT class_iri, CAST(COUNT(DISTINCT url) AS BIGINT) AS doc_freq,
                 CAST(SUM(cnt) AS BIGINT) AS n_matches
          FROM cnts WHERE cnt > 0 GROUP BY class_iri""",

    // salted two-phase agg must produce the exact same result
    "ann_stats_salted" ->
      s"""WITH $dictCte, $cntsCte
          SELECT class_iri, CAST(COUNT(DISTINCT url) AS BIGINT) AS doc_freq,
                 CAST(SUM(cnt) AS BIGINT) AS n_matches
          FROM cnts WHERE cnt > 0 GROUP BY class_iri""",

    "ann_filter_ont" ->
      s"""WITH $dictCte, $directCte
          SELECT DISTINCT url, class_iri, ont FROM direct WHERE ont = 'ONT2'""",

    "ann_filter_semtype" ->
      s"""WITH $dictCte, $directCte,
          semtypes(class_iri, tui) AS (SELECT * FROM (VALUES ${OntologyFixture.tuisValues}) v(a,b))
          SELECT DISTINCT d.url, d.class_iri FROM direct d
          WHERE EXISTS (SELECT 1 FROM semtypes s WHERE s.class_iri = d.class_iri
                        AND s.tui IN ('T050', 'T051', 'T052'))""",

    "ann_substring" ->
      s"""WITH $dictCte
          SELECT DISTINCT 'doc://' || doc_id AS url, d.class_iri
          FROM documents, dict d
          WHERE contains(upper(text), d.term)""",

    "ann_nosyn" ->
      s"""WITH $dictCte, $directCte
          SELECT DISTINCT url, class_iri, match_type FROM direct
          WHERE match_type <> 'SYN'""",

    "ann_stopwords" ->
      s"""WITH $dictCte
          SELECT DISTINCT 'doc://' || doc_id AS url, d.class_iri
          FROM documents, dict d
          WHERE d.term NOT IN ('DATA', 'TABLE SCAN')
            AND regexp_matches(upper(text), '\\b' || d.term || '\\b')""",

    "ann_score_cvalue" ->
      s"""WITH $dictCte, $cvCte
          SELECT url, class_iri,
                 ROUND(SUM(cnt * w * log2(words + 1)), 4) AS score
          FROM cvparts WHERE cnt > 0 GROUP BY url, class_iri""",

    "ann_score_cvalueh" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $cvCte,
          cvagg AS (SELECT url, class_iri, SUM(cnt * w * log2(words + 1)) AS score
                    FROM cvparts WHERE cnt > 0 GROUP BY url, class_iri),
          $closureCte,
          $minClosureCte,
          inh AS (SELECT c.url, m.ancestor_iri AS class_iri,
                         c.score / (m.distance + 1) AS score
                  FROM cvagg c JOIN mincl m ON c.class_iri = m.child_iri)
          SELECT url, class_iri, ROUND(SUM(score), 4) AS score
          FROM (SELECT * FROM cvagg UNION ALL SELECT * FROM inh)
          GROUP BY url, class_iri""",

    "ann_rank" ->
      s"""WITH $dictCte, $cntsCte,
          scored AS (SELECT url, class_iri,
                       CAST(SUM(cnt * CASE WHEN pref THEN 10.0 ELSE 8.0 END)
                         AS DOUBLE) AS score
                     FROM cnts WHERE cnt > 0 GROUP BY url, class_iri)
          SELECT url, class_iri, score, CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY url
              ORDER BY score DESC, class_iri) AS rank
            FROM scored WHERE score >= 16.0)""",

    "dict_terms" ->
      s"""WITH raw(class_iri, ont, label, pref) AS (
            SELECT * FROM (VALUES ${OntologyFixture.labelRowsValues}) v(a,b,c,d)),
          norm AS (SELECT DISTINCT
            upper(trim(regexp_replace(label, '\\s+', ' ', 'g'))) AS term,
            class_iri, ont, pref FROM raw),
          filtered AS (SELECT * FROM norm WHERE length(term) >= 3),
          ids AS (SELECT term, row_number() OVER (ORDER BY term) AS term_id
                  FROM (SELECT DISTINCT term FROM filtered) t)
          SELECT f.term, CAST(i.term_id AS INT) AS term_id, f.class_iri, f.ont, f.pref
          FROM filtered f JOIN ids i ON f.term = i.term""",

    // the N-Triples round trip must be invisible — same oracle as dict_terms
    "dict_terms_nt" ->
      s"""WITH raw(class_iri, ont, label, pref) AS (
            SELECT * FROM (VALUES ${OntologyFixture.labelRowsValues}) v(a,b,c,d)),
          norm AS (SELECT DISTINCT
            upper(trim(regexp_replace(label, '\\s+', ' ', 'g'))) AS term,
            class_iri, ont, pref FROM raw),
          filtered AS (SELECT * FROM norm WHERE length(term) >= 3),
          ids AS (SELECT term, row_number() OVER (ORDER BY term) AS term_id
                  FROM (SELECT DISTINCT term FROM filtered) t)
          SELECT f.term, CAST(i.term_id AS INT) AS term_id, f.class_iri, f.ont, f.pref
          FROM filtered f JOIN ids i ON f.term = i.term""",

    // rule-tagger recognizer recomputed in SQL: token offsets from the
    // cumulative separator+token lengths (the ann_lemma machinery), classes
    // from the SAME priority-ordered suffix CASE chain
    // (RuleTagger.ruleCaseSql — single source of truth)
    "ann_tagger" ->
      s"""WITH docs AS (
            SELECT doc_id, text,
              regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks,
              regexp_split_to_array(text, '[A-Za-z0-9_]+') AS seps
            FROM documents),
          tokrows AS (
            SELECT doc_id, i, toks[i] AS tok, seps[i] AS sep
            FROM (SELECT *, unnest(generate_series(1, len(toks))) AS i FROM docs)),
          cums AS (
            SELECT doc_id, i, tok,
              SUM(length(sep) + length(tok)) OVER w AS t
            FROM tokrows WINDOW w AS (PARTITION BY doc_id ORDER BY i
              ROWS UNBOUNDED PRECEDING)),
          tagged AS (
            SELECT doc_id, tok, CAST(t - length(tok) + 1 AS INT) AS f,
              CAST(t AS INT) AS t2,
              ${graft.annotate.RuleTagger.ruleCaseSql("tok")} AS cls
            FROM cums WHERE length(tok) >= ${graft.annotate.RuleTagger.MinTokenLen})
          SELECT 'doc://' || doc_id AS url, f AS "from", t2 AS "to", tok AS text,
            '${graft.annotate.RuleTagger.IriPrefix}' || cls AS class_iri,
            '${graft.annotate.RuleTagger.Ont}' AS ont,
            '${graft.annotate.RuleTagger.MatchType}' AS match_type
          FROM tagged WHERE cls IS NOT NULL""",

    // LOOM derivation recomputed over the label rows (pref + synonyms),
    // same D3 normalization as dict_terms
    "dict_loom" ->
      s"""WITH raw(class_iri, ont, label, pref) AS (
            SELECT * FROM (VALUES ${OntologyFixture.labelRowsValues}) v(a,b,c,d)),
          norm AS (SELECT DISTINCT class_iri, ont,
            upper(trim(regexp_replace(label, '\\s+', ' ', 'g'))) AS term FROM raw)
          SELECT DISTINCT a.class_iri, b.class_iri AS mapped_iri, 'LOOM' AS kind
          FROM norm a JOIN norm b ON a.term = b.term AND a.ont <> b.ont""",

    // posting-list pairing + token-set Jaccard, the same cap both engines
    // apply; jaccard compared on the ROUNDED value in both
    "dict_align_fuzzy" ->
      s"""WITH raw(class_iri, ont, label, pref) AS (
            SELECT * FROM (VALUES ${OntologyFixture.labelRowsValues}) v(a,b,c,d)),
          lab AS (SELECT DISTINCT
            upper(trim(regexp_replace(label, '\\s+', ' ', 'g'))) AS term,
            class_iri, ont FROM raw),
          tk AS (SELECT DISTINCT term, class_iri, ont, tok FROM
            (SELECT term, class_iri, ont,
               unnest(string_split(term, ' ')) AS tok FROM lab) z),
          keep AS (SELECT tok FROM tk GROUP BY tok HAVING COUNT(*) <= 1000),
          cap AS (SELECT t.* FROM tk t JOIN keep USING (tok)),
          pr AS (SELECT a.class_iri AS class_iri_1, a.ont AS ont_1,
                   a.term AS label_1, b.class_iri AS class_iri_2,
                   b.ont AS ont_2, b.term AS label_2, COUNT(*) AS shared
                 FROM cap a JOIN cap b ON a.tok = b.tok AND a.ont < b.ont
                 GROUP BY 1, 2, 3, 4, 5, 6)
          SELECT * FROM (
            SELECT class_iri_1, ont_1, label_1, class_iri_2, ont_2, label_2,
              CAST(shared AS BIGINT) AS shared,
              ROUND(CAST(shared AS DOUBLE) /
                (CAST(len(list_distinct(string_split(label_1, ' '))) AS DOUBLE)
                 + CAST(len(list_distinct(string_split(label_2, ' '))) AS DOUBLE)
                 - CAST(shared AS DOUBLE)), 6) AS jaccard
            FROM pr) q
          WHERE jaccard >= 0.5""",

    "q_table_stats" ->
      Seq("lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
              COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS ndv,
              CAST(MIN($c) AS VARCHAR) AS min_value,
              CAST(MAX($c) AS VARCHAR) AS max_value
            FROM documents"""
      }.mkString("\nUNION ALL\n"),

    "q_pushdown_agg" ->
      """SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01'
         GROUP BY l_returnflag, l_linestatus""",

    "q_join_nation" ->
      """SELECT n_name, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name HAVING COUNT(*) > 10""",

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rank AS INT) AS rank FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders) WHERE rank <= 3""",

    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",

    // pivot == conditional aggregation (exactly what Spark's explicit-value
    // pivot compiles to)
    "q_pivot" ->
      """SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
         FROM events GROUP BY user_id""",

    "q_ntile" ->
      """SELECT event_id, event_type,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST(dense_rank() OVER w AS INT) AS drank,
           ROUND(percent_rank() OVER w, 6) AS prank
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""",

    "q_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM g)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                COUNT(*) AS n_events, MIN(ts) AS session_start
         FROM s GROUP BY user_id, session_id""",

    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS INT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1, 2""",

    "stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
         FROM events GROUP BY 1, 2""",

    // every event belongs to the 4 epoch-aligned 900s-stepped windows whose
    // start is in (t-3600, t]; make_timestamp keeps the NTZ type Spark's
    // window(start) carries
    "stream_sliding" ->
      """WITH j(j) AS (SELECT unnest(generate_series(0, 3))),
           ev AS (SELECT event_type, value,
                    CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS b
                  FROM events)
         SELECT make_timestamp((b - j * 900) * 1000000) AS window_start,
                event_type, COUNT(*) AS n_events,
                ROUND(SUM(value), 2) AS total_value
         FROM ev CROSS JOIN j
         GROUP BY 1, 2""",

    // DuckDB's native ASOF JOIN cross-proves the array-literal formulation
    "q_asof_version" ->
      """WITH v(vts, version) AS (VALUES
           (TIMESTAMP '2024-01-03 00:00:00', 'v1'),
           (TIMESTAMP '2024-01-08 00:00:00', 'v2'),
           (TIMESTAMP '2024-01-15 00:00:00', 'v3'),
           (TIMESTAMP '2024-01-22 00:00:00', 'v4'),
           (TIMESTAMP '2024-01-29 00:00:00', 'v5'))
         SELECT e.event_id, v.version
         FROM events e ASOF LEFT JOIN v ON e.ts >= v.vts""",

    "q_asof_prev_click" ->
      """SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_click_id
         FROM events""",

    "q_bloom_prune" ->
      s"""WITH $dictCte,
           terms AS (SELECT DISTINCT term FROM dict WHERE term NOT LIKE '% %'),
           ii(i) AS (SELECT unnest(generate_series(0, 2))),
           th AS (SELECT
               CAST(concat('0x', substring(md5(term), 1, 15)) AS BIGINT) AS h1,
               CAST(concat('0x', substring(md5(term), 17, 15)) AS BIGINT) AS h2
             FROM terms),
           setbits AS (SELECT DISTINCT (h1 + i * h2) % 4096 AS pos
                       FROM th CROSS JOIN ii),
           w AS (SELECT DISTINCT doc_id, w AS word FROM (
                   SELECT doc_id, unnest(string_split(upper(text), ' ')) AS w
                   FROM documents) WHERE w <> ''),
           wh AS (SELECT doc_id, word,
               CAST(concat('0x', substring(md5(word), 1, 15)) AS BIGINT) AS h1,
               CAST(concat('0x', substring(md5(word), 17, 15)) AS BIGINT) AS h2
             FROM w)
         SELECT doc_id, word
         FROM wh CROSS JOIN ii
         JOIN setbits ON (h1 + i * h2) % 4096 = pos
         GROUP BY doc_id, word HAVING COUNT(*) = 3""",

    // the oracle USES the quadratic inequality join the Spark side avoids —
    // cross-proving the bucketed formulation finds exactly the same pairs.
    // floor(epoch(...)) matches Spark's whole-second timestamp→long cast
    "q_range_join" ->
      """WITH e AS (SELECT user_id, event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events)
         SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
                b.t - a.t AS gap_s
         FROM e a JOIN e b
           ON a.user_id = b.user_id
          AND b.t - a.t BETWEEN 0 AND 300
          AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))""",

    // the GK error bound is Spark-internal, so the oracle pins the CHECKED
    // OUTCOME: every returned approx percentile must sit within the
    // guaranteed exact-rank window — a violation flips a boolean and
    // hash-mismatches here
    "q_quantiles_approx" ->
      """SELECT CAST(pct AS DOUBLE) AS pct, within_bound
         FROM (VALUES (0.25, true), (0.5, true), (0.75, true), (0.95, true))
           AS t(pct, within_bound)""",

    "q_quantiles" ->
      """SELECT lang, COUNT(*) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
           ROUND(quantile_cont(n_chars, 0.95), 6) AS p95
         FROM documents GROUP BY lang""",

    // KMV: the k smallest DISTINCT 60-bit hashes per group, recomputed
    // declaratively (row_number over distinct hashes); estimator shared
    // with the Scala side — exact below k, (k-1)*2^60/h_(k) at k
    "sketch_distinct" ->
      """WITH dv AS (SELECT DISTINCT event_type,
                       CAST(user_id AS VARCHAR) AS v FROM events
                     WHERE user_id IS NOT NULL),
           h AS (SELECT DISTINCT event_type,
                   CAST(concat('0x', substring(md5(v), 1, 15)) AS BIGINT) AS h
                 FROM dv),
           bk AS (SELECT event_type, h,
                    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
                  FROM h),
           kk AS (SELECT event_type, COUNT(*) AS n, MAX(h) AS kth
                  FROM bk WHERE rn <= 64 GROUP BY event_type),
           ex AS (SELECT event_type, COUNT(*) AS exact_distinct
                  FROM dv GROUP BY event_type)
         SELECT kk.event_type,
           ROUND(CASE WHEN kk.n < 64 THEN CAST(kk.n AS DOUBLE)
                 ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                      / CAST(kk.kth AS DOUBLE) END, 4) AS est_distinct,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
         FROM kk JOIN ex USING (event_type)""",

    // HLL: per-(group, bucket) max rank via the shared exact-integer
    // threshold chain, BIGINT harmonic fold, raw α·m²/S vs linear-counting
    // switch — all constants single-sourced from Sketch
    "sketch_hll" -> {
      import graft.ops.Sketch.{HllM, HllRawNum, HllRemBits, HllScale}
      s"""WITH dv AS (SELECT DISTINCT event_type,
                        CAST(user_id AS VARCHAR) AS v FROM events
                      WHERE user_id IS NOT NULL),
           h AS (SELECT event_type,
                   CAST(concat('0x', substring(md5(v), 1, 15)) AS BIGINT) AS h
                 FROM dv),
           rg AS (SELECT event_type, h % $HllM AS bucket,
                    MAX(${graft.ops.Sketch.hllRankSql(s"(h // $HllM)")}) AS r
                  FROM h GROUP BY 1, 2),
           fd AS (SELECT event_type, COUNT(*) AS n_present,
                    SUM(CAST(1 AS BIGINT) << (${HllRemBits + 1} - r)) AS s_present
                  FROM rg GROUP BY 1),
           est AS (SELECT event_type, n_present,
                     $HllRawNum / CAST(s_present
                       + ($HllM - n_present) * $HllScale AS DOUBLE) AS raw
                   FROM fd),
           ex AS (SELECT event_type, COUNT(*) AS exact_distinct
                  FROM dv GROUP BY event_type)
         SELECT e.event_type,
           ROUND(CASE WHEN e.raw <= ${2.5 * HllM} AND e.n_present < $HllM
                 THEN ${HllM.toDouble} * ln(${HllM.toDouble}
                   / CAST($HllM - e.n_present AS DOUBLE))
                 ELSE e.raw END, 4) AS est_distinct,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
         FROM est e JOIN ex USING (event_type)"""
    },

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY text""",

    "dedup_jaccard" -> jaccardPairsOracleSql,

    // CDC chain mirrored: boundary mark via the HUGEINT fingerprint fold
    // (unsigned % 4 == signed pmod 4 — 4 divides 2^64), segment renumber
    // AFTER the empty-drop, first-occurrence argmin per chunk fingerprint
    "dedup_cdc" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents),
          marked AS (SELECT doc_id, list_transform(t, x -> x ||
                       CASE WHEN (${fpSql("x")}) % 4 = 0
                            THEN chr(31) ELSE ' ' END) AS m
                     FROM toks),
          segs AS (SELECT doc_id,
                     string_split(array_to_string(m, ''), chr(31)) AS ss
                   FROM marked),
          raw AS (SELECT doc_id, i, trim(ss[i]) AS chunk
                  FROM (SELECT doc_id, ss,
                          unnest(generate_series(1, len(ss))) AS i
                        FROM segs)
                  WHERE length(trim(ss[i])) > 0),
          chunks AS (SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                               ORDER BY i) AS INT)
                         AS chunk_idx,
                       ${toSignedSql(s"(${fpSql("chunk")})")} AS chunk_hash
                     FROM raw)
          SELECT FIRST(doc_id ORDER BY doc_id, chunk_idx) AS doc_id,
                 FIRST(chunk_idx ORDER BY doc_id, chunk_idx) AS chunk_idx,
                 chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM chunks GROUP BY chunk_hash""",

    // quote synthesis mirrored, then the jaccard candidate chain with the
    // containment formulas; threshold RAW on the larger direction
    "dedup_containment" ->
      """WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT 100000 + doc_id AS doc_id,
              array_to_string(l[1:(3 * len(l)) // 5], ' ') AS text
            FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) z
            WHERE doc_id % 13 = 0),
          toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus
                   WHERE len(string_split(text, ' ')) >= 3),
          pos AS (SELECT doc_id, t,
                  unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
          sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
          sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
          keep AS (SELECT shingle FROM sh GROUP BY shingle
                   HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 100),
          rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
          inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
                    FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
          SELECT doc_a, doc_b,
                 ROUND(n_common / CAST(sa.n_shingles AS DOUBLE), 4) AS containment_a,
                 ROUND(n_common / CAST(sb.n_shingles AS DOUBLE), 4) AS containment_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE GREATEST(n_common / CAST(sa.n_shingles AS DOUBLE),
                         n_common / CAST(sb.n_shingles AS DOUBLE)) >= 0.9""",

    "dedup_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks
                  WHERE len(t) >= 3),
          sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
          bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10)
          SELECT s.doc_id, COUNT(*) AS n_overlap
          FROM sh s JOIN bench b ON s.shingle = b.shingle
          WHERE s.doc_id >= 10
          GROUP BY s.doc_id HAVING COUNT(*) >= 2""",

    "sim_topk" -> bruteTopKOracleSql,

    // quantizer stats recomputed declaratively; snap arithmetic is scalar
    // round/CASE; dequantized vectors reassemble via ORDER BY dim and rank
    // through the same sequential-fold dot products as sim_topk
    "sim_quantized" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
          ex AS (SELECT vec_id, i AS dim, emb[i] AS x FROM
            (SELECT vec_id, emb, unnest(generate_series(1, len(emb))) AS i FROM e) z),
          st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY 1),
          dq AS (SELECT vec_id, dim,
              CASE WHEN mx = mn THEN mn
                   ELSE mn + round((x - mn) / (mx - mn) * 255.0, 0) * (mx - mn) / 255.0
              END AS xq
            FROM ex JOIN st USING (dim)),
          v AS (SELECT vec_id, list(xq ORDER BY dim) AS emb FROM dq GROUP BY 1),
          q AS (SELECT vec_id AS query_id, emb AS q_emb FROM v WHERE vec_id < 10),
          s AS (SELECT query_id, v.vec_id AS neighbor_id,
                ROUND(list_dot_product(q_emb, emb) /
                  sqrt(list_dot_product(q_emb, q_emb) * list_dot_product(emb, emb)), 4) AS cos
                FROM q, v WHERE v.vec_id <> q.query_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
          FROM r WHERE rank <= 3""",

    // measured recall@3 of the nProbe=2 IVF path vs exact brute force —
    // the ANN eval surface; each side is its own already-green oracle query
    // nested as a subquery (DuckDB allows WITH inside parenthesized
    // subselects), joined on (query, neighbor)
    "sim_ivf_recall" ->
      s"""SELECT e.query_id,
            ROUND(CAST(COUNT(i.neighbor_id) AS DOUBLE)
              / CAST(3.0 AS DOUBLE), 6) AS recall
          FROM ($bruteTopKOracleSql) e
          LEFT JOIN (${ivfOracleSql(iters = 2, nprobe = 2)}) i
            ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
          GROUP BY 1""",

    // Annotator+ lemmatize=true, fully recomputed in SQL: dictionary terms
    // AND document tokens are lemmatized with the SAME rule chain
    // (lemmaCaseSql == Lemma.lemmaToken), the lemma-space text is rebuilt
    // with separators verbatim (ASCII corpus: normChar on separators is
    // fold twin: the same 1:1 translate pair (inject on doc_id%3==0, fold
    // on the match path) — DuckDB translate is codepoint-wise like Spark's
    "ann_folded" ->
      s"""WITH $dictCte,
          acc AS (SELECT 'doc://' || doc_id AS url,
              CASE WHEN doc_id % 3 = 0
                   THEN translate(text, '${graft.ops.TextOps.AccentTo}',
                                  '${graft.ops.TextOps.AccentFrom}')
                   ELSE text END AS text
            FROM documents),
          fold AS (SELECT url,
              translate(text, '${graft.ops.TextOps.AccentFrom}',
                        '${graft.ops.TextOps.AccentTo}') AS text
            FROM acc)
          SELECT DISTINCT url AS subj, d.class_iri AS obj
          FROM fold, dict d
          WHERE regexp_matches(upper(text), '\\b' || d.term || '\\b')""",

    // identity), hits are located by the regexp-split machinery, and
    // lemma-space offsets map back to ORIGINAL offsets through the per-token
    // cumulative maps (hits start at token starts / end at token ends by the
    // word-boundary contract, so the mapping is two equi-joins).
    "ann_lemma" ->
      s"""WITH $dictCte, $lemmaMatchCtes
          SELECT 'doc://' || m.doc_id AS url, m.f AS "from", m.t AS "to",
            substring(d.text, m.f, m.t - m.f + 1) AS text,
            m.class_iri, m.ont, CASE WHEN m.pref THEN 'PREF' ELSE 'SYN' END AS match_type
          FROM mapped m JOIN documents d USING (doc_id)""",

    // Cohen's kappa between the strict (direct) and lemma match chains:
    // exact integer cells from a full-outer join of the two distinct-pair
    // streams, universe = docs × dict classes, kappa in one division order
    "ann_agreement" ->
      s"""WITH $dictCte, $directCte, $lemmaMatchCtes,
          strict AS (SELECT DISTINCT url, class_iri FROM direct),
          lem AS (SELECT DISTINCT 'doc://' || doc_id AS url, class_iri
                  FROM mapped),
          pres AS (SELECT s.one AS in_s, l.one AS in_l
                   FROM (SELECT url, class_iri, 1 AS one FROM strict) s
                   FULL OUTER JOIN
                        (SELECT url, class_iri, 1 AS one FROM lem) l
                     ON s.url = l.url AND s.class_iri = l.class_iri),
          cells AS (SELECT
              CAST(SUM(CASE WHEN in_s IS NOT NULL AND in_l IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS b11,
              CAST(SUM(CASE WHEN in_s IS NOT NULL AND in_l IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS b10,
              CAST(SUM(CASE WHEN in_s IS NULL AND in_l IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS b01
            FROM pres),
          tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
                    * (SELECT CAST(COUNT(DISTINCT class_iri) AS BIGINT)
                       FROM dict) AS n),
          k AS (SELECT n, b11, b10, b01,
                  n - b11 - b10 - b01 AS a00,
                  (b11 + (n - b11 - b10 - b01)) / n AS po_raw,
                  ((b11 + b10) / n) * ((b11 + b01) / n)
                    + ((b01 + (n - b11 - b10 - b01)) / n)
                      * ((b10 + (n - b11 - b10 - b01)) / n) AS pe_raw
                FROM cells, tot)
          SELECT n AS n_units, b11 AS both_present, b10 AS strict_only,
                 b01 AS lemma_only,
                 ROUND(po_raw, 6) AS po, ROUND(pe_raw, 6) AS pe,
                 CASE WHEN pe_raw = 1.0 THEN 0.0
                   ELSE ROUND((po_raw - pe_raw) / (1.0 - pe_raw), 6) END
                   AS kappa
          FROM k""",

    // Annotator+ clinical context, fully recomputed in SQL: the ConText-lite
    // trigger-window algorithm (Context.classify) re-expressed over the
    // offset machinery — nearest-first ≤5-token window cut at sentence
    // punctuation, breaker scope cut, single + adjacent-pair triggers, and
    // the one-token post-hoc negation lookahead.
    "ann_context" ->
      s"""WITH $dictCte,
          segs AS (
            SELECT doc_id, text, d.class_iri, length(d.term) AS tl,
              regexp_split_to_array(upper(text), '\\b' || d.term || '\\b') AS parts
            FROM documents, dict d),
          pos AS (
            SELECT doc_id, text, class_iri, tl, parts,
              unnest(generate_series(1, len(parts) - 1)) AS k
            FROM segs WHERE len(parts) > 1),
          hits AS (
            SELECT doc_id, text, class_iri, tl,
              CAST((SELECT COALESCE(SUM(length(p)), 0) FROM unnest(parts[1:k]) AS t(p))
                   + (k - 1) * tl + 1 AS BIGINT) AS f
            FROM pos),
          ctx AS (
            SELECT doc_id, class_iri, f, f + tl - 1 AS t_end,
              list_slice(list_reverse(regexp_extract_all(
                regexp_extract(substring(upper(text), 1, CAST(f - 1 AS BIGINT)), '[^.;!?]*$$'),
                '[A-Z0-9_]+')), 1, 5) AS tk,
              regexp_extract(substring(upper(text), CAST(f + tl AS BIGINT)),
                '^[^A-Z0-9_.;!?]*([A-Z0-9_]+)', 1) AS nxt
            FROM hits),
          attrs AS (
            SELECT doc_id, class_iri, f, t_end, tk, nxt,
              LEAST(coalesce(list_position(tk, 'BUT'), 6),
                    coalesce(list_position(tk, 'HOWEVER'), 6),
                    coalesce(list_position(tk, 'EXCEPT'), 6),
                    coalesce(list_position(tk, 'ALTHOUGH'), 6)) AS cut
            FROM ctx)
          SELECT 'doc://' || doc_id AS url, CAST(f AS INT) AS "from",
            CAST(t_end AS INT) AS "to", class_iri,
            (len(list_filter(tk[1:cut-1], x -> x IN
               ('NO','NOT','WITHOUT','DENIES','DENIED','NEVER','ABSENT','NEGATIVE'))) > 0
             OR len(list_filter(generate_series(1, cut - 1), i -> i + 1 <= len(tk)
                  AND (tk[i+1] || '|' || tk[i]) IN
                    ('ABSENCE|OF','NEGATIVE|FOR','RULED|OUT','FREE|OF'))) > 0
             OR nxt = 'UNLIKELY') AS negated,
            CASE WHEN len(list_filter(generate_series(1, cut - 1), i -> i + 1 <= len(tk)
                   AND (tk[i+1] || '|' || tk[i]) IN
                     ('FAMILY|HISTORY','MOTHER|HAD','FATHER|HAD'))) > 0
                 THEN 'OTHER' ELSE 'PATIENT' END AS experiencer,
            CASE WHEN len(list_filter(generate_series(1, cut - 1), i -> i + 1 <= len(tk)
                   AND (tk[i+1] || '|' || tk[i]) IN
                     ('HISTORY|OF','PAST|HISTORY'))) > 0
                 THEN 'HISTORICAL' ELSE 'RECENT' END AS temporality
          FROM attrs""",

    // the reference's nested JSON response, reconstructed BYTE-EXACTLY in
    // SQL: per-class span lists (offset machinery), hierarchy + mappings
    // sub-objects, score-descending annotation order (class breaks ties),
    // null sections omitted — string-compared against Spark's to_json output
    "ann_response_json" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $closureCte,
          segs AS (
            SELECT doc_id, d.class_iri, d.ont, d.pref, length(d.term) AS tl,
              regexp_split_to_array(upper(text), '\\b' || d.term || '\\b') AS parts
            FROM documents, dict d),
          pos AS (
            SELECT doc_id, class_iri, ont, pref, tl, parts,
              unnest(generate_series(1, len(parts) - 1)) AS k
            FROM segs WHERE len(parts) > 1),
          hits AS (
            SELECT doc_id, class_iri, ont, pref,
              CAST((SELECT COALESCE(SUM(length(p)), 0) FROM unnest(parts[1:k]) AS t(p))
                   + (k - 1) * tl + 1 AS BIGINT) AS f, tl
            FROM pos),
          spans AS (
            SELECT doc_id, class_iri, ont,
              string_agg('{"from":' || f || ',"to":' || (f + tl - 1) || ',"match_type":"' ||
                         CASE WHEN pref THEN 'PREF' ELSE 'SYN' END || '"}', ','
                         ORDER BY f, f + tl - 1,
                           CASE WHEN pref THEN 'PREF' ELSE 'SYN' END) AS spans_json,
              SUM(CASE WHEN pref THEN 10.0 ELSE 8.0 END) AS score
            FROM hits GROUP BY doc_id, class_iri, ont),
          direct AS (SELECT DISTINCT doc_id, class_iri FROM spans),
          hier AS (
            SELECT doc_id, class_iri, ancestor_iri, MIN(distance) AS d
            FROM direct JOIN closure ON class_iri = child_iri
            GROUP BY doc_id, class_iri, ancestor_iri),
          hierstr AS (
            SELECT doc_id, class_iri,
              string_agg('{"ancestor":"' || ancestor_iri || '","distance":' || d || '}', ','
                         ORDER BY ancestor_iri, d) AS hier_json
            FROM hier GROUP BY doc_id, class_iri),
          mapstr AS (
            SELECT doc_id, class_iri,
              string_agg(DISTINCT '"' || mapped_iri || '"', ','
                         ORDER BY '"' || mapped_iri || '"') AS map_json
            FROM direct JOIN maps USING (class_iri) GROUP BY doc_id, class_iri),
          ann AS (
            SELECT s.doc_id, s.score, s.class_iri,
              '{"annotatedClass":"' || s.class_iri || '","ont":"' || s.ont || '","score":' ||
              CAST(s.score AS VARCHAR) || ',"annotations":[' || s.spans_json || ']' ||
              COALESCE(',"hierarchy":[' || h.hier_json || ']', '') ||
              COALESCE(',"mappings":[' || m.map_json || ']', '') || '}' AS ann_json
            FROM spans s
            LEFT JOIN hierstr h ON s.doc_id = h.doc_id AND s.class_iri = h.class_iri
            LEFT JOIN mapstr m ON s.doc_id = m.doc_id AND s.class_iri = m.class_iri)
          SELECT 'doc://' || doc_id AS url,
            '{"text_id":"doc://' || doc_id || '","annotations":[' ||
            string_agg(ann_json, ',' ORDER BY -score, class_iri) || ']}' AS response
          FROM ann GROUP BY doc_id""",

    // A5 longest_only WITH offsets: match positions are recovered in pure SQL
    // from the regexp-SPLIT segments (from_k = Σ len(seg_1..k) + (k-1)·|term|
    // + 1 — \b is zero-width so every removed match has the term's length),
    // then the automaton's longest-only contract (per start keep max end) is
    // one window filter. Offsets are 1-based inclusive chars in the ORIGINAL
    // text; `substring(text, from, len)` re-reads the original-case match.
    "ann_longest" ->
      s"""WITH $dictCte,
          segs AS (SELECT doc_id, text, d.term, d.class_iri, d.ont, d.pref,
            regexp_split_to_array(upper(text), '\\b' || d.term || '\\b') AS parts,
            length(d.term) AS tl
            FROM documents, dict d),
          pos AS (SELECT doc_id, text, class_iri, ont, pref, parts, tl,
            unnest(generate_series(1, len(parts) - 1)) AS k
            FROM segs WHERE len(parts) > 1),
          hits AS (SELECT doc_id, text, class_iri, ont, pref, tl,
            CAST((SELECT COALESCE(SUM(length(p)), 0) FROM unnest(parts[1:k]) AS t(p))
                 + (k - 1) * tl + 1 AS BIGINT) AS f
            FROM pos),
          longest AS (SELECT *,
            MAX(f + tl - 1) OVER (PARTITION BY doc_id, f) AS max_to FROM hits)
          SELECT 'doc://' || doc_id AS url, CAST(f AS INT) AS "from",
                 CAST(f + tl - 1 AS INT) AS "to",
                 substring(text, f, CAST(tl AS BIGINT)) AS text,
                 class_iri, ont,
                 CASE WHEN pref THEN 'PREF' ELSE 'SYN' END AS match_type
          FROM longest WHERE f + tl - 1 = max_to""",

    // full independent recomputation: portable md5-hex minhash → banding →
    // hot-bucket cap → candidate pairs → exact-jaccard rerank (params
    // mirrored from the query: n=3, k=16, bands=4 (r=4), maxBucket=1000,
    // threshold 0.8 on the raw jaccard)
    "dedup_minhash" -> minhashPairsOracleSql,

    // LSH candidate recall vs the exact-Jaccard ground truth — the dedup
    // sibling of sim_ivf_recall: both audited chains nested as derived
    // tables (the LSH pipeline reranks on exact jaccard, so its pairs are
    // a SUBSET of the ground truth and n_common == n_lsh by construction
    // — asserted by the shared count)
    "dedup_lsh_recall" ->
      s"""WITH ex AS (SELECT COUNT(*) AS n_exact
                      FROM ($jaccardPairsOracleSql) a),
          ls AS (SELECT COUNT(*) AS n_lsh FROM ($minhashPairsOracleSql) b),
          cm AS (SELECT COUNT(*) AS n_common
                 FROM ($jaccardPairsOracleSql) a
                 JOIN ($minhashPairsOracleSql) b USING (doc_a, doc_b))
          SELECT ex.n_exact, ls.n_lsh, cm.n_common,
            ROUND(CAST(cm.n_common AS DOUBLE)
              / CAST(ex.n_exact AS DOUBLE), 6) AS recall
          FROM ex, ls, cm""",

    // the incremental engine path must equal the FULL pipeline restricted
    // to pairs that touch a new (doc_id % 7 == 0) doc — shared CTEs, so the
    // bucket-cap population is the combined corpus's, as in the engine
    "dedup_incremental" ->
      s"""WITH $minhashCtes
          SELECT doc_a, doc_b,
                 ROUND(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
            AND (doc_a % 7 = 0 OR doc_b % 7 = 0)""",

    // the MinHash pair set (same CTEs as dedup_minhash) closed into
    // clusters by recursive min-label reachability — the kg_components
    // oracle shape over dup pairs
    "dedup_cluster" ->
      s"""WITH RECURSIVE $minhashCtes,
          prs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sizes sa ON sa.doc_id = doc_a
                  JOIN sizes sb ON sb.doc_id = doc_b
                  WHERE n_common / (sa.n + sb.n - n_common) >= 0.8),
          und AS (SELECT doc_a AS a, doc_b AS b FROM prs
                  UNION SELECT doc_b, doc_a FROM prs),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
          SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
          FROM reach GROUP BY a""",

    // the cluster chain + the text_quality formula + a per-cluster argmax
    // window (quality desc, doc_id asc — the engine's struct order)
    "dedup_canonical" ->
      s"""WITH RECURSIVE $minhashCtes,
          prs AS (SELECT doc_a, doc_b FROM inter
                  JOIN sizes sa ON sa.doc_id = doc_a
                  JOIN sizes sb ON sb.doc_id = doc_b
                  WHERE n_common / (sa.n + sb.n - n_common) >= 0.8),
          und AS (SELECT doc_a AS a, doc_b AS b FROM prs
                  UNION SELECT doc_b, doc_a FROM prs),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
                 FROM reach GROUP BY a),
          q AS (SELECT doc_id, $qualityExprSql AS quality
                FROM documents),
          w AS (SELECT cl.cluster, cl.doc_id, q.quality,
                  row_number() OVER (PARTITION BY cl.cluster
                    ORDER BY q.quality DESC, cl.doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY cl.cluster) AS n_members
                FROM cl JOIN q USING (doc_id))
          SELECT cluster, doc_id AS canonical_id, quality,
            CAST(n_members AS BIGINT) AS n_members
          FROM w WHERE rn = 1""",

    // full independent recomputation of the 64-bit simhash (per-token rolling
    // fingerprint → per-bit majority vote → signature) + ALL-PAIRS hamming ≤ 3
    // — equal to the banded query by the pigeonhole guarantee (≤ 3 differing
    // bits always leave ≥ 1 of 4 bands identical), so this checks banding
    // completeness too
    "dedup_simhash" ->
      s"""WITH RECURSIVE powers(b, p) AS (
            SELECT 0, 1::HUGEINT UNION ALL SELECT b + 1, p * 2 FROM powers WHERE b < 63),
          tokc AS (SELECT doc_id, tok, COUNT(*) AS cnt
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
                   GROUP BY doc_id, tok),
          tokh AS (SELECT doc_id, cnt, ${fpSql("tok")} AS h FROM tokc),
          bits AS (SELECT doc_id, p,
                     SUM(CASE WHEN (h // p) % 2 = 1 THEN cnt ELSE -cnt END) AS c
                   FROM tokh, powers GROUP BY doc_id, p),
          rawsig AS (SELECT doc_id,
                       SUM(CASE WHEN c > 0 THEN p ELSE 0::HUGEINT END) AS v
                     FROM bits GROUP BY doc_id),
          sig AS (SELECT doc_id, ${toSignedSql("v")} AS s FROM rawsig)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.s, b.s)) <= 3""",

    // portable recomputation: hyperplane literals are the SAME deterministic
    // values the Spark side derives (Similarity.hyperplaneSqlValues — single
    // source of truth), bucket = packed dot-product signs, then the exact
    // cosine rerank of sim_topk restricted to same-bucket candidates
    "sim_lsh" ->
      s"""WITH planes(p, v) AS (SELECT * FROM (VALUES ${Similarity.hyperplaneSqlValues(6, 64)}) x(a, b)),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
          buck AS (SELECT vec_id,
                     CAST(SUM(CASE WHEN list_dot_product(v, emb) >= 0
                              THEN (1 << p) ELSE 0 END) AS INT) AS bucket
                   FROM e, planes GROUP BY vec_id),
          eb AS (SELECT e.vec_id, emb, bucket FROM e JOIN buck USING (vec_id)),
          q AS (SELECT vec_id AS query_id, emb AS q_emb, bucket AS q_bucket
                FROM eb WHERE vec_id < 10),
          s AS (SELECT query_id, eb.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q_emb, emb) /
                    sqrt(list_dot_product(q_emb, q_emb) * list_dot_product(emb, emb)), 4) AS cos
                FROM q JOIN eb ON q.q_bucket = eb.bucket AND eb.vec_id <> q.query_id),
          r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank FROM s)
          SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
          FROM r WHERE rank <= 3""",

    // IVF with the seeded-Lloyd quantizer, fully recomputed in SQL: seed
    // centroids = first 8 vectors, then the SAME 2 Lloyd rounds (cosine
    // assignment with c_id tie-break, per-dim means ROUNDed to 6dp — the
    // cross-engine float-sum contract), final assignment of ALL vectors on
    // the UNROUNDED cosine, probe own list, exact rerank
    "sim_ivf" -> ivfOracleSql(iters = 2),
    "sim_pq" -> pqOracleSql(),

    // the sim_ivf_recall shape over the PQ oracle: exact top-3 LEFT JOIN
    // PQ top-3 on (query, neighbor), hit-count / 3 per query
    "sim_pq_recall" ->
      s"""SELECT e.query_id,
            ROUND(CAST(COUNT(p.neighbor_id) AS DOUBLE)
              / CAST(3.0 AS DOUBLE), 6) AS recall
          FROM ($bruteTopKOracleSql) e
          LEFT JOIN (${pqOracleSql()}) p
            ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
          GROUP BY 1""",

    // same trained-quantizer chain; per-member 4dp cosine, then 4dp mean
    "sim_ivf_stats" ->
      s"""WITH ${ivfChainCtes(2)},
          cj AS (SELECT aff.bucket,
                   ROUND(list_dot_product(aff.emb, c.c_emb) /
                     sqrt(list_dot_product(aff.emb, aff.emb)
                          * list_dot_product(c.c_emb, c.c_emb)), 4) AS ccos
                 FROM aff JOIN c2 c ON c.c_id = aff.bucket)
          SELECT bucket, COUNT(*) AS list_size,
            ROUND(AVG(ccos), 4) AS mean_cos
          FROM cj GROUP BY bucket""",

    // multi-probe: identical chain, the probe set keeps rn <= 2 per query
    "sim_ivf_probe2" -> ivfOracleSql(iters = 2, nprobe = 2),

    // embedding near-dup pairs: same bucket SQL as sim_lsh, pair join,
    // threshold on the 4dp-rounded cosine (the query's output contract)
    "sim_dup_pairs" ->
      s"""WITH planes(p, v) AS (SELECT * FROM (VALUES ${Similarity.hyperplaneSqlValues(6, 64)}) x(a, b)),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
          buck AS (SELECT vec_id,
                     CAST(SUM(CASE WHEN list_dot_product(v, emb) >= 0
                              THEN (1 << p) ELSE 0 END) AS INT) AS bucket
                   FROM e, planes GROUP BY vec_id),
          eb AS (SELECT e.vec_id, emb, bucket FROM e JOIN buck USING (vec_id))
          SELECT l.vec_id AS doc_a, r.vec_id AS doc_b,
                 ROUND(list_dot_product(l.emb, r.emb) /
                   sqrt(list_dot_product(l.emb, l.emb) * list_dot_product(r.emb, r.emb)), 4) AS cos
          FROM eb l JOIN eb r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
          WHERE ROUND(list_dot_product(l.emb, r.emb) /
                  sqrt(list_dot_product(l.emb, l.emb) * list_dot_product(r.emb, r.emb)), 4) >= 0.3""",

    // independent recomputation of the rolling 64-bit fingerprint in SQL
    "text_fingerprint" ->
      s"""WITH fp AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, ${fpSql("text")} AS v
                      FROM documents)
          SELECT doc_id, ${toSignedSql("v")} AS fingerprint FROM fp""",

    "text_tokens" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
           CAST(length(text) AS INT) AS n_chars
         FROM documents""",

    "text_vocab" ->
      """SELECT token, freq, CAST(rn AS INT) AS token_id FROM (
           SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token) AS rn
           FROM (SELECT w AS token, COUNT(*) AS freq FROM (
                   SELECT unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> '' GROUP BY 1))
         WHERE rn <= 100""",

    "text_bpe" -> bpeOracleSql(vocabWords = 50, merges = 8),

    "text_bpe_encode" -> bpeEncodeOracleSql(vocabWords = 50, merges = 8),

    // positioned shingle hashes in HUGEINT (the fpSql twin), per-window
    // argmin with the rightmost-tie order, distinct selected pairs
    "text_winnow" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                        WHERE len(string_split(text, ' ')) >= 3),
          pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS p FROM toks),
          sh AS (SELECT doc_id, p, array_to_string(t[p:p+2], ' ') AS g FROM pos),
          hh AS (SELECT doc_id, p, ${toSignedSql(fpSql("g"))} AS hv FROM sh),
          np AS (SELECT doc_id, MAX(p) AS n FROM hh GROUP BY 1),
          win AS (SELECT hh.doc_id, hh.p AS wstart FROM hh JOIN np USING (doc_id)
                  WHERE np.n >= 4 AND hh.p <= np.n - 3),
          cand AS (SELECT w.doc_id, w.wstart, h2.p, h2.hv
                   FROM win w JOIN hh h2 ON h2.doc_id = w.doc_id
                     AND h2.p BETWEEN w.wstart AND w.wstart + 3),
          sel AS (SELECT doc_id, wstart, p, hv, row_number() OVER (
                    PARTITION BY doc_id, wstart ORDER BY hv, p DESC) AS rn
                  FROM cand)
          SELECT DISTINCT doc_id, CAST(p AS INT) AS pos, hv AS hash
          FROM sel WHERE rn = 1""",

    // fertility (pieces/word) and chars/piece over the same encode chain
    "text_bpe_stats" ->
      s"""WITH ${bpeEncodeCtes(vocabWords = 50, merges = 8)}
          SELECT doc_id, COUNT(*) AS n_pieces,
            COUNT(DISTINCT word_pos) AS n_words,
            ROUND(CAST(COUNT(*) AS DOUBLE)
              / CAST(COUNT(DISTINCT word_pos) AS DOUBLE), 6) AS fertility,
            ROUND(CAST(SUM(length(piece)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 6) AS chars_per_piece
          FROM enc_pieces GROUP BY doc_id""",

    "text_sample_pps" ->
      """SELECT shard, doc_id, n_chars,
           CAST(FLOOR(CAST(cb + n_chars AS DOUBLE) / (CAST(wt AS DOUBLE) / 4.0))
              - FLOOR(CAST(cb AS DOUBLE) / (CAST(wt AS DOUBLE) / 4.0))
             AS INT) AS n_hits
         FROM (SELECT shard, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
             SUM(n_chars) OVER (PARTITION BY shard) AS wt
           FROM (SELECT doc_id, doc_id % 16 AS shard, n_chars
                 FROM documents))
         WHERE CAST(FLOOR(CAST(cb + n_chars AS DOUBLE) / (CAST(wt AS DOUBLE) / 4.0))
              - FLOOR(CAST(cb AS DOUBLE) / (CAST(wt AS DOUBLE) / 4.0)) AS INT) > 0""",

    "text_pack" ->
      """SELECT shard, doc_id, n_tokens,
           CAST(FLOOR(tb / 512) AS INT) AS seq_id,
           CAST(tb % 512 AS INT) AS seq_offset
         FROM (SELECT shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb
           FROM (SELECT doc_id, doc_id % 32 AS shard,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
             FROM documents))""",

    "text_split" ->
      """SELECT doc_id, lang,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, lang,
                 CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % 100 AS b
               FROM documents)""",

    "text_redact" ->
      """SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
               'g'),
             '[+]?[0-9][0-9 ()+.-]{6,}[0-9]', '<PHONE>', 'g') AS text_redacted
         FROM documents""",

    "text_chunks" ->
      """WITH st AS (
           SELECT doc_id, text,
             unnest(generate_series(1,
               greatest(length(text) - 50, 1), 150)) AS chunk_start
           FROM documents WHERE length(text) > 0)
         SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
                substr(text, chunk_start, 200) AS chunk,
                CAST(length(substr(text, chunk_start, 200)) AS INT) AS chunk_len
         FROM st""",

    "text_sample" ->
      """SELECT doc_id, lang, bucket FROM (
           SELECT doc_id, lang,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS bucket
           FROM documents)
         WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""",

    // keep-rate derived from the live per-lang counts (ceil division in
    // double, mirrored), then the same portable-hash keep decision
    "curate_quota_sample" ->
      """WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
                      FROM documents GROUP BY 1),
          rates AS (SELECT lang,
                      LEAST(100, CAST(CEIL(CAST(10000.0 AS DOUBLE) / c) AS BIGINT)) AS pct
                    FROM cnt)
          SELECT d.doc_id, d.lang, r.pct
          FROM documents d JOIN rates r USING (lang)
          WHERE CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 100 < r.pct""",

    "kg_curated_triples" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte,
          keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
          q AS (SELECT doc_id, $qualityExprSql AS quality
            FROM documents),
          cdocs AS (SELECT d.doc_id, d.text FROM documents d
                    JOIN keep ON d.doc_id = keep.doc_id
                    JOIN q ON d.doc_id = q.doc_id WHERE q.quality >= 0.5),
          direct AS (SELECT DISTINCT 'doc://' || doc_id AS url, dd.class_iri
                     FROM cdocs, dict dd
                     WHERE regexp_matches(upper(text), '\\b' || dd.term || '\\b')),
          $closureCte
          SELECT url AS subj, 'hasAnnotation' AS pred, class_iri AS obj FROM direct
          UNION
          SELECT dr.url AS subj, 'hasExpandedAnnotation' AS pred, cl.ancestor_iri AS obj
          FROM direct dr JOIN closure cl ON dr.class_iri = cl.child_iri
          UNION
          SELECT dr.url AS subj, 'hasMappedAnnotation' AS pred, m.mapped_iri AS obj
          FROM direct dr JOIN maps m ON dr.class_iri = m.class_iri""",

    // co-occurrence graph over the direct annotations (pairs-per-doc, a<b).
    // The Spark side's maxPerDoc skew cap (1000) is not modeled here: no
    // fixture doc approaches it, so the oracle proves the UNCAPPED
    // semantics; the cap behavior is unit-tested in KgGraphSpec.
    "kg_cooccur" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct)
          SELECT a.class_iri AS src, b.class_iri AS dst,
                 CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM pairs a JOIN pairs b
            ON a.url = b.url AND a.class_iri < b.class_iri
          GROUP BY 1, 2""",

    // every occurrence offset recovered from regexp-split segment lengths
    // (the kg_salience machinery, with the term length carried so the
    // window end is exact); same clipping arithmetic
    // coref twin: token-space mention spans (n-gram equality against the
    // dict — boundary-equivalent to the engine on this single-space
    // corpus), antecedent = MAX mention end before each pronoun, ambiguous
    // nearest mentions fan out through the second cments join
    "kg_coref" ->
      s"""WITH $dictCte,
          ${graft.ops.Relations.corefCtesSql},
          maxe AS (SELECT pr.url, pr.p, MAX(m.endp) AS endp
                   FROM cprons pr JOIN cments m
                     ON m.url = pr.url AND m.endp < pr.p
                   GROUP BY 1, 2)
          SELECT x.url AS subj, '${graft.ops.Relations.CorefPred}' AS pred,
            m.class_iri AS obj,
            CAST(COUNT(DISTINCT x.p) AS BIGINT) AS n_pronouns
          FROM maxe x JOIN cments m ON m.url = x.url AND m.endp = x.endp
          GROUP BY 1, 2, 3""",

    "kg_mention_contexts" ->
      s"""WITH $dictCte,
          segs AS (SELECT doc_id, text, d.class_iri, length(d.term) AS tl,
              regexp_split_to_array(upper(text), '\\b' || d.term || '\\b') AS parts
            FROM documents, dict d),
          pos AS (SELECT doc_id, text, class_iri, tl, parts,
              unnest(generate_series(1, len(parts) - 1)) AS k
            FROM segs WHERE len(parts) > 1),
          hits AS (SELECT doc_id, text, class_iri, tl,
              CAST((SELECT COALESCE(SUM(length(p)), 0)
                    FROM unnest(parts[1:k]) AS t(p))
                + (k - 1) * tl + 1 AS BIGINT) AS f
            FROM pos)
          SELECT DISTINCT 'doc://' || doc_id AS url, class_iri,
            CAST(f AS INT) AS mention_from,
            substr(text, CAST(GREATEST(1, f - 30) AS BIGINT),
              CAST((f + tl - 1 + 30) - GREATEST(1, f - 30) + 1 AS BIGINT)) AS context
          FROM hits""",

    // cooc-with-counts chain + the type VALUES, unordered type pairs via
    // LEAST/GREATEST (the engine's least/greatest twin)
    "kg_type_graph" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                     COUNT(*) AS n_docs
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          tt(class_iri, tui) AS (
            SELECT * FROM (VALUES ${OntologyFixture.tuisValues}) v(a, b)),
          j AS (SELECT LEAST(ta.tui, tb.tui) AS tui_a,
                  GREATEST(ta.tui, tb.tui) AS tui_b, c.n_docs
                FROM cooc c
                JOIN tt ta ON ta.class_iri = c.src
                JOIN tt tb ON tb.class_iri = c.dst)
          SELECT tui_a, tui_b, CAST(SUM(n_docs) AS BIGINT) AS edge_mass,
            COUNT(*) AS n_pairs
          FROM j GROUP BY 1, 2""",

    "kg_degree" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                          COUNT(*) AS n_docs
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          und AS (SELECT src AS class_iri, n_docs FROM cooc
                  UNION ALL SELECT dst, n_docs FROM cooc)
          SELECT class_iri, CAST(COUNT(*) AS BIGINT) AS degree,
                 CAST(SUM(n_docs) AS BIGINT) AS weight
          FROM und GROUP BY 1""",

    // component label = MIN(class_iri) reachable — the declarative twin of
    // the engine's iterative min-label propagation (undirected closure via
    // recursive CTE, then per-node min over self + reachable)
    "kg_components" ->
      s"""WITH RECURSIVE $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          und AS (SELECT src AS a, dst AS b FROM cooc
                  UNION SELECT dst, src FROM cooc),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
          SELECT a AS class_iri, LEAST(a, MIN(b)) AS component
          FROM reach GROUP BY a""",

    // same recursive reach chain rolled up to the size histogram; the node
    // total rides along as a 1-row scalar (division order mirrored, 6dp)
    "kg_component_sizes" ->
      s"""WITH RECURSIVE $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          und AS (SELECT src AS a, dst AS b FROM cooc
                  UNION SELECT dst, src FROM cooc),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          comp AS (SELECT a AS class_iri, LEAST(a, MIN(b)) AS component
                   FROM reach GROUP BY a),
          sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS size
                 FROM comp GROUP BY 1),
          dist AS (SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
                   FROM sz GROUP BY 1),
          tot AS (SELECT CAST(SUM(size) AS DOUBLE) AS n_nodes FROM sz)
          SELECT size, n_components,
                 ROUND(size * n_components / n_nodes, 6) AS node_fraction
          FROM dist, tot""",

    // degree chain + triangle wedge chain LEFT-joined; cc division order
    // (2·tri first, then the integer deg·(deg−1) denominator) mirrored, 6dp
    "kg_clustering" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          degt AS (SELECT class_iri, CAST(COUNT(*) AS BIGINT) AS degree
                   FROM (SELECT src AS class_iri FROM cooc
                         UNION ALL SELECT dst FROM cooc) GROUP BY 1),
          tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                  FROM cooc e1
                  JOIN cooc e2 ON e1.src = e2.src AND e1.dst < e2.dst
                  JOIN cooc e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
          tcnt AS (SELECT class_iri, CAST(COUNT(*) AS BIGINT) AS n_triangles
                   FROM (SELECT a AS class_iri FROM tri
                         UNION ALL SELECT b FROM tri
                         UNION ALL SELECT c FROM tri) GROUP BY 1)
          SELECT d.class_iri, d.degree,
                 COALESCE(t.n_triangles, 0) AS n_triangles,
                 CASE WHEN d.degree >= 2
                   THEN ROUND(2.0 * COALESCE(t.n_triangles, 0)
                          / (d.degree * (d.degree - 1)), 6)
                   ELSE 0.0 END AS local_cc
          FROM degt d LEFT JOIN tcnt t USING (class_iri)""",

    // exact integer moments (n, Σk, Σk², Σkxky) over both orientations,
    // then the Pearson r in the engine's division order; zero variance → 0
    "kg_assortativity" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS k
                  FROM (SELECT src AS node FROM cooc
                        UNION ALL SELECT dst FROM cooc) GROUP BY 1),
          orient AS (SELECT src, dst FROM cooc
                     UNION ALL SELECT dst AS src, src AS dst FROM cooc),
          jj AS (SELECT dx.k AS kx, dy.k AS ky
                 FROM orient o
                 JOIN deg dx ON o.src = dx.node
                 JOIN deg dy ON o.dst = dy.node),
          agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(kx) AS BIGINT) AS sx,
                    CAST(SUM(kx * kx) AS BIGINT) AS sxx,
                    CAST(SUM(kx * ky) AS BIGINT) AS sxy FROM jj)
          SELECT n AS n_endpoints,
                 CASE WHEN (sxx / n - POW(sx / n, 2.0)) = 0.0 THEN 0.0
                   ELSE ROUND((sxy / n - POW(sx / n, 2.0))
                          / (sxx / n - POW(sx / n, 2.0)), 6) END
                   AS assortativity
          FROM agg""",

    // each leg recomputed from its audited oracle chain (dict universe,
    // occurrence counts, min-distance closure, mapping VALUES), LEFT-joined
    // with zero coalesces
    "kg_concept_profile" ->
      s"""WITH RECURSIVE $dictCte, $directCte, $cntsCte, $edgesCte, $closureCte, $mappingsCte,
          uni AS (SELECT class_iri, ont, COUNT(DISTINCT term) AS n_terms
                  FROM dict GROUP BY 1, 2),
          md AS (SELECT class_iri, COUNT(DISTINCT url) AS n_docs
                 FROM direct GROUP BY 1),
          mm AS (SELECT class_iri, CAST(SUM(cnt) AS BIGINT) AS n_mentions
                 FROM cnts WHERE cnt > 0 GROUP BY 1),
          anc AS (SELECT child_iri AS class_iri,
                    COUNT(DISTINCT ancestor_iri) AS n_ancestors
                  FROM closure GROUP BY 1),
          mp AS (SELECT class_iri, COUNT(*) AS n_mappings FROM maps GROUP BY 1)
          SELECT uni.class_iri, uni.ont, uni.n_terms,
            COALESCE(md.n_docs, 0) AS n_docs,
            COALESCE(mm.n_mentions, 0) AS n_mentions,
            COALESCE(anc.n_ancestors, 0) AS n_ancestors,
            COALESCE(mp.n_mappings, 0) AS n_mappings
          FROM uni
          LEFT JOIN md ON md.class_iri = uni.class_iri
          LEFT JOIN mm ON mm.class_iri = uni.class_iri
          LEFT JOIN anc ON anc.class_iri = uni.class_iri
          LEFT JOIN mp ON mp.class_iri = uni.class_iri""",

    // same crafted back-edge; cycles surface as (x, x) closure rows with
    // min distance = cycle length
    "dict_cycle_check" ->
      s"""WITH RECURSIVE edges(child_iri, parent_iri) AS (
            SELECT * FROM (VALUES ${OntologyFixture.edgesValues}) v(a, b)
            UNION ALL
            SELECT 'http://fix.onto/ONT1#C000', 'http://fix.onto/ONT1#C006'),
          $closureCte
          SELECT child_iri AS class_iri, CAST(MIN(distance) AS INT) AS cycle_len
          FROM closure WHERE child_iri = ancestor_iri GROUP BY 1""",

    // depth = MIN closure distance to a root (never-a-child concept),
    // roots at 0, −1 when no root path fits the ≤5 cap
    "dict_depth_histogram" ->
      s"""WITH RECURSIVE $edgesCte, $closureCte,
          con AS (SELECT DISTINCT * FROM
                    (VALUES ${OntologyFixture.conceptIriValues}) v(class_iri)),
          ch AS (SELECT DISTINCT child_iri AS class_iri FROM edges),
          roots AS (SELECT con.class_iri FROM con
                    LEFT JOIN ch ON con.class_iri = ch.class_iri
                    WHERE ch.class_iri IS NULL),
          rootdist AS (SELECT c.child_iri AS class_iri,
                         MIN(c.distance) AS d
                       FROM closure c
                       JOIN roots r ON c.ancestor_iri = r.class_iri
                       GROUP BY 1),
          dep AS (SELECT con.class_iri,
                    CASE WHEN ch.class_iri IS NULL THEN 0
                      ELSE COALESCE(CAST(rd.d AS INT), -1) END AS depth
                  FROM con
                  LEFT JOIN ch ON con.class_iri = ch.class_iri
                  LEFT JOIN rootdist rd ON con.class_iri = rd.class_iri)
          SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_concepts
          FROM dep GROUP BY 1""",

    // redundant = reachable through a sibling out-edge's closure (same ≤5
    // depth cap both sides)
    "kg_transitive_reduction" ->
      s"""WITH RECURSIVE edges(child_iri, parent_iri) AS (
            SELECT DISTINCT * FROM (
              SELECT * FROM (VALUES ${OntologyFixture.edgesValues}) v(a, b)
              UNION ALL
              SELECT * FROM (VALUES ${OntologyFixture.edgesDeltaValues}) w(a, b)) z),
          $closureCte,
          via AS (SELECT DISTINCT e.child_iri, c.ancestor_iri AS parent_iri
                  FROM edges e JOIN closure c ON c.child_iri = e.parent_iri)
          SELECT e.child_iri, e.parent_iri,
            (v.child_iri IS NOT NULL) AS redundant
          FROM edges e LEFT JOIN via v
            ON v.child_iri = e.child_iri AND v.parent_iri = e.parent_iri""",

    // recursive mutual-reachability over the symmetrized mapping edges,
    // canonical = min IRI of the clique (the components-oracle shape over
    // the mappings VALUES)
    "kg_sameas_closure" ->
      s"""WITH RECURSIVE $mappingsCte,
          und AS (SELECT class_iri AS a, mapped_iri AS b FROM maps
                  UNION SELECT mapped_iri, class_iri FROM maps),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
          SELECT a AS class_iri, LEAST(a, MIN(b)) AS canonical_iri
          FROM reach GROUP BY a""",

    // same snapshot synthesis + the regex twin of the direct scan, per
    // snapshot; survival = last fact epoch equals the doc's last capture
    // gaps-and-islands twin: island key = visit − row_number per fact;
    // half-split and epoch arithmetic shared with the kg_fact_history pair
    "kg_fact_intervals" ->
      s"""WITH $dictCte,
          hist AS (SELECT doc_id, v.visit,
              CASE WHEN v.visit % 2 = 0 THEN text
                   ELSE array_to_string(l[1:(len(l) + 1) // 2], ' ') END AS text
            FROM (SELECT doc_id, text, string_split(text, ' ') AS l
                  FROM documents) z,
              (SELECT unnest(generate_series(0, ${FactVisits - 1})) AS visit) v),
          f AS (SELECT DISTINCT h.doc_id, h.visit, d.class_iri
                FROM hist h, dict d
                WHERE regexp_matches(upper(h.text), '\\b' || d.term || '\\b')),
          isl AS (SELECT doc_id, class_iri, visit,
              visit - ROW_NUMBER() OVER (PARTITION BY doc_id, class_iri
                                         ORDER BY visit) AS island
            FROM f)
          SELECT 'doc://' || doc_id AS subj, class_iri AS obj,
            1700000000 + MIN(visit) * 604800 AS valid_from,
            1700000000 + MAX(visit) * 604800 AS valid_to,
            CAST(COUNT(*) AS BIGINT) AS n_visits
          FROM isl GROUP BY doc_id, class_iri, island""",

    "kg_fact_history" ->
      s"""WITH $dictCte,
          s1 AS (SELECT doc_id, text, 1 AS snapshot,
              1700000000 + doc_id * 60 AS fetch_epoch FROM documents),
          s2 AS (SELECT doc_id,
              array_to_string(l[1:(len(l) + 1) // 2], ' ') AS text,
              2 AS snapshot, 1700000000 + doc_id * 60 + 604800 AS fetch_epoch
            FROM (SELECT doc_id, text, string_split(text, ' ') AS l
                  FROM documents) z
            WHERE doc_id % 3 = 0),
          snaps AS (SELECT doc_id, text, snapshot, fetch_epoch FROM s1
                    UNION ALL SELECT doc_id, text, snapshot, fetch_epoch FROM s2),
          facts AS (SELECT DISTINCT doc_id, snapshot, fetch_epoch, d.class_iri
            FROM snaps, dict d
            WHERE regexp_matches(upper(text), '\\b' || d.term || '\\b')),
          cap AS (SELECT doc_id, MAX(fetch_epoch) AS last_cap
                  FROM snaps GROUP BY 1)
          SELECT 'doc://' || f.doc_id AS subj, f.class_iri AS obj,
            MIN(f.fetch_epoch) AS first_epoch, MAX(f.fetch_epoch) AS last_epoch,
            COUNT(DISTINCT f.snapshot) AS n_snapshots,
            (MAX(f.fetch_epoch) = MAX(c.last_cap)) AS current
          FROM facts f JOIN cap c USING (doc_id)
          GROUP BY 1, 2""",

    // per doc: latest capture at or before AsOfEpoch (epochs are distinct
    // within a doc, so the MAX join is the argmax), annotated
    "kg_asof_snapshot" ->
      s"""WITH $dictCte,
          s1 AS (SELECT doc_id, text, 1 AS snapshot,
              1700000000 + doc_id * 60 AS fetch_epoch FROM documents),
          s2 AS (SELECT doc_id,
              array_to_string(l[1:(len(l) + 1) // 2], ' ') AS text,
              2 AS snapshot, 1700000000 + doc_id * 60 + 604800 AS fetch_epoch
            FROM (SELECT doc_id, text, string_split(text, ' ') AS l
                  FROM documents) z
            WHERE doc_id % 3 = 0),
          snaps AS (SELECT doc_id, text, snapshot, fetch_epoch FROM s1
                    UNION ALL SELECT doc_id, text, snapshot, fetch_epoch FROM s2),
          live AS (SELECT * FROM snaps WHERE fetch_epoch <= ${AsOfEpoch}),
          chosen AS (SELECT doc_id, MAX(fetch_epoch) AS fetch_epoch
                     FROM live GROUP BY 1),
          cs AS (SELECT l.doc_id, l.snapshot, l.fetch_epoch, l.text
                 FROM live l JOIN chosen c
                   ON l.doc_id = c.doc_id AND l.fetch_epoch = c.fetch_epoch)
          SELECT DISTINCT 'doc://' || cs.doc_id AS subj, d.class_iri AS obj,
            cs.snapshot, cs.fetch_epoch
          FROM cs, dict d
          WHERE regexp_matches(upper(cs.text), '\\b' || d.term || '\\b')""",

    // per-concept fact counts, totals as a scalar, exact integer
    // share/salt math mirroring the engine's div arithmetic
    "q_skew_report" ->
      s"""WITH RECURSIVE $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          counts AS (SELECT class_iri, CAST(COUNT(*) AS BIGINT) AS n
                     FROM pairs GROUP BY 1),
          tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
          SELECT class_iri, n,
            CAST((n * 1000000) // total AS BIGINT) AS share_ppm,
            CAST((n * 32 + total - 1) // total AS BIGINT) AS salt_factor
          FROM counts, tot
          ORDER BY n DESC, class_iri LIMIT 10""",

    // incremental merge must be invisible in the result — same oracle as
    // the cold run
    "kg_components_delta" ->
      s"""WITH RECURSIVE $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          und AS (SELECT src AS a, dst AS b FROM cooc
                  UNION SELECT dst, src FROM cooc),
          reach(a, b) AS (SELECT a, b FROM und
                          UNION
                          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
          SELECT a AS class_iri, LEAST(a, MIN(b)) AS component
          FROM reach GROUP BY a""",

    "kg_pagerank" -> pageRankOracleSql(iters = 10, weighted = false),

    "kg_katz" -> katzOracleSql(iters = 5),

    "kg_kcore" -> kcoreOracleSql(k = 3, iters = 8),

    "kg_pagerank_weighted" -> pageRankOracleSql(iters = 10, weighted = true),

    // |docs(a) ∩ docs(b)| from the co-occurrence pairs; union via counts
    "kg_concept_sim" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                          COUNT(*) AS n_docs
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          dc AS (SELECT class_iri, COUNT(*) AS n FROM pairs GROUP BY 1)
          SELECT c.src, c.dst,
                 ROUND(c.n_docs / CAST(sa.n + sb.n - c.n_docs AS DOUBLE), 6)
                   AS jaccard
          FROM cooc c
          JOIN dc sa ON sa.class_iri = c.src
          JOIN dc sb ON sb.class_iri = c.dst""",

    "kg_pmi" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                          COUNT(*) AS n_docs
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          dc AS (SELECT class_iri, COUNT(*) AS n FROM pairs GROUP BY 1),
          nn AS (SELECT CAST(COUNT(DISTINCT url) AS DOUBLE) AS n FROM pairs)
          SELECT c.src, c.dst, c.n_docs,
                 ROUND(ln(CAST(c.n_docs AS DOUBLE) * (SELECT n FROM nn)
                   / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE))), 6) AS pmi
          FROM cooc c
          JOIN dc sa ON sa.class_iri = c.src
          JOIN dc sb ON sb.class_iri = c.dst""",

    // Milne–Witten: same pair/doc-count scaffolding as kg_pmi, distance
    // form (ln max − ln common) / (ln N − ln min); min-df = N pairs dropped
    "kg_relatedness" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                          COUNT(*) AS n_docs
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          dc AS (SELECT class_iri, COUNT(*) AS n FROM pairs GROUP BY 1),
          nn AS (SELECT CAST(COUNT(DISTINCT url) AS DOUBLE) AS n FROM pairs)
          SELECT c.src, c.dst, c.n_docs, sa.n AS n_a, sb.n AS n_b,
                 ROUND((ln(CAST(GREATEST(sa.n, sb.n) AS DOUBLE))
                     - ln(CAST(c.n_docs AS DOUBLE)))
                   / (ln((SELECT n FROM nn))
                     - ln(CAST(LEAST(sa.n, sb.n) AS DOUBLE))), 6) AS mw_distance
          FROM cooc c
          JOIN dc sa ON sa.class_iri = c.src
          JOIN dc sb ON sb.class_iri = c.dst
          WHERE CAST(LEAST(sa.n, sb.n) AS DOUBLE) < (SELECT n FROM nn)""",

    // tf·ln(N/df); N counts ALL docs (zero-match docs included)
    "ann_tfidf" ->
      s"""WITH $dictCte, $cntsCte,
          tf AS (SELECT url, class_iri, CAST(SUM(cnt) AS BIGINT) AS tf
                 FROM cnts WHERE cnt > 0 GROUP BY 1, 2),
          df AS (SELECT class_iri, COUNT(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
          SELECT t.url, t.class_iri,
                 ROUND(t.tf * ln((SELECT n FROM n) / d.df), 6) AS tfidf
          FROM tf t JOIN df d USING (class_iri)""",

    // triangles by the same canonical wedge join, per corner
    "kg_triangles" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                  FROM cooc e1
                  JOIN cooc e2 ON e1.src = e2.src AND e1.dst < e2.dst
                  JOIN cooc e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
          corners AS (SELECT a AS class_iri FROM tri
                      UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri)
          SELECT class_iri, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM corners GROUP BY 1""",

    "text_quality" ->
      s"""SELECT doc_id, $qualityExprSql AS quality
         FROM documents""",

    // Gopher rules: keep computed from the UNROUNDED values (integer-derived
    // ratios — identical doubles both engines); stats rounded to 4dp
    "text_gopher" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
          v AS (SELECT doc_id,
                  len(tk) AS n_words,
                  list_sum(list_transform(tk, x -> length(x)))
                    / CAST(len(tk) AS DOUBLE) AS mean_len,
                  len(list_filter(tk, x -> NOT regexp_matches(x, '[A-Za-z0-9]')))
                    / CAST(len(tk) AS DOUBLE) AS sym_ratio,
                  len(list_filter(tk, x -> x IN ('the', 'a'))) AS stop_hits
                FROM t)
          SELECT doc_id, CAST(n_words AS INT) AS n_words,
                 ROUND(mean_len, 4) AS mean_word_len,
                 ROUND(sym_ratio, 4) AS symbol_ratio,
                 CAST(stop_hits AS INT) AS n_stop_hits,
                 (n_words BETWEEN 50 AND 100000
                  AND mean_len BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
                  AND sym_ratio <= CAST(0.1 AS DOUBLE)
                  AND stop_hits >= 2) AS keep
          FROM v""",

    // repetition: max bigram frequency recomputed DECLARATIVELY (unnest +
    // GROUP BY + MAX) against the engine's sorted-run fold
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                 FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                       FROM toks WHERE len(t) >= 2)),
          f AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
          m AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS nb FROM f GROUP BY 1)
          SELECT tk.doc_id,
                 COALESCE(ROUND(m.mx / CAST(m.nb AS DOUBLE), 4),
                          CAST(0.0 AS DOUBLE)) AS top_bigram_frac,
                 ROUND(CAST(1.0 AS DOUBLE)
                       - len(list_distinct(tk.t)) / CAST(len(tk.t) AS DOUBLE), 4)
                   AS dup_token_ratio
          FROM toks tk LEFT JOIN m ON tk.doc_id = m.doc_id""",

    "text_langid" ->
      """SELECT doc_id,
           CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
                THEN 'en' ELSE 'und' END AS lang_pred
         FROM documents""",

    // image rows: decoded dims/colors must equal the PNG generation formulas
    // (Multimodal.imgWidth/imgHeight/imgColor — single source of truth);
    // audio/video rows: the documented byte-length stub formulas (bytes =
    // UTF-8 text, ASCII corpus → strlen)
    "mm_features" ->
      """SELECT 'doc://' || doc_id AS url,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 16
                     ELSE 16 + strlen(text) % 64 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + (doc_id // 16) % 16
                     ELSE 16 + (strlen(text) // 64) % 64 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id * 7) % 256 ELSE -1 END AS INT) AS mean_r,
           CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id * 13) % 256 ELSE -1 END AS INT) AS mean_g,
           CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id * 29) % 256 ELSE -1 END AS INT) AS mean_b
         FROM documents""",

    // stride-256 byte groups, 64-byte frames: count and per-frame lengths
    // are closed-form in the text byte length
    "mm_frames" ->
      """SELECT 'doc://' || doc_id AS url, CAST(idx AS INT) AS frame_idx,
           CAST(LEAST(64, strlen(text) - idx * 256) AS INT) AS frame_len
         FROM (SELECT doc_id, text,
                 unnest(generate_series(0, CAST(ceil(strlen(text) / 256.0) AS BIGINT) - 1)) AS idx
               FROM documents WHERE doc_id % 3 = 2 AND strlen(text) > 0)""",

    // resized solid images stay solid: means must equal the source color
    "mm_resize" ->
      """SELECT 'doc://' || doc_id AS url, CAST(64 AS INT) AS width,
           CAST(64 AS INT) AS height,
           CAST((doc_id * 7) % 256 AS INT) AS mean_r,
           CAST((doc_id * 13) % 256 AS INT) AS mean_g,
           CAST((doc_id * 29) % 256 AS INT) AS mean_b
         FROM documents WHERE doc_id % 3 = 0""",

    // same GROUPING SETS text as the engine query (both ANSI)
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_linestatus), ())""",

    // Adamic–Adar recomputed relationally: undirected edge list → degrees →
    // common-neighbor pair join → Σ 1/ln(deg) → anti-join existing edges.
    // (Engine's maxDegree=10000 hub skip is a no-op at fixture scale; its
    // size>=2 neighbor filter is implied by the pair self-join.)
    "kg_adamic_adar" ->
      s"""WITH $dictCte, $directCte,
          pairs AS (SELECT DISTINCT url, class_iri FROM direct),
          cooc AS (SELECT DISTINCT a.class_iri AS src, b.class_iri AS dst
                   FROM pairs a JOIN pairs b
                     ON a.url = b.url AND a.class_iri < b.class_iri),
          und AS (SELECT src, dst FROM cooc
                  UNION ALL SELECT dst, src FROM cooc),
          deg AS (SELECT src AS z, COUNT(*) AS deg FROM und GROUP BY 1),
          aa AS (SELECT a.dst AS src, b.dst AS dst,
                        SUM(CAST(1.0 AS DOUBLE) / ln(CAST(d.deg AS DOUBLE))) AS s
                 FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst
                 JOIN deg d ON d.z = a.src
                 GROUP BY 1, 2)
          SELECT p.src, p.dst, ROUND(p.s, 6) AS aa
          FROM aa p
          WHERE NOT EXISTS (SELECT 1 FROM cooc e
                            WHERE e.src = p.src AND e.dst = p.dst)""",

    // entropy recomputed declaratively: token counts via unnest + GROUP BY,
    // H = ln(n) − Σ c·ln(c) / n; 4dp cross-engine contract
    "text_entropy" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          u AS (SELECT doc_id, unnest(t) AS tok FROM toks),
          c AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2),
          s AS (SELECT doc_id, SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s,
                       CAST(SUM(c) AS DOUBLE) AS n
                FROM c GROUP BY 1)
          SELECT doc_id, ROUND(ln(n) - s / n, 4) AS token_entropy FROM s""",

    // drift recomputed declaratively: the same half-token + marker
    // snapshot-2 synthesis, one conditional-sum vocab agg, exact-rational
    // L1 ordering (pre-round doubles — IEEE-identical cross-engine), JSD
    // under text_entropy's 4dp ln contract
    "text_token_drift" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents),
          t2 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
                   THEN list_concat(list_slice(t, 1, (len(t) + 1) // 2),
                     ['${graft.ops.TextOps.DriftMarker}'])
                   ELSE t END AS t FROM toks),
          u AS (SELECT unnest(t) AS token, 1 AS v FROM toks
                UNION ALL
                SELECT unnest(t) AS token, 2 AS v FROM t2),
          c AS (SELECT token,
                  CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
                FROM u GROUP BY 1),
          n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
          p AS (SELECT token, c1, c2,
                  CAST(c1 AS DOUBLE) / n1 AS p1,
                  CAST(c2 AS DOUBLE) / n2 AS p2
                FROM c, n),
          j AS (SELECT token, c1, c2, p1, p2,
                  (CASE WHEN p1 > 0
                     THEN p1 / 2 * ln(p1 / ((p1 + p2) / 2)) ELSE 0 END)
                  + (CASE WHEN p2 > 0
                     THEN p2 / 2 * ln(p2 / ((p1 + p2) / 2)) ELSE 0 END)
                    AS jsd_term
                FROM p),
          tot AS (SELECT ROUND(SUM(jsd_term), 4) AS jsd FROM j)
          SELECT token, c1, c2, ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
            ROUND(ABS(p1 - p2), 6) AS drift, tot.jsd
          FROM j, tot
          ORDER BY ABS(p1 - p2) DESC, token LIMIT 50""",

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

    // WARC serialize→parse→extract must reproduce the table exactly
    "warc_extract" ->
      "SELECT 'doc://' || doc_id AS url, text FROM documents",

    // JSON write→read must reproduce the parquet-direct values exactly
    "io_jsonl_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_text,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         FROM documents""",

    // CSV write→read, same fidelity contract (quote framing must not
    // perturb a single byte of text)
    "io_csv_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_text,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         FROM documents""",

    // ORC write→read, same fidelity contract
    "io_orc_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars_text,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         FROM documents""",

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

    // the same per-user LAG chain with the (ts, event_id) tie policy
    "q_event_transitions" ->
      """WITH tp AS (SELECT user_id, event_type AS next_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
             FROM events),
          pr AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
                 FROM tp WHERE prev_type IS NOT NULL GROUP BY 1, 2),
          tt AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
                 FROM pr GROUP BY 1)
          SELECT pr.prev_type, pr.next_type, pr.n,
            ROUND(CAST(pr.n AS DOUBLE) / tt.n_from, 6) AS p
          FROM pr JOIN tt USING (prev_type)""",

    // the same 4dp-rounded percentile bounds + the same clipped-overlap
    // fold (list_sum over the 11-element bounds list, not rows)
    "q_histogram_selectivity" ->
      """WITH hb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(n_chars) AS DOUBLE) AS b0,
             quantile_cont(n_chars,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qb,
             CAST(MAX(n_chars) AS DOUBLE) AS b10,
             CAST(SUM(CASE WHEN n_chars BETWEEN 150 AND 350
                      THEN 1 ELSE 0 END) AS BIGINT) AS exact_rows
           FROM documents),
          rbx AS (SELECT *, list_transform(
              list_prepend(b0, list_append(qb, b10)),
              x -> ROUND(x, 4)) AS rb
            FROM hb),
          fr AS (SELECT *, list_sum(list_transform(
              generate_series(1, 10), i ->
                GREATEST(CAST(0.0 AS DOUBLE), LEAST(
                  CASE WHEN rb[i + 1] > rb[i]
                       THEN GREATEST(CAST(0.0 AS DOUBLE),
                         (LEAST(CAST(350.0 AS DOUBLE), rb[i + 1])
                          - GREATEST(CAST(150.0 AS DOUBLE), rb[i]))
                         / (rb[i + 1] - rb[i]))
                       ELSE CASE WHEN rb[i] BETWEEN 150.0 AND 350.0
                                 THEN CAST(1.0 AS DOUBLE)
                                 ELSE CAST(0.0 AS DOUBLE) END
                  END, CAST(1.0 AS DOUBLE))))) AS frac
            FROM rbx)
          SELECT n_rows,
            ROUND(CAST(n_rows AS DOUBLE) / 10.0 * frac, 2) AS est_rows,
            exact_rows,
            CASE WHEN exact_rows = 0 THEN NULL
                 ELSE ROUND(ABS(CAST(n_rows AS DOUBLE) / 10.0 * frac
                   - exact_rows) / exact_rows, 6) END AS rel_err
          FROM fr""",

    // successor-with-wrap ring assignment as the same (flag, h, shard)
    // argmin; the 33-shard vnode pool filtered to < 32 IS the 32-shard
    // pool (same hashes)
    "q_shard_rebalance" ->
      """WITH ks AS (SELECT doc_id,
             ('0x' || substr(md5('k|' || CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT AS kh
           FROM documents),
          vn AS (SELECT s.s AS shard,
             ('0x' || substr(md5('vn|' || CAST(s.s AS VARCHAR) || '|'
                || CAST(v.v AS VARCHAR)), 1, 15))::BIGINT AS h
           FROM (SELECT unnest(generate_series(0, 32)) AS s) s,
                (SELECT unnest(generate_series(0, 7)) AS v) v),
          a32 AS (SELECT doc_id, shard FROM (
             SELECT k.doc_id, vn.shard,
               ROW_NUMBER() OVER (PARTITION BY k.doc_id ORDER BY
                 CASE WHEN vn.h >= k.kh THEN 0 ELSE 1 END, vn.h, vn.shard)
                 AS rn
             FROM ks k CROSS JOIN vn WHERE vn.shard < 32) z WHERE rn = 1),
          a33 AS (SELECT doc_id, shard FROM (
             SELECT k.doc_id, vn.shard,
               ROW_NUMBER() OVER (PARTITION BY k.doc_id ORDER BY
                 CASE WHEN vn.h >= k.kh THEN 0 ELSE 1 END, vn.h, vn.shard)
                 AS rn
             FROM ks k CROSS JOIN vn) z WHERE rn = 1),
          ring AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN a32.shard <> a33.shard THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved
           FROM a32 JOIN a33 USING (doc_id)),
          md AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN kh % 32 <> kh % 33 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved
           FROM ks)
          SELECT 'mod' AS scheme, n_keys, n_moved,
            ROUND(CAST(n_moved AS DOUBLE) / n_keys, 6) AS moved_frac
          FROM md
          UNION ALL
          SELECT 'ring' AS scheme, n_keys, n_moved,
            ROUND(CAST(n_moved AS DOUBLE) / n_keys, 6) AS moved_frac
          FROM ring""",

    // the same chained min-agg funnel; conversion via LAG over the 3-row
    // step frame
    "q_funnel" ->
      """WITH fs1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                      WHERE event_type = 'view' GROUP BY 1),
          fs2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
                  JOIN fs1 ON fs1.user_id = e.user_id
                  WHERE e.event_type = 'click' AND e.ts > fs1.t1
                    AND e.ts <= fs1.t1 + INTERVAL 1 DAY GROUP BY 1),
          fs3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
                  JOIN fs2 ON fs2.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > fs2.t2
                    AND e.ts <= fs2.t2 + INTERVAL 1 DAY
                  GROUP BY 1),
          steps AS (SELECT 1 AS step, 'view' AS event_type,
                      CAST((SELECT COUNT(*) FROM fs1) AS BIGINT) AS n_users
                    UNION ALL SELECT 2, 'click',
                      CAST((SELECT COUNT(*) FROM fs2) AS BIGINT)
                    UNION ALL SELECT 3, 'purchase',
                      CAST((SELECT COUNT(*) FROM fs3) AS BIGINT))
          SELECT step, event_type, n_users,
            ROUND(CAST(n_users AS DOUBLE)
              / LAG(n_users) OVER (ORDER BY step), 6) AS conv_from_prev
          FROM steps""",

    // first-active-date cohorts × day offsets, distinct-user cells
    "q_retention" ->
      """WITH fd AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
                     FROM events GROUP BY 1),
          act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                  FROM events)
          SELECT fd.cohort, CAST(act.day - fd.cohort AS INT) AS day_offset,
            CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
          FROM act JOIN fd ON fd.user_id = act.user_id
          GROUP BY 1, 2""",

    // HLL register merge twin: same register chain as sketch_hll grouped
    // per event type, pair unions by (pair, bucket) MAX, the shared
    // estimator CASE, inclusion–exclusion on the ROUNDED components
    "sketch_hll_overlap" -> {
      import graft.ops.Sketch.{HllM, HllRemBits}
      s"""WITH ht AS (SELECT source, string_split(text, ' ') AS t
                      FROM documents),
           dv AS (SELECT DISTINCT source AS g, t[i] || ' ' || t[i + 1] AS v
                  FROM (SELECT source, t,
                          unnest(generate_series(1, len(t) - 1)) AS i
                        FROM ht WHERE len(t) >= 2) z),
           h AS (SELECT g,
                   CAST(concat('0x', substring(md5(v), 1, 15)) AS BIGINT) AS h
                 FROM dv),
           rg AS (SELECT g, h % $HllM AS bucket,
                    MAX(${graft.ops.Sketch.hllRankSql(s"(h // $HllM)")}) AS r
                  FROM h GROUP BY 1, 2),
           fd1 AS (SELECT g, COUNT(*) AS np,
                     SUM(CAST(1 AS BIGINT) << (${HllRemBits + 1} - r)) AS sp
                   FROM rg GROUP BY 1),
           est1 AS (SELECT g, ROUND(${hllEstCaseSql("np", "sp")}, 4) AS e
                    FROM fd1),
           gs AS (SELECT DISTINCT g FROM rg),
           pairs AS (SELECT a.g AS grp_a, b.g AS grp_b
                     FROM gs a JOIN gs b ON a.g < b.g),
           tag AS (SELECT p.grp_a, p.grp_b, rg.bucket, rg.r
                   FROM rg JOIN pairs p ON rg.g = p.grp_a
                   UNION ALL
                   SELECT p.grp_a, p.grp_b, rg.bucket, rg.r
                   FROM rg JOIN pairs p ON rg.g = p.grp_b),
           urg AS (SELECT grp_a, grp_b, bucket, MAX(r) AS r
                   FROM tag GROUP BY 1, 2, 3),
           ufd AS (SELECT grp_a, grp_b, COUNT(*) AS np,
                     SUM(CAST(1 AS BIGINT) << (${HllRemBits + 1} - r)) AS sp
                   FROM urg GROUP BY 1, 2),
           uest AS (SELECT grp_a, grp_b,
                      ROUND(${hllEstCaseSql("np", "sp")}, 4) AS est_union
                    FROM ufd),
           ov AS (SELECT a.g AS grp_a, b.g AS grp_b,
                    CAST(COUNT(*) AS BIGINT) AS exact_overlap
                  FROM dv a JOIN dv b ON a.v = b.v AND a.g < b.g
                  GROUP BY 1, 2)
          SELECT p.grp_a, p.grp_b, ea.e AS est_a, eb.e AS est_b,
            u.est_union,
            ROUND(GREATEST(ea.e + eb.e - u.est_union,
              CAST(0.0 AS DOUBLE)), 4) AS est_overlap,
            COALESCE(ov.exact_overlap, 0) AS exact_overlap
          FROM pairs p
          JOIN est1 ea ON ea.g = p.grp_a
          JOIN est1 eb ON eb.g = p.grp_b
          JOIN uest u USING (grp_a, grp_b)
          LEFT JOIN ov USING (grp_a, grp_b)"""
    },

    // AMS/count-sketch F2 twin: same md5-derived buckets/signs, all-BIGINT
    // counters, median line via list_sort[3]; rel_err is the only float
    "sketch_ams" ->
      s"""WITH $dictCte, $directCte,
          ks AS (SELECT class_iri AS key FROM
                   (SELECT DISTINCT url, class_iri FROM direct) z),
          tag AS (SELECT r,
                    ('0x' || substr(md5('b' || CAST(r AS VARCHAR) || '|'
                       || key), 1, 15))::BIGINT % 16 AS b,
                    1 - 2 * (('0x' || substr(md5('s' || CAST(r AS VARCHAR)
                       || '|' || key), 1, 15))::BIGINT % 2) AS sign
                  FROM ks CROSS JOIN (SELECT unnest(range(5)) AS r) rr),
          cnt AS (SELECT r, b, CAST(SUM(sign) AS BIGINT) AS c
                  FROM tag GROUP BY 1, 2),
          line AS (SELECT r, CAST(SUM(c * c) AS BIGINT) AS est
                   FROM cnt GROUP BY 1),
          med AS (SELECT CAST(list_sort(list(est))[3] AS BIGINT) AS f2_est
                  FROM line),
          ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM
                   (SELECT CAST(COUNT(*) AS BIGINT) AS f
                    FROM ks GROUP BY key) z)
          SELECT f2_exact, f2_est,
            ROUND(CAST(ABS(f2_est - f2_exact) AS DOUBLE) / f2_exact, 6)
              AS rel_err
          FROM ex, med""",

    // one PR chain to 6 rounds; both depths ranked with the same
    // (ROUND(pr,6) DESC, node) policy, exact-BIGINT Σd², one division
    "kg_rank_corr" ->
      s"""WITH $pageEdgesPrScaffoldSql,
          nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
          unodes AS MATERIALIZED (SELECT node,
              CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
          pr0 AS (SELECT node, t AS pr FROM unodes),
          ${prRoundsCtesSql(6, "pr", "unodes")},
          k5 AS (SELECT node, CAST(ROW_NUMBER() OVER
                   (ORDER BY ROUND(pr, 6) DESC, node) AS BIGINT) AS r5
                 FROM pr5),
          k6 AS (SELECT node, CAST(ROW_NUMBER() OVER
                   (ORDER BY ROUND(pr, 6) DESC, node) AS BIGINT) AS r6
                 FROM pr6)
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM((r5 - r6) * (r5 - r6)) AS BIGINT) AS sum_d2,
            ROUND(CAST(1.0 AS DOUBLE) - CAST(6.0 AS DOUBLE)
              * SUM((r5 - r6) * (r5 - r6))
              / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE), 6)
              AS spearman_rho
          FROM k5 JOIN k6 USING (node)""",

    // one PR chain unrolled to 6 rounds; both pr5 and pr6 read from it,
    // residual in exact micro-units (6dp ranks × 1e6 are integers)
    "kg_pr_residual" ->
      s"""WITH $pageEdgesPrScaffoldSql,
          nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
          unodes AS MATERIALIZED (SELECT node,
              CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS t FROM nodes),
          pr0 AS (SELECT node, t AS pr FROM unodes),
          ${prRoundsCtesSql(6, "pr", "unodes")},
          a5 AS (SELECT node, CAST(ROUND(ROUND(pr, 6) * 1e6, 0) AS BIGINT)
                   AS m5 FROM pr5),
          a6 AS (SELECT node, CAST(ROUND(ROUND(pr, 6) * 1e6, 0) AS BIGINT)
                   AS m6 FROM pr6)
          SELECT CAST(SUM(ABS(m5 - m6)) AS BIGINT) AS l1_micro,
            CAST(MAX(ABS(m5 - m6)) AS BIGINT) AS max_micro,
            ROUND(CAST(SUM(ABS(m5 - m6)) AS DOUBLE) / 1e6, 6) AS l1_residual
          FROM a5 JOIN a6 USING (node)""",

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

    // full sketch recomputation: the same salted md5 row hashes, the same
    // d×w matrix, min-over-rows point queries for the same top-20 set
    "sketch_cm" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
          exact AS (SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY 1),
          top AS (SELECT tok, exact_n FROM exact
                  ORDER BY exact_n DESC, tok LIMIT 20),
          ex AS (SELECT tok, j FROM toks
                 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)),
          sk AS (SELECT j,
                   ('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || tok), 1, 15))::BIGINT % 256 AS bucket,
                   COUNT(*) AS n
                 FROM ex GROUP BY 1, 2),
          probes AS (SELECT t.tok, t.exact_n, j.j,
                   ('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || t.tok), 1, 15))::BIGINT % 256 AS bucket
                 FROM top t
                 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j)
          SELECT p.tok, p.exact_n, MIN(s.n) AS cm_estimate
          FROM probes p JOIN sk s ON s.j = p.j AND s.bucket = p.bucket
          GROUP BY 1, 2""",

    "text_postings" -> graft.ops.TextOps.postingsSql(),

    // RAKE twin: island key = p − row_number per doc, plen window, deg/freq
    // word scores, phrase scores ROUNDED to 6dp BEFORE the rank (absorbs
    // float-sum ordering; phrase string is the tie-break in both engines)
    "text_rake" ->
      s"""WITH rtoks AS (SELECT doc_id, string_split(text, ' ') AS t
                         FROM documents),
          rpos AS (SELECT doc_id, t,
                     unnest(generate_series(1, len(t))) AS p
                   FROM rtoks),
          nt AS (SELECT doc_id, p, t[p] AS tok FROM rpos
                 WHERE t[p] NOT IN (${graft.dict.DictBuild
                   .CandidateStopwords.map(w => s"'$w'").mkString(", ")})),
          isl AS (SELECT doc_id, p, tok,
                    p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                      AS island
                  FROM nt),
          occ AS (SELECT doc_id, p, tok, island,
                    COUNT(*) OVER (PARTITION BY doc_id, island) AS plen
                  FROM isl),
          ws AS (SELECT doc_id, tok,
                   CAST(SUM(plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                     AS wscore
                 FROM occ GROUP BY 1, 2),
          ph AS (SELECT o.doc_id, o.island,
                   string_agg(o.tok, ' ' ORDER BY o.p) AS phrase,
                   ROUND(SUM(w.wscore), 6) AS score
                 FROM occ o JOIN ws w
                   ON w.doc_id = o.doc_id AND w.tok = o.tok
                 GROUP BY 1, 2),
          up AS (SELECT doc_id, phrase, MIN(score) AS score
                 FROM ph GROUP BY 1, 2)
          SELECT doc_id, CAST(rank AS INT) AS rank, phrase, score FROM (
            SELECT doc_id, phrase, score,
              ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, phrase) AS rank
            FROM up) WHERE rank <= 3""",

    // BM25 recomputed with the identical arithmetic order (Lucene-form
    // idf with +1); ties at the rounded score break by doc_id both sides
    "text_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          lens AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS len FROM toks),
          stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                           AVG(len) AS avglen FROM lens),
          u AS (SELECT doc_id, unnest(t) AS term FROM toks),
          tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM u
                 WHERE term IN ('spark', 'join', 'data') GROUP BY 1, 2),
          dfx AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
          sc AS (SELECT t.doc_id,
                   ln((st.n_docs - d.df + CAST(0.5 AS DOUBLE))
                        / (d.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
                   * (t.tf * CAST(2.2 AS DOUBLE))
                   / (t.tf + CAST(1.2 AS DOUBLE)
                        * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * l.len / st.avglen)) AS sco
                 FROM tf t JOIN dfx d USING (term) JOIN lens l USING (doc_id)
                 CROSS JOIN stats st),
          agg AS (SELECT doc_id, SUM(sco) AS score FROM sc GROUP BY 1)
          SELECT doc_id, ROUND(score, 6) AS score FROM agg
          ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20""",

    // Dirichlet QL recomputed with the identical multiply/divide order;
    // the CROSS JOIN onto the query literal + LEFT tf/cf joins reproduce
    // the smoothing-mass-for-absent-terms semantics exactly
    "text_qlm" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          lens AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS len FROM toks),
          u AS (SELECT doc_id, unnest(t) AS term FROM toks),
          tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_toks FROM u),
          tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM u
                 WHERE term IN ('spark', 'join', 'data') GROUP BY 1, 2),
          cfx AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM u
                  WHERE term IN ('spark', 'join', 'data') GROUP BY 1),
          q AS (SELECT unnest(['spark', 'join', 'data']) AS term),
          sc AS (SELECT l.doc_id,
                   ln((COALESCE(t.tf, CAST(0.0 AS DOUBLE))
                        + CAST(300.0 AS DOUBLE)
                          * COALESCE(c.cf, CAST(0.0 AS DOUBLE)) / tt.n_toks)
                      / (l.len + CAST(300.0 AS DOUBLE))) AS sco
                 FROM lens l CROSS JOIN q
                 LEFT JOIN tf t ON t.doc_id = l.doc_id AND t.term = q.term
                 LEFT JOIN cfx c ON c.term = q.term
                 CROSS JOIN tot tt),
          agg AS (SELECT doc_id, SUM(sco) AS score FROM sc GROUP BY 1)
          SELECT doc_id, ROUND(score, 6) AS score FROM agg
          ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20""",

    "text_rm3_terms" ->
      s"""WITH $rm3ChainCtes
          SELECT term, w FROM expterms""",

    // RRF twin: both run chains (bm25 + qlm, each re-ranked over its own
    // ROUND(6)-ordered top-20), then the union fusion 1/(60+rank), ROUND(6)
    "text_rrf" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                       FROM documents),
          lens AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS len FROM toks),
          stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                           AVG(len) AS avglen FROM lens),
          u AS (SELECT doc_id, unnest(t) AS term FROM toks),
          tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_toks FROM u),
          btf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM u
                  WHERE term IN ('spark', 'join', 'data') GROUP BY 1, 2),
          bdf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
                  FROM btf GROUP BY 1),
          bsc AS (SELECT t.doc_id,
                    ln((st.n_docs - d.df + CAST(0.5 AS DOUBLE))
                         / (d.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
                    * (t.tf * CAST(2.2 AS DOUBLE))
                    / (t.tf + CAST(1.2 AS DOUBLE)
                         * (CAST(0.25 AS DOUBLE)
                            + CAST(0.75 AS DOUBLE) * l.len / st.avglen))
                      AS sco
                  FROM btf t JOIN bdf d USING (term) JOIN lens l USING (doc_id)
                  CROSS JOIN stats st),
          bagg AS (SELECT doc_id, ROUND(SUM(sco), 6) AS score
                   FROM bsc GROUP BY 1),
          brank AS (SELECT doc_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
                    FROM (SELECT doc_id, score FROM bagg
                          ORDER BY score DESC, doc_id LIMIT 20) x),
          qq AS (SELECT unnest(['spark', 'join', 'data']) AS term),
          qtf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM u
                  WHERE term IN ('spark', 'join', 'data') GROUP BY 1, 2),
          qcf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM u
                  WHERE term IN ('spark', 'join', 'data') GROUP BY 1),
          qsc AS (SELECT l.doc_id,
                    ln((COALESCE(t.tf, CAST(0.0 AS DOUBLE))
                         + CAST(300.0 AS DOUBLE)
                           * COALESCE(c.cf, CAST(0.0 AS DOUBLE)) / tt.n_toks)
                       / (l.len + CAST(300.0 AS DOUBLE))) AS sco
                  FROM lens l CROSS JOIN qq
                  LEFT JOIN qtf t ON t.doc_id = l.doc_id AND t.term = qq.term
                  LEFT JOIN qcf c ON c.term = qq.term
                  CROSS JOIN tot tt),
          qagg AS (SELECT doc_id, ROUND(SUM(sco), 6) AS score
                   FROM qsc GROUP BY 1),
          qrank AS (SELECT doc_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
                    FROM (SELECT doc_id, score FROM qagg
                          ORDER BY score DESC, doc_id LIMIT 20) y),
          fused AS (SELECT doc_id, COUNT(*) AS n_runs,
                      ROUND(SUM(CAST(1.0 AS DOUBLE) / (60 + rank)), 6) AS rrf
                    FROM (SELECT doc_id, rank FROM brank
                          UNION ALL SELECT doc_id, rank FROM qrank) z
                    GROUP BY 1)
          SELECT doc_id, n_runs, rrf FROM fused
          ORDER BY rrf DESC, doc_id LIMIT 20""",

    // Heaps curve: deterministic doc_id-range buckets (double division is
    // identical IEEE in both engines), cumulative windows over the
    // ≤10-row bucket frame, pinned OLS slope form, ROUND(6)
    "text_heaps" ->
      """WITH mm AS (SELECT CAST(MAX(doc_id) + 1 AS DOUBLE) AS m
                     FROM documents),
          htoks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
          bt AS (SELECT CAST(FLOOR(CAST(doc_id AS DOUBLE) * 10 / m)
                     AS BIGINT) AS bucket,
                   CAST(SUM(len(t)) AS BIGINT) AS toks
                 FROM htoks, mm GROUP BY 1),
          fo AS (SELECT term, MIN(doc_id) AS first_id
                 FROM (SELECT doc_id, t[i] || ' ' || t[i + 1] AS term
                       FROM (SELECT doc_id, t,
                               unnest(generate_series(1, len(t) - 1)) AS i
                             FROM htoks WHERE len(t) >= 2) y) z
                 GROUP BY 1),
          bv AS (SELECT CAST(FLOOR(CAST(first_id AS DOUBLE) * 10 / m)
                     AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS vocab
                 FROM fo, mm GROUP BY 1),
          curve AS (SELECT COALESCE(bt.bucket, bv.bucket) AS bucket,
                      COALESCE(toks, 0) AS toks, COALESCE(vocab, 0) AS vocab
                    FROM bt FULL JOIN bv ON bv.bucket = bt.bucket),
          cum AS (SELECT bucket,
                    CAST(SUM(toks) OVER (ORDER BY bucket) AS BIGINT)
                      AS n_tokens,
                    CAST(SUM(vocab) OVER (ORDER BY bucket) AS BIGINT)
                      AS n_vocab
                  FROM curve),
          pts AS (SELECT ln(CAST(n_tokens AS DOUBLE)) AS x,
                    ln(CAST(n_vocab AS DOUBLE)) AS y FROM cum
                  WHERE n_vocab > 0 AND n_tokens > 0),
          fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                    SUM(x) AS sx, SUM(y) AS sy,
                    SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM pts)
          SELECT bucket, n_tokens, n_vocab,
            ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
          FROM cum, fit""",

    "text_rm3" ->
      s"""WITH $rm3ChainCtes,
          wts AS (SELECT term, CAST(1.0 AS DOUBLE) AS wt FROM q
                  UNION ALL SELECT term, CAST(0.5 AS DOUBLE) * w FROM expterms),
          tset AS (SELECT DISTINCT term FROM wts),
          tfa AS (SELECT u.doc_id, u.term, CAST(COUNT(*) AS DOUBLE) AS tf
                  FROM u JOIN tset w ON w.term = u.term GROUP BY 1, 2),
          cfa AS (SELECT u.term, CAST(COUNT(*) AS DOUBLE) AS cf
                  FROM u JOIN tset w ON w.term = u.term GROUP BY 1),
          sc2 AS (SELECT l.doc_id,
                    w.wt * ln((COALESCE(t.tf, CAST(0.0 AS DOUBLE))
                         + CAST(300.0 AS DOUBLE)
                           * COALESCE(c.cf, CAST(0.0 AS DOUBLE)) / tt.n_toks)
                       / (l.len + CAST(300.0 AS DOUBLE))) AS sco
                  FROM lens l CROSS JOIN wts w
                  LEFT JOIN tfa t ON t.doc_id = l.doc_id AND t.term = w.term
                  LEFT JOIN cfa c ON c.term = w.term
                  CROSS JOIN tot tt),
          agg2 AS (SELECT doc_id, SUM(sco) AS score FROM sc2 GROUP BY 1)
          SELECT doc_id, ROUND(score, 6) AS score FROM agg2
          ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20""",

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

    // gaps-and-islands twin: INCLUSIVE gap merge (only > gap breaks —
    // session_window's boundary rule, spec-pinned), session end = last
    // event + gap, all in epoch micros
    "stream_sessions" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS tu FROM events),
          m AS (SELECT user_id, value, tu,
                  CASE WHEN tu - LAG(tu) OVER
                         (PARTITION BY user_id ORDER BY tu) > 1800000000
                       THEN 1 ELSE 0 END AS brk
                FROM e),
          s AS (SELECT user_id, value, tu,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY tu
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM m)
          SELECT user_id, MIN(tu) AS session_start,
                 MAX(tu) + 1800000000 AS session_end,
                 COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
          FROM s GROUP BY user_id, sid""",

    // plain interval-bounded join (the stream-stream plan minus state)
    "stream_join" ->
      """WITH d AS (SELECT 'u' || user_id AS url, ts FROM events
                    WHERE event_id % 2 = 0),
          f AS (SELECT 'u' || user_id AS url, ts FROM events
                WHERE event_id % 2 = 1)
          SELECT d.url, d.ts AS discover_ts, f.ts AS fetch_ts,
                 epoch_us(f.ts) - epoch_us(d.ts) AS latency_us
          FROM d JOIN f ON f.url = d.url AND f.ts >= d.ts
            AND f.ts <= d.ts + INTERVAL 30 MINUTE""",

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

    "kg_triple_confidence" -> tripleConfidenceOracleSql,
    "kg_fusion_audit" -> fusionAuditOracleSql,
    "kg_truthfinder" -> truthFinderOracleSql,
    "kg_source_trust" -> sourceTrustOracleSql,

    // SPARQL CONSTRUCT: the kg_bgp_star solution set projected through the
    // template { ?c coMentionedWith ?m }, deduplicated (CONSTRUCT emits a
    // SET); predicate IRI interpolated from the object constant
    "kg_construct_rule" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          desc_set AS (SELECT DISTINCT child_iri AS c FROM closure
                       WHERE ancestor_iri = '${graft.ops.KgQuality.bgpRoot}')
          SELECT DISTINCT dl.obj AS subj,
                 '${graft.ops.KgPublish.CoMentionPred}' AS pred,
                 ml.obj AS obj
          FROM triples dl
          JOIN desc_set ds ON dl.obj = ds.c
          JOIN triples ml ON ml.subj = dl.subj AND ml.pred = 'hasMappedAnnotation'
          WHERE dl.pred = 'hasAnnotation'""",

    // ASK: EXISTS over the path pattern (true) + the phantom predicate
    // (false) — both branches checked
    "kg_ask" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          reach AS (SELECT DISTINCT o FROM (
                    SELECT child_iri AS o FROM closure
                    WHERE ancestor_iri = '${graft.ops.KgQuality.bgpRoot}'
                    UNION ALL SELECT '${graft.ops.KgQuality.bgpRoot}'))
          SELECT 'path_to_root' AS pattern,
            EXISTS(SELECT 1 FROM triples t JOIN reach r ON t.obj = r.o
                   WHERE t.pred IN ('hasAnnotation', 'hasMappedAnnotation'))
              AS answer
          UNION ALL
          SELECT 'phantom_pred',
            EXISTS(SELECT 1 FROM triples
                   WHERE pred = '${graft.ops.KgPublish.PhantomPred}')""",

    // UNION = pred IN-filter with via bound to the matched predicate;
    // FILTER = the shared even-trailing-digit regex; MINUS = NOT EXISTS
    // on the shared variable c vs the descendant set (the anti-join twin)
    "kg_bgp_union_minus" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          sols AS (SELECT subj AS d, obj AS c, pred AS via FROM triples
                   WHERE pred IN ('hasAnnotation', 'hasExpandedAnnotation')
                     AND regexp_matches(subj, '${graft.ops.KgPublish.EvenDocRe}'))
          SELECT DISTINCT d, c, via FROM sols
          WHERE NOT EXISTS (SELECT 1 FROM closure x
                            WHERE x.child_iri = sols.c
                              AND x.ancestor_iri =
                                '${graft.ops.KgQuality.bgpRoot}')""",

    // property path (p1|p2)/subClassOf*: reach = {root} ∪ descendants
    // (zero-length star leg = the root itself), alternation = IN filter
    "kg_path_query" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          reach AS (SELECT DISTINCT o FROM (
                    SELECT child_iri AS o FROM closure
                    WHERE ancestor_iri = '${graft.ops.KgQuality.bgpRoot}'
                    UNION ALL SELECT '${graft.ops.KgQuality.bgpRoot}'))
          SELECT DISTINCT t.subj AS d, t.pred AS via
          FROM triples t JOIN reach r ON t.obj = r.o
          WHERE t.pred IN ('hasAnnotation', 'hasMappedAnnotation')""",

    // HDT dictionary encode: id = global rank in term order (binary string
    // collation both engines), decode joins prove the round trip
    "kg_encoded_store" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          tmat AS MATERIALIZED (SELECT * FROM triples),
          -- DISTINCT is explicit (not a bare UNION): inside WITH RECURSIVE
          -- DuckDB treats a CTE-body UNION as the recursive-form operator
          -- and does NOT set-deduplicate a non-self-referencing chain
          terms AS (SELECT DISTINCT term FROM (
                    SELECT subj AS term FROM tmat
                    UNION ALL SELECT pred FROM tmat
                    UNION ALL SELECT obj FROM tmat)),
          dictx AS MATERIALIZED (SELECT term,
                      CAST(ROW_NUMBER() OVER (ORDER BY term) AS BIGINT) AS id
                    FROM terms)
          SELECT ds.id AS s_id, dp.id AS p_id, dobj.id AS o_id,
                 t.subj, t.pred, t.obj
          FROM tmat t
          JOIN dictx ds ON t.subj = ds.term
          JOIN dictx dp ON t.pred = dp.term
          JOIN dictx dobj ON t.obj = dobj.term""",

    // VoID descriptor: 4 dataset-level rows + 5 rows per predicate
    // partition, counts as string literals (RDF terms)
    "kg_void_stats" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          g AS (SELECT CAST(COUNT(*) AS VARCHAR) AS nt,
                  CAST(COUNT(DISTINCT subj) AS VARCHAR) AS ns,
                  CAST(COUNT(DISTINCT obj) AS VARCHAR) AS nob,
                  CAST(COUNT(DISTINCT pred) AS VARCHAR) AS np FROM triples),
          pp AS (SELECT pred, CAST(COUNT(*) AS VARCHAR) AS nt,
                   CAST(COUNT(DISTINCT subj) AS VARCHAR) AS ns,
                   CAST(COUNT(DISTINCT obj) AS VARCHAR) AS nob
                 FROM triples GROUP BY 1)
          SELECT 'http://graft.kg/dataset#v1' AS subj, 'void:triples' AS pred, nt AS obj FROM g
          UNION ALL SELECT 'http://graft.kg/dataset#v1', 'void:distinctSubjects', ns FROM g
          UNION ALL SELECT 'http://graft.kg/dataset#v1', 'void:distinctObjects', nob FROM g
          UNION ALL SELECT 'http://graft.kg/dataset#v1', 'void:properties', np FROM g
          UNION ALL SELECT 'http://graft.kg/dataset#v1', 'void:propertyPartition',
                 'http://graft.kg/dataset#v1/prop/' || pred FROM pp
          UNION ALL SELECT 'http://graft.kg/dataset#v1/prop/' || pred, 'void:property', pred FROM pp
          UNION ALL SELECT 'http://graft.kg/dataset#v1/prop/' || pred, 'void:triples', nt FROM pp
          UNION ALL SELECT 'http://graft.kg/dataset#v1/prop/' || pred, 'void:distinctSubjects', ns FROM pp
          UNION ALL SELECT 'http://graft.kg/dataset#v1/prop/' || pred, 'void:distinctObjects', nob FROM pp""",

    // PROV-O bundle: per-batch entity rows (same doc_id%4 batch key as the
    // N-Quads graph IRI) + the 4 fixed activity/dictionary rows
    "kg_prov_bundle" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          pb AS (SELECT 'http://graft.kg/g#batch' ||
                   CAST(CAST(regexp_extract(subj, '[0-9]+$$', 0) AS BIGINT) % 4 AS VARCHAR) AS g,
                   CAST(COUNT(*) AS VARCHAR) AS n
                 FROM triples GROUP BY 1)
          SELECT g AS subj, 'rdf:type' AS pred, 'prov:Entity' AS obj FROM pb
          UNION ALL SELECT g, 'prov:wasGeneratedBy', 'http://graft.kg/a#annotate_v1' FROM pb
          UNION ALL SELECT g, 'graft:tripleCount', n FROM pb
          UNION ALL SELECT * FROM (VALUES
            ('http://graft.kg/a#annotate_v1', 'rdf:type', 'prov:Activity'),
            ('http://graft.kg/a#annotate_v1', 'prov:used', 'http://graft.kg/dict#v1'),
            ('http://graft.kg/dict#v1', 'rdf:type', 'prov:Entity'),
            ('http://graft.kg/dict#v1', 'prov:wasAttributedTo', 'http://graft.kg/agent#graft')) v(a, b, c)""",

    // reification twin: the same content-addressed statement id (md5 over
    // the chr(1)-separated triple — Spark's md5-over-UTF8 byte-identical)
    // fanned out to the five reification rows
    "kg_reify" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          st AS (SELECT '${graft.ops.KgPublish.StmtPrefix}' ||
                   md5(subj || chr(1) || pred || chr(1) || obj) AS stmt,
                   subj, pred, obj
                 FROM triples)
          SELECT stmt AS subj, 'rdf:type' AS pred, 'rdf:Statement' AS obj FROM st
          UNION ALL SELECT stmt, 'rdf:subject', subj FROM st
          UNION ALL SELECT stmt, 'rdf:predicate', pred FROM st
          UNION ALL SELECT stmt, 'rdf:object', obj FROM st
          UNION ALL SELECT stmt, 'prov:wasDerivedFrom',
            'http://graft.kg/dict#v1' FROM st""",

    // OWL-Horst subset: rdfp8 inverse of the direct leg, rdfp3 symmetric
    // mapping completion, rdfp4 transitive subClassOf = the closure pairs
    "kg_owl_horst" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte
          SELECT DISTINCT t.obj AS subj,
                 '${graft.ops.KgPublish.InverseOfDirect}' AS pred,
                 t.subj AS obj, 'rdfp8' AS rule
          FROM triples t WHERE t.pred = 'hasAnnotation'
          UNION ALL
          SELECT DISTINCT s AS subj, p AS pred, o AS obj, 'rdfp3' AS rule FROM (
            SELECT class_iri AS s, 'mappedTo' AS p, mapped_iri AS o FROM maps
            UNION ALL
            SELECT mapped_iri, 'mappedTo', class_iri FROM maps)
          UNION ALL
          SELECT DISTINCT child_iri AS subj, 'subClassOf' AS pred,
                 ancestor_iri AS obj, 'rdfp4' AS rule
          FROM closure""",

    "web_edge_cut" -> edgeCutOracleSql,
    "web_partition_lp" -> partitionLpOracleSql,
    "kg_fact_fusion" -> factFusionOracleSql,

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

    "q_distinct_approx" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_n,
           true AS within_bound
         FROM events GROUP BY 1""",

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

    // FD twin: the same (table, lhs, rhs) candidate list rendered as one
    // UNION ALL of per-table scalar selects; DISTINCT over a row
    // constructor mirrors the struct count_distinct
    "q_fd_discovery" -> FdCandidates.map { case (tbl, lhs, rhs) =>
      val l = if (lhs.size == 1) lhs.head else s"(${lhs.mkString(", ")})"
      val p = s"(${(lhs :+ rhs).mkString(", ")})"
      s"""SELECT '$tbl' AS tbl, '${lhs.mkString("+")}' AS lhs, '$rhs' AS rhs,
            CAST(COUNT(DISTINCT $l) AS BIGINT) AS n_lhs,
            CAST(COUNT(DISTINCT $p) AS BIGINT) AS n_pairs,
            COUNT(DISTINCT $l) = COUNT(DISTINCT $p) AS holds
          FROM $tbl"""
    }.mkString("\nUNION ALL\n"),

    // the PLAIN join — salting must be invisible in the result
    "q_salted_join" ->
      """SELECT event_type, c_mktsegment, COUNT(*) AS n_events
         FROM events e
         JOIN (SELECT DISTINCT c_custkey % 50 AS user_id, c_mktsegment
               FROM customer) d
           ON e.user_id = d.user_id
         GROUP BY 1, 2""",

    "q_star_revenue" ->
      """WITH agg AS (SELECT r_name, p_brand,
             ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             COUNT(*) AS n_items
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, p_brand, revenue, n_items,
           CAST(ROW_NUMBER() OVER (PARTITION BY r_name
             ORDER BY revenue DESC, p_brand) AS INT) AS rank
         FROM agg QUALIFY rank <= 2""",

    "q_anomaly" ->
      """WITH counts AS (SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n FROM events GROUP BY 1, 2),
          grid AS (SELECT event_type, unnest(generate_series(h0, h1,
                INTERVAL 1 HOUR)) AS hour
            FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
                  FROM counts GROUP BY 1)),
          hourly AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.hour = g.hour),
          st AS (SELECT event_type, hour, n,
              AVG(n) OVER w AS mu, STDDEV_SAMP(n) OVER w AS sd,
              COUNT(n) OVER w AS np
            FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour
              ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
          SELECT event_type, hour, n, ROUND((n - mu) / sd, 6) AS z,
            (ABS((n - mu) / sd) > 3.0) AS anomaly
          FROM st WHERE np >= 6 AND sd > 0""",

    // the streamed projection = the q_anomaly grid MINUS each type's final
    // grid hour (in-flight, never closes — no successor event arrives)
    "stream_anomaly_hours" ->
      """WITH counts AS (SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n FROM events GROUP BY 1, 2),
          grid AS (SELECT event_type, unnest(generate_series(h0, h1,
                INTERVAL 1 HOUR)) AS hour
            FROM (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
                  FROM counts GROUP BY 1)),
          hourly AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.hour = g.hour),
          st AS (SELECT event_type, hour, n,
              AVG(n) OVER w AS mu, STDDEV_SAMP(n) OVER w AS sd,
              COUNT(n) OVER w AS np
            FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour
              ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)),
          mx AS (SELECT event_type, MAX(hour) AS h1 FROM counts GROUP BY 1)
          SELECT st.event_type, st.hour, st.n,
            ROUND((n - mu) / sd, 6) AS z,
            (ABS((n - mu) / sd) > 3.0) AS anomaly
          FROM st JOIN mx ON mx.event_type = st.event_type
          WHERE np >= 6 AND sd > 0 AND st.hour < mx.h1""",

    // occurrence counts per (surface, concept) from the same regex twin the
    // ann_counts oracle uses (terms are self-overlap-free, asserted in
    // DictAndClosureSpec, so non-overlapping regex counts == automaton hits)
    "kg_alias_priors" ->
      s"""WITH $dictCte,
          c AS (SELECT d.term AS surface, d.class_iri,
                  SUM(len(regexp_extract_all(upper(text), '\\b' || d.term || '\\b'))) AS n
                FROM documents, dict d GROUP BY 1, 2),
          cc AS (SELECT * FROM c WHERE n > 0),
          t AS (SELECT surface, SUM(n) AS n_surface FROM cc GROUP BY 1)
          SELECT cc.surface, cc.class_iri, CAST(cc.n AS BIGINT) AS n,
            ROUND(CAST(cc.n AS DOUBLE) / CAST(t.n_surface AS DOUBLE), 6) AS prior
          FROM cc JOIN t USING (surface)""",

    "kg_coverage" ->
      s"""WITH $dictCte, $directCte,
          u AS (SELECT DISTINCT ont, class_iri FROM dict),
          mt AS (SELECT DISTINCT class_iri FROM direct)
          SELECT u.ont, COUNT(*) AS n_concepts,
            CAST(SUM(CASE WHEN mt.class_iri IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_matched,
            ROUND(CAST(SUM(CASE WHEN mt.class_iri IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS coverage
          FROM u LEFT JOIN mt ON mt.class_iri = u.class_iri
          GROUP BY 1""",

    // the incremental result must equal a cold recursive rebuild over the
    // UNION of v1 edges and the release delta (same ≤5 depth cap as
    // closureCte, min distance per pair)
    "kg_closure_delta" ->
      s"""WITH RECURSIVE edges(child_iri, parent_iri) AS (
            SELECT * FROM (VALUES ${OntologyFixture.edgesValues}) v(a, b)
            UNION ALL
            SELECT * FROM (VALUES ${OntologyFixture.edgesDeltaValues}) w(a, b)),
          $closureCte
          SELECT child_iri, ancestor_iri, CAST(MIN(distance) AS INT) AS distance
          FROM closure GROUP BY 1, 2""",

    // same interleave-term list via the duck-dialect shift syntax;
    // floor(epoch()) matches Spark's timestamp→long cast (precedent above)
    "q_zorder_layout" ->
      s"""WITH p AS (SELECT user_id & 255 AS x,
              ((CAST(floor(epoch(ts)) AS BIGINT) // 3600) & 255) AS y
            FROM events),
          z AS (SELECT x, y, ${graft.ops.ZOrder.duckZ("x", "y", 8)} AS zval FROM p)
          SELECT (zval >> 8) AS zbucket, COUNT(*) AS n_rows,
            MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
          FROM z GROUP BY 1""",

    // same disjoint change classes, one FULL OUTER join on the key
    "q_merge_upsert" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
          ch AS (
            SELECT doc_id, text || ' updated' AS new_text, 'update' AS op
            FROM base WHERE doc_id % 7 = 0 AND doc_id % 13 <> 4
            UNION ALL
            SELECT doc_id + 200000, 'new page ' || doc_id, 'insert'
            FROM base WHERE doc_id % 11 = 5
            UNION ALL
            SELECT doc_id, NULL, 'delete' FROM base WHERE doc_id % 13 = 4)
          SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
            COALESCE(c.op, 'keep') AS op,
            CAST(length(COALESCE(c.new_text, b.text)) AS INT) AS n_chars
          FROM base b FULL OUTER JOIN ch c ON b.doc_id = c.doc_id
          WHERE c.op IS NULL OR c.op <> 'delete'""",

    // same per-type recency windows; expire = neither in the newest 5 nor
    // within 12h of the type's latest
    "q_snapshot_expire" ->
      """WITH snaps AS (SELECT DISTINCT event_type,
              date_trunc('hour', ts) AS snapshot_hour FROM events),
          r AS (SELECT event_type, snapshot_hour,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY snapshot_hour DESC) AS recency_rank,
                  MAX(snapshot_hour) OVER (PARTITION BY event_type) AS latest
                FROM snaps)
          SELECT event_type, snapshot_hour, CAST(recency_rank AS INT) AS recency_rank,
            NOT (recency_rank <= 5
                 OR snapshot_hour >= latest - INTERVAL 12 HOUR) AS expire
          FROM r""",

    "q_topk_approx" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_id, COUNT(*) AS exact_n,
           true AS within_bound
         FROM events GROUP BY 1
         ORDER BY exact_n DESC, user_id LIMIT 10""",

    "q_compaction_plan" ->
      """SELECT event_type, date_trunc('hour', ts) AS file_hour,
           COUNT(*) AS size_rows,
           CAST(FLOOR(COALESCE(SUM(COUNT(*)) OVER (
               PARTITION BY event_type ORDER BY date_trunc('hour', ts)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 1000) AS INT) AS bin
         FROM events GROUP BY 1, 2""",

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

    // the same hashed-bucket distributions, smoothing arithmetic order,
    // and ROUND(6) contract
    "text_dsir" ->
      s"""WITH bk AS (SELECT doc_id, lang = 'en' AS is_target,
              ('0x' || substr(md5(w), 1, 15))::BIGINT % ${graft.ops.TextOps.DsirBuckets} AS b
            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                  FROM documents)),
          tgt AS (SELECT b, COUNT(*) AS tc FROM bk WHERE is_target GROUP BY 1),
          rw AS (SELECT b, COUNT(*) AS rc FROM bk GROUP BY 1),
          tt AS (SELECT SUM(tc) AS t_total FROM tgt),
          rt AS (SELECT SUM(rc) AS r_total FROM rw),
          lr AS (SELECT rw.b,
                   ln((COALESCE(tgt.tc, 0) + CAST(${graft.ops.TextOps.DsirAlpha} AS DOUBLE))
                      / (tt.t_total + CAST(${graft.ops.TextOps.DsirAlpha * graft.ops.TextOps.DsirBuckets} AS DOUBLE)))
                 - ln((rw.rc + CAST(${graft.ops.TextOps.DsirAlpha} AS DOUBLE))
                      / (rt.r_total + CAST(${graft.ops.TextOps.DsirAlpha * graft.ops.TextOps.DsirBuckets} AS DOUBLE))) AS lr
                 FROM rw LEFT JOIN tgt USING (b), tt, rt)
          SELECT bk.doc_id, ROUND(SUM(lr.lr), 6) AS dsir_logweight
          FROM bk JOIN lr USING (b) GROUP BY 1""",

    "kg_microdata" ->
      s"""WITH ${graft.ops.Relations.microdataPagesCteSql},
          ty AS (SELECT url AS subj, 'rdf:type' AS pred,
                   'schema:' || t AS obj
                 FROM (SELECT url,
                         unnest(regexp_extract_all(html,
                           '${graft.ops.Relations.MicroTypeRe}', 1)) AS t
                       FROM mdpg)),
          pr AS (SELECT url AS subj, 'schema:' || a[i] AS pred, b[i] AS obj
                 FROM (SELECT url, a, b,
                         unnest(generate_series(1, len(a))) AS i
                       FROM (SELECT url,
                               regexp_extract_all(html,
                                 '${graft.ops.Relations.MicroPropRe}', 1) AS a,
                               regexp_extract_all(html,
                                 '${graft.ops.Relations.MicroPropRe}', 2) AS b
                             FROM mdpg)))
          SELECT DISTINCT subj, pred, obj FROM
            (SELECT * FROM ty UNION ALL SELECT * FROM pr)""",

    // regex-cut script body, json_extract_string flattening, fragment-node
    // minting for the nested author — same regex + synthesis constants
    "kg_jsonld" ->
      s"""WITH $jsonLdTriplesCtes
          SELECT subj, pred, obj FROM jtr""",

    // CBD: seed-subject triples + full description of fragment sub-nodes
    // reached in object position; one frontier round is the fixed point
    // for the one-level JSON-LD nesting
    "kg_describe" ->
      s"""WITH $jsonLdTriplesCtes,
          seeds AS (SELECT DISTINCT subj FROM jtr
                    WHERE pred = 'rdf:type' AND obj = 'schema:Article'),
          st AS (SELECT t.* FROM jtr t JOIN seeds s ON t.subj = s.subj),
          fr AS (SELECT DISTINCT t.obj AS subj FROM st t
                 WHERE starts_with(t.obj, t.subj || '#')),
          nt AS (SELECT t.* FROM jtr t JOIN fr ON t.subj = fr.subj)
          SELECT DISTINCT subj, pred, obj
          FROM (SELECT * FROM st UNION ALL SELECT * FROM nt)""",

    "web_sitemap_gap" -> graft.ops.WebOps.sitemapGapSql,

    "web_page_chains" -> graft.ops.WebOps.pageChainsSql,

    "web_soft404" -> graft.ops.WebOps.soft404Sql,

    "web_change_rate" -> graft.ops.WebOps.changeRateSql,

    // same regexes over the same damaged synthesis (DuckDB plain string
    // literals pass backslash escapes to RE2 untouched); counts as BIGINTs
    "q_mojibake" ->
      s"""WITH ${TextOps.mojibakePagesCteSql}
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '${TextOps.DoubleUtf8Re}'))
              AS BIGINT) AS n_double,
            CAST(len(regexp_extract_all(text, '${TextOps.ReplCharRe}'))
              AS BIGINT) AS n_repl,
            len(regexp_extract_all(text, '${TextOps.DoubleUtf8Re}'))
              + len(regexp_extract_all(text, '${TextOps.ReplCharRe}')) > 0
              AS damaged
          FROM mjpg""",

    "kg_hearst_pairs" ->
      s"""WITH ${graft.ops.Relations.hearstPagesCteSql},
          prs AS ($hearstLegsSql)
          SELECT hypernym, hyponym, COUNT(DISTINCT doc_id) AS n_docs,
            COUNT(*) AS n_mentions
          FROM prs GROUP BY 1, 2""",

    "kg_openre" ->
      s"""WITH $dictCte, ${graft.ops.Relations.relPagesCteSql},
          prs AS ($openreLegsSql),
          res AS (SELECT prs.doc_id, cs.class_iri AS subj_iri, prs.rel,
                    co.class_iri AS obj_iri
                  FROM prs JOIN dict cs ON upper(prs.subj_surface) = cs.term
                           JOIN dict co ON upper(prs.obj_surface) = co.term
                  WHERE cs.class_iri <> co.class_iri)
          SELECT subj_iri, rel, obj_iri, COUNT(DISTINCT doc_id) AS n_docs
          FROM res GROUP BY 1, 2, 3""",

    // relation typing recomputed declaratively: distinct openre facts ×
    // exploded TUI dimension, modal type per side via ROW_NUMBER ordered
    // (cnt DESC, tui) — the engine's min(struct(-cnt, tui)) order
    "kg_schema_induction" ->
      s"""WITH $dictCte, ${graft.ops.Relations.relPagesCteSql},
          prs AS ($openreLegsSql),
          facts AS (SELECT DISTINCT cs.class_iri AS subj_iri, prs.rel,
                      co.class_iri AS obj_iri
                    FROM prs JOIN dict cs ON upper(prs.subj_surface) = cs.term
                             JOIN dict co ON upper(prs.obj_surface) = co.term
                    WHERE cs.class_iri <> co.class_iri),
          nf AS (SELECT rel, COUNT(*) AS n_facts FROM facts GROUP BY 1),
          tt(class_iri, tui) AS (
            SELECT * FROM (VALUES ${OntologyFixture.tuisValues}) v(a, b)),
          dc AS (SELECT f.rel, t.tui, COUNT(*) AS cnt
                 FROM facts f JOIN tt t ON f.subj_iri = t.class_iri
                 GROUP BY 1, 2),
          dm AS (SELECT rel, tui, cnt,
                   SUM(cnt) OVER (PARTITION BY rel) AS tot,
                   ROW_NUMBER() OVER (PARTITION BY rel
                     ORDER BY cnt DESC, tui) AS rn FROM dc),
          rc AS (SELECT f.rel, t.tui, COUNT(*) AS cnt
                 FROM facts f JOIN tt t ON f.obj_iri = t.class_iri
                 GROUP BY 1, 2),
          rm AS (SELECT rel, tui, cnt,
                   SUM(cnt) OVER (PARTITION BY rel) AS tot,
                   ROW_NUMBER() OVER (PARTITION BY rel
                     ORDER BY cnt DESC, tui) AS rn FROM rc)
          SELECT nf.rel, nf.n_facts,
            dm.tui AS domain_tui,
            ROUND(CAST(dm.cnt AS DOUBLE) / dm.tot, 6) AS domain_share,
            rm.tui AS range_tui,
            ROUND(CAST(rm.cnt AS DOUBLE) / rm.tot, 6) AS range_share
          FROM nf JOIN dm ON nf.rel = dm.rel AND dm.rn = 1
                  JOIN rm ON nf.rel = rm.rel AND rm.rn = 1""",

    "kg_hearst_isa" ->
      s"""WITH $dictCte, $edgesCte, ${graft.ops.Relations.hearstPagesCteSql},
          prs AS ($hearstLegsSql),
          cand AS (SELECT DISTINCT c.class_iri AS child_iri,
                     p.class_iri AS parent_iri
                   FROM prs JOIN dict c ON upper(prs.hyponym) = c.term
                            JOIN dict p ON upper(prs.hypernym) = p.term
                   WHERE c.class_iri <> p.class_iri)
          SELECT cand.child_iri, cand.parent_iri
          FROM cand ANTI JOIN edges
            ON cand.child_iri = edges.child_iri
           AND cand.parent_iri = edges.parent_iri""",

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

    // window explosion + first-occurrence window + per-position marking +
    // token-level rebuild, all on the RAW gram strings (re-proves the
    // engine's hashed keys)
    "text_span_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          win AS (SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS gram
                  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
                        FROM tk WHERE len(t) >= 5)),
          fst AS (SELECT gram, doc_id, pos,
                    ROW_NUMBER() OVER (PARTITION BY gram
                      ORDER BY doc_id, pos) AS rn FROM win),
          mk AS (SELECT DISTINCT w.doc_id, w.pos + j AS tp
                 FROM fst w, (SELECT unnest(generate_series(0, 4)) AS j)
                 WHERE w.rn > 1),
          tok2 AS (SELECT doc_id, i AS tp, t[i] AS tok
                   FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
                         FROM tk)),
          rb AS (SELECT t2.doc_id,
                   string_agg(t2.tok, ' ' ORDER BY t2.tp) AS text_dedup
                 FROM tok2 t2 LEFT JOIN mk
                   ON mk.doc_id = t2.doc_id AND mk.tp = t2.tp
                 WHERE mk.tp IS NULL GROUP BY t2.doc_id)
          SELECT d.doc_id, COALESCE(rb.text_dedup, '') AS text_dedup
          FROM documents d LEFT JOIN rb ON rb.doc_id = d.doc_id""",

    // the full coherence-vote recomputation: per-(url,surface) candidate
    // sets, unambiguous context, cooc votes, sense prior, deterministic
    // tie-break — the window's ORDER BY IS the engine's min(struct(...))
    "ann_disambiguate" ->
      s"""WITH $dictCte,
          dwt AS (SELECT DISTINCT 'doc://' || doc_id AS url, d.term, d.class_iri
                  FROM documents, dict d
                  WHERE regexp_matches(upper(text), '\\b' || d.term || '\\b')),
          card AS (SELECT url, term, COUNT(DISTINCT class_iri) AS nc
                   FROM dwt GROUP BY 1, 2),
          unamb0 AS (SELECT DISTINCT w.url, w.class_iri
                     FROM dwt w JOIN card c USING (url, term) WHERE c.nc = 1),
          kept AS (SELECT url FROM unamb0 GROUP BY url
                   HAVING COUNT(*) <= 1000),
          unamb AS (SELECT u.url, u.class_iri
                    FROM unamb0 u JOIN kept k USING (url)),
          amb AS (SELECT w.url, w.term, w.class_iri AS cand
                  FROM dwt w JOIN card c USING (url, term) WHERE c.nc > 1),
          cooc AS (SELECT a.class_iri AS src, b.class_iri AS dst,
                          COUNT(*) AS n_docs
                   FROM unamb a JOIN unamb b
                     ON a.url = b.url AND a.class_iri < b.class_iri
                   GROUP BY 1, 2),
          prior AS (SELECT class_iri, COUNT(*) AS p FROM unamb GROUP BY 1),
          sc AS (SELECT m.url, m.term, m.cand, COALESCE(SUM(k.n_docs), 0) AS score
                 FROM amb m
                 LEFT JOIN unamb u ON u.url = m.url AND u.class_iri <> m.cand
                 LEFT JOIN cooc k ON k.src = LEAST(m.cand, u.class_iri)
                   AND k.dst = GREATEST(m.cand, u.class_iri)
                 GROUP BY 1, 2, 3),
          r AS (SELECT sc.url, sc.term, sc.cand, sc.score,
                  ROW_NUMBER() OVER (PARTITION BY sc.url, sc.term
                    ORDER BY sc.score DESC, COALESCE(p.p, 0) DESC, sc.cand) AS rn
                FROM sc LEFT JOIN prior p ON p.class_iri = sc.cand)
          SELECT url, term, cand AS class_iri, CAST(score AS BIGINT) AS score
          FROM r WHERE rn = 1""",

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

    // bigram counts, prefix counts, vocab scalar, add-k NLL — recomputed
    // declaratively; LEFT JOIN keeps the <2-token docs as NULL
    "text_ngram_lm" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          bgr AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS bg, t[i] AS w1
                  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                        FROM toks WHERE len(t) >= 2)),
          bc AS (SELECT bg, COUNT(*) AS c2 FROM bgr GROUP BY bg),
          pc AS (SELECT w1, COUNT(*) AS c1 FROM bgr GROUP BY w1),
          voc AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
                  FROM (SELECT unnest(t) AS w FROM toks)),
          sc AS (SELECT doc_id,
                   ROUND(AVG(-ln((bc.c2 + CAST(0.5 AS DOUBLE))
                     / (pc.c1 + CAST(0.5 AS DOUBLE) * (SELECT v FROM voc)))), 6)
                     AS lm_nll
                 FROM bgr JOIN bc USING (bg) JOIN pc USING (w1)
                 GROUP BY doc_id)
          SELECT d.doc_id, sc.lm_nll FROM documents d
          LEFT JOIN sc ON sc.doc_id = d.doc_id""",

    "web_domain_quota" -> domainQuotaOracleSql,

    // the two-phase engine form must land on the SAME rows (prefilter is a
    // prefix of the hash order + exact fallback) — one oracle, two plans
    "web_domain_quota2" -> domainQuotaOracleSql,

    "kg_labelprop" -> labelPropOracleSql(iters = 4),

    "kg_modularity" -> modularityOracleSql(iters = 4),
    "kg_conductance" -> conductanceOracleSql(iters = 4),

    // L2 pairs above the fractional floor → closure-pruned candidate
    // triples → three url-keyed verification joins; same ceil arithmetic
    "kg_itemsets" ->
      s"""WITH $dictCte, $directCte,
          it AS (SELECT DISTINCT url, class_iri AS c FROM direct),
          univ AS (SELECT CAST(COUNT(DISTINCT url) AS BIGINT) AS nd FROM it),
          msup AS (SELECT CAST(CEIL(CAST(0.2 AS DOUBLE) * nd) AS BIGINT)
                     AS s FROM univ),
          fp AS (SELECT a.c AS src, b.c AS dst
                 FROM it a JOIN it b ON a.url = b.url AND a.c < b.c
                 GROUP BY 1, 2
                 HAVING COUNT(*) >= (SELECT s FROM msup)),
          cand AS (SELECT p.src AS a, p.dst AS b, q.dst AS c
                   FROM fp p JOIN fp q ON q.src = p.dst
                   WHERE EXISTS (SELECT 1 FROM fp r
                                 WHERE r.src = p.src AND r.dst = q.dst)),
          ver AS (SELECT cand.a, cand.b, cand.c,
                    CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM cand
                  JOIN it ia ON ia.c = cand.a
                  JOIN it ib ON ib.c = cand.b AND ib.url = ia.url
                  JOIN it ic ON ic.c = cand.c AND ic.url = ia.url
                  GROUP BY 1, 2, 3
                  HAVING COUNT(*) >= (SELECT s FROM msup))
          SELECT a, b, c, n_docs FROM ver""",

    // the itemsets chain + pair/item support joins; confidence and lift
    // as the same two pinned divisions, raw-double minConf filter
    "kg_assoc_rules" ->
      s"""WITH $dictCte, $directCte,
          it AS (SELECT DISTINCT url, class_iri AS c FROM direct),
          univ AS (SELECT CAST(COUNT(DISTINCT url) AS BIGINT) AS nd FROM it),
          msup AS (SELECT CAST(CEIL(CAST(0.2 AS DOUBLE) * nd) AS BIGINT)
                     AS s FROM univ),
          sup1 AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n1
                   FROM it GROUP BY 1),
          sup2 AS (SELECT a.c AS src, b.c AS dst,
                     CAST(COUNT(*) AS BIGINT) AS n2
                   FROM it a JOIN it b ON a.url = b.url AND a.c < b.c
                   GROUP BY 1, 2),
          fp AS (SELECT src, dst FROM sup2
                 WHERE n2 >= (SELECT s FROM msup)),
          cand AS (SELECT p.src AS a, p.dst AS b, q.dst AS c
                   FROM fp p JOIN fp q ON q.src = p.dst
                   WHERE EXISTS (SELECT 1 FROM fp r
                                 WHERE r.src = p.src AND r.dst = q.dst)),
          ver AS (SELECT cand.a, cand.b, cand.c,
                    CAST(COUNT(*) AS BIGINT) AS n3
                  FROM cand
                  JOIN it ia ON ia.c = cand.a
                  JOIN it ib ON ib.c = cand.b AND ib.url = ia.url
                  JOIN it ic ON ic.c = cand.c AND ic.url = ia.url
                  GROUP BY 1, 2, 3
                  HAVING COUNT(*) >= (SELECT s FROM msup)),
          rules AS (
            SELECT v.a AS ante1, v.b AS ante2, v.c AS consequent, v.n3,
              CAST(v.n3 AS DOUBLE) / p.n2 AS confr, s1.n1
            FROM ver v JOIN sup2 p ON p.src = v.a AND p.dst = v.b
            JOIN sup1 s1 ON s1.c = v.c
            UNION ALL
            SELECT v.a, v.c, v.b, v.n3,
              CAST(v.n3 AS DOUBLE) / p.n2, s1.n1
            FROM ver v JOIN sup2 p ON p.src = v.a AND p.dst = v.c
            JOIN sup1 s1 ON s1.c = v.b
            UNION ALL
            SELECT v.b, v.c, v.a, v.n3,
              CAST(v.n3 AS DOUBLE) / p.n2, s1.n1
            FROM ver v JOIN sup2 p ON p.src = v.b AND p.dst = v.c
            JOIN sup1 s1 ON s1.c = v.a)
          SELECT ante1, ante2, consequent, n3 AS n_docs,
            ROUND(confr, 6) AS confidence,
            ROUND(confr * (SELECT CAST(nd AS DOUBLE) FROM univ) / n1, 6)
              AS lift
          FROM rules WHERE confr >= CAST(0.8 AS DOUBLE)""",
    "kg_louvain_move" -> louvainMoveOracleSql(iters = 4),

    // acronym synthesis mirrored, then the miner chain: regex scan, slice
    // the |abbr| preceding tokens, initials fold, accept on exact spell
    "text_acronyms" ->
      raw"""WITH aug AS (
            SELECT doc_id,
              CASE WHEN doc_id % 11 = 0 AND len(string_split(text, ' ')) >= 2
                THEN text || ' ' || string_split(text, ' ')[1] || ' '
                  || string_split(text, ' ')[2] || ' ('
                  || upper(substring(string_split(text, ' ')[1], 1, 1))
                  || upper(substring(string_split(text, ' ')[2], 1, 1)) || ')'
                ELSE text END AS text
            FROM documents),
          ms AS (SELECT doc_id, unnest(regexp_extract_all(text,
                   '(?:[A-Za-z0-9]+ ){1,5}\([A-Z]{2,5}\)')) AS m FROM aug),
          parsed AS (SELECT doc_id,
              regexp_extract(m, '\(([A-Z]{2,5})\)', 1) AS abbr,
              string_split(regexp_replace(m, ' \([A-Z]{2,5}\)$$', ''), ' ') AS pre
            FROM ms),
          sliced AS (SELECT doc_id, abbr,
              pre[len(pre) - length(abbr) + 1 : len(pre)] AS lf
            FROM parsed WHERE len(pre) >= length(abbr)),
          checked AS (SELECT doc_id, abbr,
              array_to_string(lf, ' ') AS long_form,
              list_reduce([''] || list_transform(lf,
                t -> upper(substring(t, 1, 1))), (a, b) -> a || b) AS initials
            FROM sliced)
          SELECT abbr, long_form,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM checked WHERE initials = abbr GROUP BY 1, 2""",

    // collocations recomputed declaratively; arithmetic order mirrored
    // exactly (ratio-of-ratios before ln) so the doubles are bit-equal
    "text_collocations" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          bg AS (SELECT t[i] AS x, t[i+1] AS y
                 FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                       FROM toks WHERE len(t) >= 2)),
          bgc AS (SELECT x, y, COUNT(*) AS n_xy FROM bg GROUP BY 1, 2),
          uni AS (SELECT tok, COUNT(*) AS c
                  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
          tot AS (SELECT CAST(SUM(len(t)) AS DOUBLE) AS nt,
                         CAST(SUM(GREATEST(len(t) - 1, 0)) AS DOUBLE) AS nb
                  FROM toks)
          SELECT b.x, b.y, b.n_xy,
                 ROUND(ln((CAST(b.n_xy AS DOUBLE) / (SELECT nb FROM tot))
                   / ((CAST(ux.c AS DOUBLE) / (SELECT nt FROM tot))
                      * (CAST(uy.c AS DOUBLE) / (SELECT nt FROM tot)))), 6) AS pmi
          FROM bgc b
          JOIN uni ux ON ux.tok = b.x
          JOIN uni uy ON uy.tok = b.y
          WHERE b.n_xy >= 5""",

    // the full curation capstone recomposed from the per-operator oracle
    // pieces (exact dedup, decontamination, Gopher gate, repetition cap,
    // quality, langid) — prototyped against the Spark dump before wiring
    "curate_ledger" ->
      s"""WITH $curateLegsSql
          SELECT c.doc_id,
            (k.doc_id IS NULL) AS is_dup,
            (ct.doc_id IS NOT NULL) AS is_contaminated,
            (g.doc_id IS NULL) AS fails_gopher,
            (lr.doc_id IS NULL) AS high_repetition,
            (k.doc_id IS NOT NULL AND ct.doc_id IS NULL
              AND g.doc_id IS NOT NULL AND lr.doc_id IS NOT NULL) AS kept
          FROM corpus c
          LEFT JOIN keep k ON c.doc_id = k.doc_id
          LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
          LEFT JOIN gopher g ON c.doc_id = g.doc_id
          LEFT JOIN lowrep lr ON c.doc_id = lr.doc_id""",

    // per-bench-doc attribution over the same shingle machinery
    "curate_contamination_report" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
          pos AS (SELECT doc_id, t,
                  unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
          sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
          b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < 10),
          c AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 10),
          o AS (SELECT b.bench_id, c.doc_id, COUNT(*) AS n_overlap
                FROM c JOIN b USING (shingle) GROUP BY 1, 2)
          SELECT bench_id, COUNT(*) AS n_leaked_docs,
            CAST(SUM(n_overlap) AS BIGINT) AS total_overlap
          FROM o WHERE n_overlap >= 2 GROUP BY 1""",

    // the ledger aggregated into the published dataset datasheet
    "curate_summary" ->
      s"""WITH $curateLegsSql,
          led AS (SELECT c.doc_id,
              (k.doc_id IS NULL) AS is_dup,
              (ct.doc_id IS NOT NULL) AS is_contaminated,
              (g.doc_id IS NULL) AS fails_gopher,
              (lr.doc_id IS NULL) AS high_repetition,
              (k.doc_id IS NOT NULL AND ct.doc_id IS NULL
                AND g.doc_id IS NOT NULL AND lr.doc_id IS NOT NULL) AS kept
            FROM corpus c
            LEFT JOIN keep k ON c.doc_id = k.doc_id
            LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
            LEFT JOIN gopher g ON c.doc_id = g.doc_id
            LEFT JOIN lowrep lr ON c.doc_id = lr.doc_id)
          SELECT COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
            CAST(SUM(CASE WHEN is_contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
            CAST(SUM(CASE WHEN fails_gopher THEN 1 ELSE 0 END) AS BIGINT) AS n_fails_gopher,
            CAST(SUM(CASE WHEN high_repetition THEN 1 ELSE 0 END) AS BIGINT) AS n_high_repetition,
            CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            ROUND(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac
          FROM led""",

    // the ledger stratified by source — curate_summary's SELECT list
    // grouped by the documents.source join key
    "curate_domain_report" ->
      s"""WITH $curateLegsSql,
          led AS (SELECT c.doc_id,
              (k.doc_id IS NULL) AS is_dup,
              (ct.doc_id IS NOT NULL) AS is_contaminated,
              (g.doc_id IS NULL) AS fails_gopher,
              (lr.doc_id IS NULL) AS high_repetition,
              (k.doc_id IS NOT NULL AND ct.doc_id IS NULL
                AND g.doc_id IS NOT NULL AND lr.doc_id IS NOT NULL) AS kept
            FROM corpus c
            LEFT JOIN keep k ON c.doc_id = k.doc_id
            LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
            LEFT JOIN gopher g ON c.doc_id = g.doc_id
            LEFT JOIN lowrep lr ON c.doc_id = lr.doc_id)
          SELECT d.source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
            CAST(SUM(CASE WHEN is_contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
            CAST(SUM(CASE WHEN fails_gopher THEN 1 ELSE 0 END) AS BIGINT) AS n_fails_gopher,
            CAST(SUM(CASE WHEN high_repetition THEN 1 ELSE 0 END) AS BIGINT) AS n_high_repetition,
            CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            ROUND(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac
          FROM led JOIN documents d ON led.doc_id = d.doc_id
          GROUP BY d.source""",

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

    // mean quality via the exact integer form — (2·Σq4 + n) // (2n) over
    // BIGINTs, never AVG of doubles (the .xxxx5 boundary class)
    "text_lang_report" ->
      s"""WITH q AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS nt,
             $quality4ExprSql AS q4
           FROM documents)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST((2 * SUM(q4) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
             / 10000.0 AS mean_quality
         FROM q GROUP BY lang""",

    "curate_corpus_full" ->
      s"""WITH $curateLegsSql,
          q AS (SELECT doc_id, $qualityExprSql AS quality
                FROM corpus),
          l AS (SELECT doc_id,
                  CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
                       THEN 'en' ELSE 'und' END AS lang_pred
                FROM corpus)
          SELECT c.doc_id, q.quality, l.lang_pred,
                 CAST(len(string_split(c.text, ' ')) AS INT) AS n_tokens
          FROM corpus c
          JOIN keep USING (doc_id)
          LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
          JOIN gopher USING (doc_id)
          JOIN lowrep USING (doc_id)
          JOIN q USING (doc_id)
          JOIN l USING (doc_id)
          WHERE ct.doc_id IS NULL""",

    "curate_corpus" ->
      s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
          q AS (SELECT doc_id, $qualityExprSql AS quality
            FROM documents),
          l AS (SELECT doc_id,
            CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
                 THEN 'en' ELSE 'und' END AS lang_pred
            FROM documents)
          SELECT d.doc_id, q.quality, l.lang_pred,
                 CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
          FROM documents d
          JOIN keep ON d.doc_id = keep.doc_id
          JOIN q ON d.doc_id = q.doc_id
          JOIN l ON d.doc_id = l.doc_id
          WHERE q.quality >= 0.5""",

    // ---- KG-release QA + provenance IO (round-4 continuation) ----------

    // triples CTE = ann_triples verbatim; constraint constants interpolated
    // from KgQuality (single source of truth); the two negative-control
    // shapes are recomputed the same way and must both be empty
    "kg_shacl_report" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          concepts(class_iri) AS (SELECT * FROM (VALUES ${OntologyFixture.conceptIriValues}) v(a)),
          direct_n AS (SELECT subj, COUNT(DISTINCT obj) AS n FROM triples
                       WHERE pred = 'hasAnnotation' GROUP BY subj)
          SELECT subj AS focus, 'MaxDirectAnnotations' AS shape,
                 CAST(n AS VARCHAR) AS detail
          FROM direct_n WHERE n > ${graft.ops.KgQuality.shaclMaxDirect}
          UNION ALL
          SELECT subj, 'MissingMappedAnnotation', CAST(n AS VARCHAR)
          FROM direct_n
          WHERE subj NOT IN (SELECT subj FROM triples WHERE pred = 'hasMappedAnnotation')
          UNION ALL
          SELECT DISTINCT subj, 'DanglingExpandedObject', obj
          FROM triples
          WHERE pred = 'hasExpandedAnnotation'
            AND obj NOT IN (SELECT class_iri FROM concepts)
          UNION ALL
          SELECT DISTINCT subj, 'SubjectPattern', subj
          FROM triples
          WHERE NOT regexp_matches(subj, '^doc://[0-9]+$$')""",

    // rdfs2/rdfs3 via the schema join, rdfs9 via an (unbounded — the type
    // graph is a 2-level DAG) recursive closure over the T-Box edges
    "kg_rdfs_types" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          schema(pred, domain_type, range_type) AS (
            SELECT * FROM (VALUES ${graft.ops.KgQuality.propSchemaValues}) v(a,b,c)),
          tedges(child_iri, parent_iri) AS (
            SELECT * FROM (VALUES ${graft.ops.KgQuality.typeEdgesValues}) v(a,b)),
          tclosure(child_iri, ancestor_iri) AS (
            SELECT child_iri, parent_iri FROM tedges
            UNION ALL
            SELECT c.child_iri, e.parent_iri
            FROM tclosure c JOIN tedges e ON c.ancestor_iri = e.child_iri),
          base AS (SELECT t.subj AS node, s.domain_type AS rdf_type
                   FROM triples t JOIN schema s USING (pred)
                   UNION ALL
                   SELECT t.obj, s.range_type
                   FROM triples t JOIN schema s USING (pred)),
          lifted AS (SELECT b.node, c.ancestor_iri AS rdf_type
                     FROM base b JOIN tclosure c ON b.rdf_type = c.child_iri)
          SELECT DISTINCT node, rdf_type
          FROM (SELECT * FROM base UNION ALL SELECT * FROM lifted)""",

    // star join: direct leg restricted to the bgpRoot descendant set
    // (closure CTE), mapped leg joined back on the shared subject
    // per-(pred, obj) subject counts → bit-length buckets → histogram
    "kg_obj_degree_dist" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          od AS (SELECT pred, obj,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS deg
                 FROM triples GROUP BY 1, 2)
          SELECT pred, CAST(length(bin(deg)) - 1 AS INT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_objects
          FROM od GROUP BY 1, 2""",

    // the triple CTE rolled up per predicate
    "kg_pred_stats" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte
          SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples,
                 CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjects,
                 CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objects
          FROM triples GROUP BY 1""",

    "kg_bgp_star" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          desc_set AS (SELECT DISTINCT child_iri AS c FROM closure
                       WHERE ancestor_iri = '${graft.ops.KgQuality.bgpRoot}')
          SELECT DISTINCT dl.subj AS d, dl.obj AS c, ml.obj AS m
          FROM triples dl
          JOIN desc_set ds ON dl.obj = ds.c
          JOIN triples ml ON ml.subj = dl.subj AND ml.pred = 'hasMappedAnnotation'
          WHERE dl.pred = 'hasAnnotation'""",

    "kg_bgp_optional" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          desc_set AS (SELECT DISTINCT child_iri AS c FROM closure
                       WHERE ancestor_iri = '${graft.ops.KgQuality.bgpRoot}')
          SELECT DISTINCT dl.subj AS d, dl.obj AS c, ml.obj AS m
          FROM triples dl
          JOIN desc_set ds ON dl.obj = ds.c
          LEFT JOIN triples ml
            ON ml.subj = dl.subj AND ml.pred = 'hasMappedAnnotation'
          WHERE dl.pred = 'hasAnnotation'""",

    // the expected triples computed directly (the Spark side proves the
    // Turtle serialize→write→read→parse loop returns exactly this set)
    "io_ttl_roundtrip" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte
          SELECT subj, 'http://graft.kg/p#' || pred AS pred, obj
          FROM triples""",

    // the expected quads computed directly (the Spark side proves the
    // serialize→write→read→parse loop returns exactly this set)
    "io_nquads_roundtrip" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte
          SELECT subj, 'http://graft.kg/p#' || pred AS pred, obj,
                 'http://graft.kg/g#batch' ||
                 CAST(CAST(regexp_extract(subj, '[0-9]+$$', 0) AS BIGINT) % 4 AS VARCHAR) AS graph
          FROM triples""",

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

    // AMIE chain-rule mining: kb = triples ∪ T-Box edges ∪ mappings; body
    // = the fan-capped chain join; the four metric legs mirror RuleMine
    // exactly (constants interpolated from the object — single source of
    // truth); ratios ROUND(6) per the float contract
    "kg_rule_mine" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          ${ruleKbCtes}
          SELECT s.p1, s.p2, s.head_pred,
                 CAST(s.support AS BIGINT) AS support,
                 CAST(b.body_size AS BIGINT) AS body_size,
                 ROUND(s.support * 1.0 / h.head_size, 6) AS head_coverage,
                 ROUND(s.support * 1.0 / b.body_size, 6) AS std_conf,
                 ROUND(s.support * 1.0 / p.pca_body, 6) AS pca_conf
          FROM support s
          JOIN bodysize b USING (p1, p2)
          JOIN pca p USING (p1, p2, head_pred)
          JOIN headsize h USING (head_pred)
          WHERE s.support >= ${graft.ops.RuleMine.MinSupport}""",

    // rule application: instantiations of the PCA-confident rules minus
    // facts already in the kb; best confidence + deriving-rule count per
    // inferred triple
    "kg_rule_infer" ->
      s"""WITH RECURSIVE $dictCte, $edgesCte, $mappingsCte, $directCte, $closureCte,
          $kgTriplesCte,
          ${ruleKbCtes},
          rules AS (
            SELECT s.p1, s.p2, s.head_pred,
                   ROUND(s.support * 1.0 / p.pca_body, 6) AS pca_conf
            FROM support s
            JOIN pca p USING (p1, p2, head_pred)
            WHERE s.support >= ${graft.ops.RuleMine.MinSupport}
              AND ROUND(s.support * 1.0 / p.pca_body, 6) >=
                  ${graft.ops.RuleMine.InferMinPca}),
          inst AS (
            SELECT body.x AS subj, r.head_pred AS pred, body.z AS obj,
                   r.pca_conf
            FROM body JOIN rules r USING (p1, p2)
            WHERE NOT EXISTS (SELECT 1 FROM kb
                              WHERE kb.subj = body.x AND kb.pred = r.head_pred
                                AND kb.obj = body.z))
          SELECT subj, pred, obj, MAX(pca_conf) AS conf,
                 CAST(COUNT(*) AS BIGINT) AS n_rules
          FROM inst GROUP BY 1, 2, 3""",

    // readability recomputed declaratively: whole-text vowel-group count
    // (separator is never a vowel, so = per-word sum), same synthetic
    // sentence length, published constants verbatim, 4dp on scores only
    "text_readability" ->
      """WITH b AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS DOUBLE) AS s,
             CAST(5 + (doc_id % 5) AS DOUBLE) AS k
           FROM documents),
          c AS (SELECT doc_id, w, s, CEIL(w / k) AS sent FROM b)
          SELECT doc_id, CAST(w AS BIGINT) AS n_words,
            CAST(s AS BIGINT) AS n_syllables,
            CAST(sent AS BIGINT) AS n_sentences,
            ROUND(206.835 - 1.015 * (w / sent) - 84.6 * (s / w), 4) AS flesch,
            ROUND(0.39 * (w / sent) + 11.8 * (s / w) - 15.59, 4) AS fk_grade
          FROM c""",

    // mixture weights: same per-source token agg, sqrt (IEEE-exact), 6dp
    // on the derived ratios; budget constant shared with the Column code
    "curate_mix_weights" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
          w AS (SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM per),
          t AS (SELECT SUM(w_raw) AS w_sum FROM w)
          SELECT source, n_docs, n_tokens,
            ROUND(w_raw / w_sum, 6) AS weight,
            ROUND(w_raw / w_sum * ${graft.ops.TextOps.MixTokenBudget}.0
              / CAST(n_tokens AS DOUBLE), 6) AS epochs
          FROM w, t""",

    // the mixWeights chain + Hamilton apportionment + hash-rank selection
    // ([[graft.ops.TextOps.mixSample]] twin, N = 100)
    "curate_mix_sample" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
          w AS (SELECT *, sqrt(CAST(n_tokens AS DOUBLE)) AS w_raw FROM per),
          t AS (SELECT SUM(w_raw) AS w_sum FROM w),
          wt AS (SELECT source, ROUND(w_raw / w_sum, 6) AS weight FROM w, t),
          base AS (SELECT source,
                     CAST(FLOOR(100 * weight) AS BIGINT) AS n0,
                     100 * weight - FLOOR(100 * weight) AS frac
                   FROM wt),
          rsum AS (SELECT CAST(100 - SUM(n0) AS BIGINT) AS r FROM base),
          ranked AS (SELECT source, n0,
                       CAST(ROW_NUMBER() OVER (ORDER BY frac DESC, source)
                         AS BIGINT) AS rk
                     FROM base),
          quota AS (SELECT source,
                      n0 + CASE WHEN rk <= (SELECT r FROM rsum)
                                THEN 1 ELSE 0 END AS q
                    FROM ranked),
          sel AS (SELECT doc_id, source,
                    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                      ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT, doc_id) AS BIGINT) AS rn
                  FROM documents)
          SELECT s.source, s.doc_id
          FROM sel s JOIN quota q USING (source) WHERE s.rn <= q.q""",

    // typed literals: same injection synthesis, same shared regexes, set
    // semantics via the final DISTINCT
    "kg_literals" ->
      s"""WITH lit0 AS (SELECT 'doc://' || doc_id AS url,
             CASE WHEN doc_id % 4 = 0 THEN text || ' measured '
                 || CAST((doc_id * 7) % 1000 AS VARCHAR)
                 || ' units on 2024-'
                 || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
                 || '-' || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
               ELSE text END AS text
           FROM documents),
          legs AS (
            SELECT url, 'hasDate' AS pred,
              unnest(regexp_extract_all(text, '${graft.ops.Relations.DateRe}'))
                AS obj,
              'xsd:date' AS obj_type
            FROM lit0
            UNION ALL
            SELECT url, 'hasQuantity' AS pred,
              unnest(regexp_extract_all(text,
                '${graft.ops.Relations.QtyRe}', 1)) AS obj,
              'xsd:integer' AS obj_type
            FROM lit0)
          SELECT DISTINCT url, pred, obj, obj_type FROM legs""",

    // abbreviations: same synthesis (positive span from the doc's first
    // three tokens, negative ' bad wrong phrase (XYZ)'), same shared
    // pattern, first-letter-rule validity as boolean conjunction
    "ann_abbrev" ->
      s"""WITH t0 AS (SELECT doc_id, text, string_split(text, ' ') AS t
           FROM documents),
          t1 AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' ' || t[1] || ' ' || t[2]
                 || ' ' || t[3] || ' (' || upper(substr(t[1], 1, 1)
                 || substr(t[2], 1, 1) || substr(t[3], 1, 1)) || ')'
               ELSE text END AS text
           FROM t0),
          ab AS (SELECT 'doc://' || doc_id AS url,
             CASE WHEN doc_id % 10 = 0 THEN text || ' bad wrong phrase (XYZ)'
               ELSE text END AS text
           FROM t1),
          spans AS (SELECT url,
             unnest(regexp_extract_all(text,
               '${graft.ops.Relations.AbbrevRe}')) AS span
           FROM ab)
          SELECT DISTINCT url,
            regexp_extract(span, '${graft.ops.Relations.AbbrevRe}', 1) || ' '
              || regexp_extract(span, '${graft.ops.Relations.AbbrevRe}', 2)
              || ' '
              || regexp_extract(span, '${graft.ops.Relations.AbbrevRe}', 3)
              AS long_form,
            regexp_extract(span, '${graft.ops.Relations.AbbrevRe}', 4)
              AS short_form,
            upper(substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 1), 1, 1))
              = substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 4), 1, 1)
            AND upper(substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 2), 1, 1))
              = substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 4), 2, 1)
            AND upper(substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 3), 1, 1))
              = substr(regexp_extract(span,
                '${graft.ops.Relations.AbbrevRe}', 4), 3, 1) AS valid
          FROM spans"""
  )

  /** Oracle registry under the same duplicate gate as [[queries]], plus a
    * 1:1 cross-check — every registered query must carry an oracle and
    * vice versa, so a key typo on either side fails loudly at first use
    * instead of silently weakening the driver's correctness gate. */
  lazy val oracleSql: Map[String, String] = {
    val dups = oracleSqlSeq.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
    require(dups.isEmpty, s"duplicate oracle names in registry: ${dups.mkString(", ")}")
    val m = oracleSqlSeq.toMap
    val missing = queries.keySet -- m.keySet
    val extra = m.keySet -- queries.keySet
    require(missing.isEmpty, s"queries with no oracle: ${missing.mkString(", ")}")
    require(extra.isEmpty, s"oracles with no query: ${extra.mkString(", ")}")
    m
  }

  /** Shared CTE chain for the two rule-mining oracles: the extended kb,
    * the fan-capped chain body, and the three metric aggregations —
    * mirrors [[graft.ops.RuleMine]] leg for leg with the SAME constants. */
  private def ruleKbCtes: String =
    s"""kb AS (SELECT subj, pred, obj FROM triples
              UNION
              SELECT child_iri, '${graft.ops.RuleMine.SubClassOf}', parent_iri FROM edges
              UNION
              SELECT class_iri, '${graft.ops.RuleMine.MappedTo}', mapped_iri FROM maps),
        okfan AS (SELECT subj, pred FROM kb GROUP BY 1, 2
                  HAVING COUNT(*) <= ${graft.ops.RuleMine.FanCap}),
        body AS MATERIALIZED (
          SELECT DISTINCT a.pred AS p1, b.pred AS p2, a.subj AS x, b.obj AS z
          FROM kb a
          JOIN kb b ON a.obj = b.subj
          JOIN okfan f ON b.subj = f.subj AND b.pred = f.pred),
        bodysize AS (SELECT p1, p2, COUNT(*) AS body_size FROM body GROUP BY 1, 2),
        support AS (SELECT p1, p2, h.pred AS head_pred, COUNT(*) AS support
                    FROM body JOIN kb h ON h.subj = body.x AND h.obj = body.z
                    GROUP BY 1, 2, 3),
        pca AS (SELECT p1, p2, hp.pred AS head_pred, COUNT(*) AS pca_body
                FROM body
                JOIN (SELECT DISTINCT subj, pred FROM kb) hp ON hp.subj = body.x
                GROUP BY 1, 2, 3),
        headsize AS (SELECT pred AS head_pred, COUNT(*) AS head_size
                     FROM kb GROUP BY 1)"""
}
