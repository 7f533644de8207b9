package graft.annotate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collective entity-linking disambiguation — the step after dictionary
  * matching when a surface form maps to MORE THAN ONE concept (the LOOM
  * regime: the same label exists in several ontologies; an annotator must
  * choose which concept a mention denotes). The method is the classic
  * coherence vote (Cucerzan 2007 / Milne & Witten 2008 family, reduced to
  * its co-occurrence core so it stays exactly SQL-recomputable):
  *
  *   1. Mentions whose surface maps to exactly ONE concept are UNAMBIGUOUS
  *      — they anchor the document's context.
  *   2. A corpus-wide co-occurrence graph is built over unambiguous
  *      annotations only ([[graft.graph.KgGraph.cooccurrence]] — one
  *      groupBy(url) + map-side pair explosion, `maxPerDoc` skew cap).
  *   3. Each ambiguous mention's candidates are scored by the summed
  *      co-occurrence doc-count between the candidate and the document's
  *      unambiguous concepts; ties fall to the candidate's corpus-wide
  *      unambiguous-annotation count (the most-frequent-sense prior), then
  *      lexicographic class_iri — fully deterministic.
  *
  * Scale shape: hub documents (more than `maxPerDoc` distinct unambiguous
  * concepts — a page that lists an ontology) are excluded from the
  * unambiguous UNIVERSE itself, so the SAME capped set feeds the cooc
  * build, the context join, and the sense prior (the
  * [[graft.graph.KgGraph.conceptSimilarity]] one-universe precedent):
  * the context join's fan-out per ambiguous mention is genuinely bounded
  * by `maxPerDoc`, it joins the cooc edge table on its (small) key, and
  * aggregates — two shuffles beyond the cooc build, nothing quadratic in
  * the corpus. Ambiguity is decided per (url, surface), NOT per dictionary
  * term globally, so a term that is ambiguous only under a request-time
  * ontology filter resolves correctly for that request. */
object Disambiguate {

  /** `matches`: the annotator match stream — needs (url, text, class_iri)
    * where `text` is the matched surface (normalization = case fold, so
    * `upper(text)` IS the dictionary term). Returns one row per ambiguous
    * mention: (url, term, class_iri = the chosen concept, score = context
    * votes for it). */
  def collective(matches: DataFrame, maxPerDoc: Int = 1000): DataFrame = {
    val withTerm = matches
      .select(col("url"), upper(col("text")).as("term"), col("class_iri"))
      .distinct()
    val card = withTerm.groupBy("url", "term")
      .agg(countDistinct(col("class_iri")).as("nc"))
    val unambAll = withTerm.join(card.filter(col("nc") === 1), Seq("url", "term"))
      .select(col("url"), col("class_iri")).distinct()
    // ONE capped universe for cooc + context + prior: hub docs (> maxPerDoc
    // unambiguous concepts) drop from all three consistently
    val kept = unambAll.groupBy("url").agg(count(lit(1)).as("ncon"))
      .filter(col("ncon") <= maxPerDoc).select("url")
    val unamb = unambAll.join(kept, "url")
    val amb = withTerm.join(card.filter(col("nc") > 1), Seq("url", "term"))
      .select(col("url"), col("term"), col("class_iri").as("cand"))

    val cooc = graft.graph.KgGraph.cooccurrence(unamb, maxPerDoc)
    val prior = unamb.groupBy(col("class_iri").as("pc"))
      .agg(count(lit(1)).as("p"))

    // context votes: candidate × same-doc unambiguous concepts × cooc edge
    val ctx = unamb.select(col("url").as("cu"), col("class_iri").as("ctx"))
    val scored = amb
      .join(ctx, amb("url") === col("cu") && col("ctx") =!= col("cand"), "left")
      .join(cooc,
        least(col("cand"), col("ctx")) === cooc("src") &&
          greatest(col("cand"), col("ctx")) === cooc("dst"), "left")
      .groupBy(amb("url"), col("term"), col("cand"))
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("score"))

    scored.join(prior, col("cand") === col("pc"), "left")
      .na.fill(0L, Seq("p"))
      .groupBy(col("url"), col("term"))
      .agg(min(struct((-col("score")).as("ns"), (-col("p")).as("np"),
        col("cand").as("c"), col("score").as("s"))).as("m"))
      .select(col("url"), col("term"), col("m.c").as("class_iri"),
        col("m.s").as("score"))
  }
}
