package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AMIE-style horn-rule mining + application over the constructed KG
  * (Galárraga et al., "AMIE: association rule mining under incomplete
  * evidence in ontological knowledge bases", WWW 2013 — public work).
  * The KB is the canonical annotation triple table EXTENDED with the two
  * T-Box relations the pipeline consumed to build it, re-expressed as
  * ordinary triples: `subClassOf` (direct is-a edges) and `mappedTo`
  * (inter-ontology mappings). Over that KB the miner scores every CHAIN
  * rule `p1(x, y) ∧ p2(y, z) ⇒ ph(x, z)` with the three AMIE quality
  * measures (support, head coverage, standard/CWA confidence) plus PCA
  * confidence (the partial-completeness denominator: body pairs whose
  * subject has at least one `ph` fact).
  *
  * Why this matters as a QA gate: the pipeline's OWN expansion semantics
  * must re-emerge as confidence-1.0 rules — `hasAnnotation ∧ subClassOf ⇒
  * hasExpandedAnnotation` and `hasAnnotation ∧ mappedTo ⇒
  * hasMappedAnnotation` — so the miner doubles as an end-to-end semantic
  * check, while sub-1.0 rules expose expansions the pipeline does NOT
  * perform (ancestors of mapped concepts), which [[inferTriples]] then
  * materializes as ranked completion candidates (the Knowledge-Vault /
  * KB-completion step).
  *
  * Scale shape at 10^12 triples: the body instantiation is ONE equi-join
  * on the shared variable; the join's quadratic blow-up at hot middle
  * entities is bounded by [[FanCap]] — AMIE's functionality-style pruning
  * as a pre-aggregated key filter (out-fan per (entity, pred) ≤ FanCap on
  * the second atom), computed map-side-combinable and applied as a
  * left-semi join, so a concept annotated by a million pages multiplies
  * each of those pages by at most FanCap continuations, never by another
  * million. All metric joins are keyed on (x, z) pairs or on x with a
  * ≤ |preds| multiplier; head sizes are a predicate-count-sized broadcast.
  * The KB and body frames each feed several consumers and pin once
  * (`localCheckpoint`, the shared-edge-list precedent).
  *
  * Determinism: counts are exact integers; the three ratio columns are
  * ROUND(6) per the cross-engine float contract. All thresholds live here
  * once and are interpolated into the oracle SQL by the paired builder.
  */
object RuleMine {

  /** Max out-fan per (entity, pred) on the SECOND body atom — the AMIE
    * functionality prune that bounds the chain join's per-row multiplier.
    * 64 keeps every fixture relation intact (T-Box fans are single-digit;
    * per-doc annotation fans stay under it at test SFs) while capping the
    * web-scale hot key. */
  val FanCap = 64

  /** Minimum rule support (distinct body pairs also in the head) — AMIE's
    * default-style absolute floor; rules below it are noise at any SF. */
  val MinSupport = 5

  /** PCA-confidence floor for [[inferTriples]]' completion candidates. */
  val InferMinPca = 0.3

  val SubClassOf = "subClassOf"
  val MappedTo = "mappedTo"

  /** The extended KB: annotation triples ∪ is-a edges ∪ mappings, distinct.
    * T-Box legs are dictionary-scale; the union's cost is the triple scan. */
  def kb(triples: DataFrame, edges: DataFrame, maps: DataFrame): DataFrame =
    triples.select(col("subj"), col("pred"), col("obj"))
      .unionAll(edges.select(col("child_iri").as("subj"),
        lit(SubClassOf).as("pred"), col("parent_iri").as("obj")))
      .unionAll(maps.select(col("class_iri").as("subj"),
        lit(MappedTo).as("pred"), col("mapped_iri").as("obj")))
      .distinct()

  /** Distinct chain-body instantiations `(p1, p2, x, z)` with the FanCap
    * prune on the second atom's (subj, pred) out-fan. */
  private def bodyPairs(k: DataFrame): DataFrame = {
    val okFan = k.groupBy("subj", "pred").agg(count(lit(1)).as("fan"))
      .filter(col("fan") <= FanCap).select("subj", "pred")
    val p2 = k.join(okFan, Seq("subj", "pred"), "left_semi")
      .select(col("subj").as("mid"), col("pred").as("p2"), col("obj").as("z"))
    k.select(col("subj").as("x"), col("pred").as("p1"), col("obj").as("mid"))
      .join(p2, "mid")
      .select("p1", "p2", "x", "z").distinct()
  }

  /** Internal: rules from a pinned KB + pinned body (shared with
    * [[inferTriples]] so inference reuses the same frames). */
  private def rulesFrom(k: DataFrame, body: DataFrame): DataFrame = {
    val bodySize = body.groupBy("p1", "p2")
      .agg(count(lit(1)).as("body_size"))
    val support = body
      .join(k.select(col("subj").as("x"), col("pred").as("head_pred"),
        col("obj").as("z")), Seq("x", "z"))
      .groupBy("p1", "p2", "head_pred").agg(count(lit(1)).as("support"))
    val pcaDen = body
      .join(k.select(col("subj").as("x"), col("pred").as("head_pred"))
        .distinct(), Seq("x"))
      .groupBy("p1", "p2", "head_pred").agg(count(lit(1)).as("pca_body"))
    val headSize = k.groupBy(col("pred").as("head_pred"))
      .agg(count(lit(1)).as("head_size"))
    support.filter(col("support") >= MinSupport)
      .join(bodySize, Seq("p1", "p2"))
      .join(pcaDen, Seq("p1", "p2", "head_pred"))
      .join(broadcast(headSize), Seq("head_pred"))
      .select(col("p1"), col("p2"), col("head_pred"),
        col("support"), col("body_size"),
        round(col("support") / col("head_size"), 6).as("head_coverage"),
        round(col("support") / col("body_size"), 6).as("std_conf"),
        round(col("support") / col("pca_body"), 6).as("pca_conf"))
  }

  /** Mine all chain rules with support ≥ [[MinSupport]]. One row per
    * `(p1, p2, head_pred)`: support, body size, head coverage, standard
    * confidence, PCA confidence (each ratio ROUND(6)). */
  def mineRules(triples: DataFrame, edges: DataFrame,
                maps: DataFrame): DataFrame = {
    val k = kb(triples, edges, maps).localCheckpoint() // 4 consumers
    rulesFrom(k, bodyPairs(k).localCheckpoint())       // 3 consumers
  }

  /** KB completion: instantiate every rule with `pca_conf` ≥
    * [[InferMinPca]] (and the miner's support floor) over the SAME body
    * pairs, drop instantiations already in the KB (left-anti on the full
    * triple key), and emit one row per inferred `(subj, pred, obj)` with
    * the best rule's confidence and the count of independent rules that
    * derived it. The rule table is predicate-combination-sized and
    * broadcasts; the anti-join is keyed on the triple itself — the sink's
    * layout. */
  def inferTriples(triples: DataFrame, edges: DataFrame,
                   maps: DataFrame): DataFrame = {
    val k = kb(triples, edges, maps).localCheckpoint()
    val body = bodyPairs(k).localCheckpoint()
    val good = rulesFrom(k, body)
      .filter(col("pca_conf") >= InferMinPca)
      .select("p1", "p2", "head_pred", "pca_conf")
    body.join(broadcast(good), Seq("p1", "p2"))
      .select(col("x").as("subj"), col("head_pred").as("pred"),
        col("z").as("obj"), col("pca_conf"))
      .join(k, Seq("subj", "pred", "obj"), "left_anti")
      .groupBy("subj", "pred", "obj")
      .agg(max(col("pca_conf")).as("conf"), count(lit(1)).as("n_rules"))
  }
}
