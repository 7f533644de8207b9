package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the MATERIALIZED knowledge graph — the downstream
  * consumers of the triple table (kg_construct tier: once triples exist, the
  * first questions are "which concepts co-occur", "which are hubs", "what
  * are the connected clusters").
  *
  * Scale shapes:
  *  - [[cooccurrence]]: ONE shuffle (groupBy url) + map-side pair explosion
  *    from each doc's sorted concept set — the dedup_jaccard posting
  *    pattern, never a two-sided self-join of the annotation stream. The
  *    per-doc pair blow-up is C(concepts-per-doc, 2), naturally bounded by
  *    document length; `maxPerDoc` guards pathological docs (a crawl page
  *    listing an entire ontology would otherwise emit millions of pairs).
  *  - [[connectedComponents]]: iterative min-label propagation — messages
  *    shuffle keyed by node per round, `localCheckpoint` truncates plan
  *    lineage (same pattern as [[Closure.transitiveClosure]]), rounds
  *    bounded by graph diameter. Concept co-occurrence graphs are
  *    small-world (diameter ≈ 5-10), so this converges in single-digit
  *    rounds; for adversarial long-path graphs at web scale the alternating
  *    large-star/small-star contraction (O(log n) rounds) is the documented
  *    upgrade path.
  */
object KgGraph {

  /** Per-doc sorted concept sets with the skew guard applied: docs above
    * `maxPerDoc` concepts are SKIPPED entirely (documented recall trade —
    * C(n,2) pair explosion is quadratic in doc degree). Shared by
    * [[cooccurrence]] and [[conceptSimilarity]] so both the intersection
    * counts AND the per-concept doc counts see the SAME doc universe. */
  private def conceptSets(annotations: DataFrame, maxPerDoc: Int): DataFrame =
    // no distinct() before the groupBy: collect_set IS the per-doc dedup,
    // and a row-level distinct would add a second full exchange of the
    // annotation stream (hash(url, class_iri) does not satisfy hash(url))
    annotations.select(col("url"), col("class_iri"))
      .groupBy("url").agg(sort_array(collect_set(col("class_iri"))).as("cs"))
      .filter(size(col("cs")) <= maxPerDoc)

  private def pairsFromSets(sets: DataFrame): DataFrame =
    sets.filter(size(col("cs")) >= 2)
      .select(explode(flatten(transform(col("cs"), (x, i) =>
        transform(
          slice(col("cs"), i + lit(2),
            greatest(size(col("cs")) - i - lit(1), lit(0))),
          y => struct(x.as("src"), y.as("dst")))))).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n_docs"))

  /** Undirected concept co-occurrence edges: (src < dst, n_docs) — concepts
    * annotated in the same document, weighted by document count. */
  def cooccurrence(annotations: DataFrame, maxPerDoc: Int = 1000): DataFrame =
    pairsFromSets(conceptSets(annotations, maxPerDoc))

  /** Jaccard-normalized co-occurrence: edge weight = |docs(a) ∩ docs(b)| /
    * |docs(a) ∪ docs(b)| — strips raw-frequency bias from the edge weights
    * (two rare concepts always together outrank two frequent ones that
    * merely both appear everywhere). Intersections come FROM the
    * co-occurrence edges (never all-pairs); per-concept doc counts are a
    * tiny broadcast side. Doc counts are computed over the SAME
    * maxPerDoc-capped doc universe the intersections see (counting skipped
    * hub docs in n_a/n_b but not n_docs would systematically understate
    * Jaccard for concepts appearing in them); single-concept docs still
    * count — they are legitimately in docs(a) and shrink the ratio. */
  def conceptSimilarity(annotations: DataFrame, maxPerDoc: Int = 1000): DataFrame = {
    val sets = conceptSets(annotations, maxPerDoc)
    val cooc = pairsFromSets(sets)
    val docCounts = sets.select(explode(col("cs")).as("class_iri"))
      .groupBy("class_iri").agg(count(lit(1)).as("n"))
    cooc
      .join(broadcast(docCounts.select(col("class_iri").as("src"), col("n").as("n_a"))), "src")
      .join(broadcast(docCounts.select(col("class_iri").as("dst"), col("n").as("n_b"))), "dst")
      .select(col("src"), col("dst"),
        round(col("n_docs") / (col("n_a") + col("n_b") - col("n_docs")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Per-concept degree + weighted degree over the co-occurrence graph. */
  def degrees(cooccur: DataFrame): DataFrame =
    cooccur.select(col("src").as("class_iri"), col("n_docs"))
      .unionAll(cooccur.select(col("dst").as("class_iri"), col("n_docs")))
      .groupBy("class_iri")
      .agg(count(lit(1)).as("degree"), sum(col("n_docs")).as("weight"))

  /** Per-node triangle counts over the (src < dst) co-occurrence edge set —
    * the local clustering signal (concepts whose neighbors also co-occur).
    * Canonical-order edge join: for each wedge a<b, a<c (b<c) test edge
    * (b, c) with one join — every triangle a<b<c is found exactly once,
    * then credited to all three corners. Two shuffles (wedge join + final
    * count); wedge blow-up is Σ C(deg, 2), the standard bound — the
    * `maxPerDoc` cap upstream already tames degree skew from hot concepts. */
  def triangles(cooccur: DataFrame): DataFrame = {
    val e = cooccur.select(col("src"), col("dst")).localCheckpoint()
    val wedges = e.alias("e1").join(e.alias("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val tris = wedges.join(e,
      wedges("b") === e("src") && wedges("c") === e("dst"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("class_iri"))
      .groupBy("class_iri").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-iteration PageRank over the UNDIRECTED co-occurrence graph
    * (edges traversed both ways, so there are no dangling nodes — every
    * node has out-edges and the damping mass needs no sink correction).
    * Deterministic: a fixed iteration count (not a float-tolerance
    * fixpoint) makes the computation exactly expressible as unrolled SQL
    * CTEs, which is how the DuckDB oracle recomputes it. Per iteration:
    * one join + one aggregation, `localCheckpoint` truncates lineage.
    * Scores rounded to 6dp on output (cross-engine float-sum contract). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint()
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
    val withDeg = und.join(deg, "a").localCheckpoint() // (a, b, d) reused per iter
    val nodes = und.select(col("a").as("node")).distinct().localCheckpoint()
    val n = nodes.count() // driver action once — graph-side, bounded by |V|
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      pr = withDeg.join(pr, withDeg("a") === pr("node"))
        .select(col("b").as("node"), (col("pr") / col("d")).as("contrib"))
        .groupBy("node")
        .agg((lit((1.0 - damping) / n) + lit(damping) * sum(col("contrib"))).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("node").as("class_iri"), round(col("pr"), 6).as("pagerank"))
  }

  /** Connected components by iterative min-label propagation: every node's
    * component label converges to the MINIMUM class_iri in its component
    * (deterministic, and exactly what the recursive-CTE oracle computes).
    * Per round: one message shuffle + one aggregation + a convergence count;
    * stops at fixpoint or `maxIter`. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint() // reused every round — never recompute upstream
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val msgs = und.join(labels, und("a") === labels("node"))
        .select(col("b").as("node"), col("component"))
      val next = labels.unionAll(msgs)
        .groupBy("node").agg(min(col("component")).as("component"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("l"), col("n.node") === col("l.node"))
        .filter(col("n.component") =!= col("l.component")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels.select(col("node").as("class_iri"), col("component"))
  }
}
