package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** H1–H2 — bounded transitive closure with min-distance, the precomputed form
  * of the reference's per-request `expand_hierarchies` (SURVEY.md §3.3 H2,
  * BASELINE.json north_star: "iterative transitive-closure join over a
  * broadcast ontology parent map").
  *
  * Catalyst cannot express iteration, so this is a driver loop of broadcast
  * joins with `localCheckpoint()` per iteration to truncate plan lineage
  * (SURVEY.md §5.3). Diamonds dedupe to min distance each round; cycles are
  * bounded by `maxLevel` (and never extend the frontier once re-reached at a
  * non-decreasing distance).
  */
object Closure {

  /** edges: (child_iri, parent_iri) → closure (child, ancestor, distance)
    * with 1 ≤ distance ≤ maxLevel, distance = shortest is-a path length. */
  def transitiveClosure(edges: DataFrame, maxLevel: Int): DataFrame = {
    val e = broadcast(
      edges.select(col("child_iri").as("e_child"), col("parent_iri").as("e_parent")))
    // round-0 state follows the shared pin policy: persist (lineage back to
    // the durable input survives executor loss) when a checkpoint dir is
    // configured, localCheckpoint otherwise — an unconditional
    // localCheckpoint here would root every later round's recovery path in
    // unrecoverable blocks
    var closure = KgGraph.pin(edges
      .select(col("child_iri").as("child"), col("parent_iri").as("ancestor"))
      .distinct()
      .withColumn("distance", lit(1)))
    var level = 1
    var frontierNonEmpty = true
    val trunc = KgGraph.truncator()
    while (level < maxLevel && frontierNonEmpty) {
      val frontier = closure.filter(col("distance") === level)
      val next = frontier
        .join(e, frontier("ancestor") === col("e_child"))
        .select(col("child"), col("e_parent").as("ancestor"), (lit(level + 1)).as("distance"))
      // same truncation policy as the KG iterative ops: reliable checkpoint
      // every 5th round when a checkpoint dir is configured (ontology-side
      // graphs are small, but a deep maxLevel on a real cluster gets the
      // same executor-loss recovery for free), localCheckpoint otherwise
      closure = trunc(
        closure.unionByName(next)
          .groupBy("child", "ancestor").agg(min("distance").as("distance")),
        level)
      frontierNonEmpty = closure.filter(col("distance") === level + 1).limit(1).count() > 0
      level += 1
    }
    closure
  }

  /** INCREMENTAL closure maintenance on edge ADDITIONS — the hierarchy-side
    * sibling of the dict-side incremental re-annotation: a weekly ontology
    * release adds a handful of is-a edges, and recomputing the closure of a
    * 10^8-term hierarchy from scratch for three new edges is the same waste
    * as re-annotating 10^12 docs for three new terms.
    *
    * Semi-naive delta evaluation: every v2-only path uses ≥ 1 new edge, so
    * it factors as `old* (Δ old*)^m, m ≥ 1`. With
    * `S = Δ ∘ (identity ∪ C1)` (exactly one leading new edge, then old
    * edges only), round m composes `F_m = F_{m-1} ∘ S` (paths with m new
    * segments), and the final graft is `N = (identity ∪ C1) ∘ F`. The v2
    * closure is then `min-distance(C1 ∪ N)`. Pruning intermediates at
    * `distance > maxLevel` is sound — distances are additive and
    * non-negative — and an EMPTY round m implies every later round is
    * empty (an m+1-segment path ≤ L contains an m-segment prefix ≤ L).
    *
    * Scale shape: Δ is release-delta-sized → broadcast; composition rounds
    * touch only delta-reachable pairs (F stays tiny and broadcast); the big
    * old closure is SCANNED twice (build S, graft N) and shuffled once
    * (the final min-distance agg) — vs `maxLevel` full join+agg rounds for
    * a cold rebuild. Distances in, distances out: result == a full
    * [[transitiveClosure]] over `edges ∪ deltaEdges` (spec + oracle). */
  def deltaClosure(edges: DataFrame, deltaEdges: DataFrame, maxLevel: Int,
                   oldClosure: DataFrame): DataFrame = {
    require(maxLevel >= 1, s"maxLevel must be >= 1, got $maxLevel")
    val d = broadcast(deltaEdges.select(
      col("child_iri").as("d_child"), col("parent_iri").as("d_parent")))
    val ends = edges.select(col("child_iri").as("n"))
      .unionByName(edges.select(col("parent_iri").as("n")))
      .unionByName(deltaEdges.select(col("child_iri").as("n")))
      .unionByName(deltaEdges.select(col("parent_iri").as("n")))
      .distinct()
    val ident = ends.select(col("n").as("child"), col("n").as("ancestor"),
      lit(0).as("distance"))
    val a = oldClosure.select("child", "ancestor", "distance").unionByName(ident)
    // S: one new edge, then an (optionally empty) old path
    val s = KgGraph.pin(
      d.join(a, col("d_parent") === a("child"))
        .select(col("d_child").as("child"), col("ancestor"),
          (col("distance") + 1).as("distance"))
        .filter(col("distance") <= maxLevel)
        .groupBy("child", "ancestor").agg(min("distance").as("distance")))
    val sB = broadcast(s.select(col("child").as("s_child"),
      col("ancestor").as("s_ancestor"), col("distance").as("s_distance")))
    // TRUE semi-naive iteration: each round composes only the PREVIOUS
    // round's IMPROVED pairs with S (recomposing the whole cumulative set
    // would re-derive earlier rounds and keep the empty-round exit from
    // ever firing once two new edges chain). Completeness: a round-(m+1)
    // improvement extends a pair that was itself improved in round m —
    // had its prefix been no better than an older distance, the same
    // composite would already have been derived from that older pair.
    var f = s
    var frontier = s
    var m = 1
    var more = s.limit(1).count() > 0
    val trunc = KgGraph.truncator()
    while (m < maxLevel && more) {
      val composed = frontier.join(sB, frontier("ancestor") === col("s_child"))
        .select(frontier("child"), col("s_ancestor").as("ancestor"),
          (frontier("distance") + col("s_distance")).as("distance"))
        .filter(col("distance") <= maxLevel)
        .groupBy("child", "ancestor").agg(min("distance").as("d_new"))
      val improved = composed
        .join(f.select(col("child"), col("ancestor"),
          col("distance").as("d_old")), Seq("child", "ancestor"), "left")
        .filter(col("d_old").isNull || col("d_new") < col("d_old"))
        .select(col("child"), col("ancestor"), col("d_new").as("distance"))
      more = improved.limit(1).count() > 0
      if (more) {
        frontier = KgGraph.pin(improved) // read twice: union + next round
        f = trunc(
          f.unionByName(frontier)
            .groupBy("child", "ancestor").agg(min("distance").as("distance")),
          m)
      }
      m += 1
    }
    // graft old prefixes onto the delta paths; ident keeps F itself
    val fB = broadcast(f.select(col("child").as("f_child"),
      col("ancestor").as("f_ancestor"), col("distance").as("f_distance")))
    val n = a.join(fB, a("ancestor") === col("f_child"))
      .select(a("child"), col("f_ancestor").as("ancestor"),
        (a("distance") + col("f_distance")).as("distance"))
      .filter(col("distance") <= maxLevel)
    oldClosure.select("child", "ancestor", "distance").unionByName(n)
      .groupBy("child", "ancestor").agg(min("distance").as("distance"))
  }
}
