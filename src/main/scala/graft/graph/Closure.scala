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
}
