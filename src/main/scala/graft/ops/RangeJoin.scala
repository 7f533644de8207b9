package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-distance (range/interval) joins at corpus scale. A naive
  * `a JOIN b ON abs(a.ts - b.ts) <= d` is a BroadcastNestedLoopJoin (or a
  * full cartesian after a keyed equi-part) — quadratic per key and a
  * scale-killer. The standard fix: BUCKETIZE the range axis into bins of
  * width = the join distance, equi-join on (key, bin) with each left row
  * probing its own bin AND the adjacent one, then post-filter the exact
  * predicate. Every candidate pair shares a bin pair, so the join is a
  * plain shuffled equi-join whose cost is bounded by bin occupancy — the
  * same skew story as any groupBy key (AQE skew-join applies).
  */
object RangeJoin {

  /** Ordered pairs of events of the SAME key within `maxGapSec` of each
    * other (strictly earlier first; ties broken by id to keep the pair set
    * deterministic and self-pair-free). Emits each left row into its own
    * bin and its successor bin, so a pair straddling a bin boundary is
    * still co-located; the exact gap predicate prunes the rest. One
    * equi-join shuffle on (key, bin) — no inequality join node anywhere.
    *
    * `df` needs (idCol, keyCol, tsCol); output: key, id_a, id_b, gap_s
    * with ts_a <= ts_b. */
  def pairsWithinGap(df: DataFrame, keyCol: String, idCol: String,
                     tsCol: String, maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, s"maxGapSec=$maxGapSec must be positive")
    val ep = col(tsCol).cast("timestamp").cast("long")
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"), ep.as("t"),
      floor(ep / maxGapSec).as("bin"))
    // left probes its own bin and the NEXT one: for an ordered pair
    // (a <= b) within gap, b's bin is a's bin or a's bin + 1
    val probe = base.select(col("k"), col("id"), col("t"),
      explode(array(col("bin"), col("bin") + 1)).as("bin"))
    probe.alias("a").join(base.alias("b"),
        col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
          (col("b.t") - col("a.t")).between(0, maxGapSec) &&
          (col("a.t") < col("b.t") ||
            (col("a.t") === col("b.t") && col("a.id") < col("b.id"))))
      .select(col("a.k").as(keyCol), col("a.id").as("id_a"),
        col("b.id").as("id_b"), (col("b.t") - col("a.t")).as("gap_s"))
    // no dedupe needed: b's bin equals EXACTLY ONE of a's two probe bins
    // (own when bins coincide, next when the pair straddles a boundary)
  }
}
