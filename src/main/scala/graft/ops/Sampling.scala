package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, consistent corpus sampling — how a 10^12-document corpus
  * is downsampled REPRODUCIBLY: the keep decision is a pure function of a
  * stable row id, never of rng state, partitioning, or task order (Spark's
  * `df.sample` is none of those things across runs/plans). Hash the id to
  * a uniform bucket in [0,100); keep bucket < pct.
  *
  * Consistency property (the reason to sample this way): the pct=10 sample
  * is a strict subset of the pct=20 sample of the same corpus — growing a
  * sample never churns previously selected rows, so downstream caches /
  * annotations / eval sets stay valid as the sample rate changes. Same
  * deal across engines: the bucket is the portable md5-derived hash, so an
  * offline DuckDB job selects the identical rows.
  *
  * Scale: map-only column expressions — no shuffle, no rng, filter sits
  * directly above the scan (and the bucket predicate is cheap enough to
  * compute per row at full corpus width). */
object Sampling {

  /** Uniform bucket in [0,100) from a stable id column. */
  def bucket100(id: Column): Column = Sketch.hash60(id.cast("string")) % 100

  /** Keep rows whose id-bucket < pct (a consistent pct% sample). */
  def consistentSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct out of [0,100]")
    df.filter(bucket100(col(idCol)) < pct)
  }

  /** Stratified consistent sample: per-stratum rates (e.g. keep 10% of
    * English but 50% of low-resource languages — the training-data
    * rebalancing move), same hash so strata samples are individually
    * consistent. Strata absent from `rates` fall back to `defaultPct`. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket100(col(idCol)) < pct)
  }

  /** Train/validation/test assignment off the same hash bucket — disjoint
    * and exhaustive BY CONSTRUCTION (one bucket, three ranges), stable
    * under corpus growth (a doc's split never changes when other docs
    * arrive — the property rng-based splitting lacks), and decontamination
    * -friendly (membership is recomputable anywhere from the id alone).
    * Map-only. */
  def split(df: DataFrame, idCol: String,
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split $trainPct/$valPct")
    val b = bucket100(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
