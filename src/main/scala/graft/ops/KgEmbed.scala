package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed KG-embedding training: ONE full-batch TransE gradient step
  * (Bordes et al. 2013) expressed entirely as joins + keyed aggregations —
  * the shape a PyTorch-BigGraph-style trainer takes when the entity table
  * no longer fits one machine. Embeddings live in LONG format
  * `(ent | pred, d, v)`; the epoch is: hash-derived deterministic init →
  * margin-ranking loss over [[Relations.negatives]]' filtered corruptions →
  * per-entity/relation gradient as ONE aggregation each (the MEAN of that
  * parameter's pair contributions, not the sum — degree-normalized, so a
  * power-law-hot entity touched by a million pairs takes the same bounded
  * step as a cold one; the summed form diverges at lr=0.1) → SGD update →
  * re-evaluate. Output per predicate: pair count, active (loss > 0) pair
  * count before the step, and mean loss before/after — the spec asserts the
  * step actually learns (loss_after < loss_before).
  *
  * Determinism contract (the cross-engine float rules used everywhere):
  * init components are BIT-identical (one md5-derived 60-bit integer divided
  * by fixed constants); per-pair squared distances, per-parameter gradient
  * means, and final mean losses are ROUND(6) — the only places a float
  * sum's order varies between engines.
  *
  * Scale shape: positives + negatives stream once into a per-(pair, dim)
  * long table (4 equi-joins against the entity-keyed embedding table — the
  * join IS the "gather" of a parameter-server step); pair scores attach via
  * one window over the pair key (no self-join); gradients are hash
  * aggregations on (entity, dim) with map-side partials — a hot entity
  * (every page links wikipedia.org) combines before the shuffle. The
  * multi-consumer per-dim frame is pinned once (`localCheckpoint`, the
  * shared-edge-list precedent) instead of recomputed by its five readers.
  */
object KgEmbed {
  val Dim = 8
  val Margin = 1.0
  val Lr = 0.1
  val NegK = 2
  private val Two60: Double = math.pow(2, 60)

  /** Hash-derived init component in [-1, 1): `hash60(prefix‖id‖':'‖d)` over
    * 2^60, scaled — portable ([[Sketch.hash60]]'s md5 form), so the oracle's
    * identical expression is IEEE-bit-equal. */
  private def initV(prefix: String, id: Column, d: Column): Column =
    Sketch.hash60(concat(lit(prefix), id, lit(":"), d.cast("string"))) /
      lit(Two60) * lit(2.0) - lit(1.0)

  /** `(id, d, v)` init rows for every id × dimension 1..[[Dim]]. */
  private def embInit(ids: DataFrame, idCol: String, prefix: String): DataFrame =
    ids.select(col(idCol), explode(sequence(lit(1), lit(Dim))).as("d"))
      .withColumn("v", initV(prefix, col(idCol), col("d")))

  /** Per-(pair, dim) difference vectors `dp = h+r−t`, `dn = h+r−t′` — the
    * gather step: 4 equi-joins on (id, d) against the long embedding
    * tables (relations broadcast: the predicate vocabulary is tiny). */
  private def pairDiffs(pairs: DataFrame, emb: DataFrame, rel: DataFrame): DataFrame =
    pairs.select(col("subj"), col("pred"), col("obj"), col("slot"), col("neg_obj"),
        explode(sequence(lit(1), lit(Dim))).as("d"))
      .join(emb.select(col("ent").as("subj"), col("d"), col("v").as("hv")),
        Seq("subj", "d"))
      .join(broadcast(rel.select(col("pred"), col("d"), col("v").as("rv"))),
        Seq("pred", "d"))
      .join(emb.select(col("ent").as("obj"), col("d"), col("v").as("tv")),
        Seq("obj", "d"))
      .join(emb.select(col("ent").as("neg_obj"), col("d"), col("v").as("nv")),
        Seq("neg_obj", "d"))
      .withColumn("dp", col("hv") + col("rv") - col("tv"))
      .withColumn("dn", col("hv") + col("rv") - col("nv"))

  private val PairKey = Seq("subj", "pred", "obj", "slot", "neg_obj")

  /** Per-pair squared-L2 scores, rounded 6dp (the float-sum contract). */
  private def pairScores(pd: DataFrame): DataFrame =
    pd.groupBy(PairKey.map(col): _*)
      .agg(round(sum(col("dp") * col("dp")), 6).as("spos"),
        round(sum(col("dn") * col("dn")), 6).as("sneg"))

  /** Shared eval/training inputs: distinct positives → filtered negative
    * pairs + hash-initialized entity/relation embedding tables. */
  private def setup(triples: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val pos = triples.select(col("subj"), col("pred"), col("obj"))
      .distinct().localCheckpoint() // feeds negatives + entity pool + rel pool
    val pairs = Relations.negatives(pos, NegK)
      .localCheckpoint() // scored twice (before / after the update)
    val ents = pos.select(col("subj").as("ent"))
      .union(pos.select(col("obj").as("ent"))).distinct()
    val emb0 = embInit(ents, "ent", "e:")
    val rel0 = embInit(pos.select(col("pred")).distinct(), "pred", "r:")
    (pairs, emb0, rel0)
  }

  /** One full-batch TransE step over `triples(subj, pred, obj)`; returns one
    * row per predicate: `(pred, n_pairs, n_active, loss_before, loss_after)`. */
  def transeStep(triples: DataFrame): DataFrame = {
    val (pairs, emb0, rel0) = setup(triples)
    // pair scores attach to the per-dim rows via ONE window (no self-join);
    // 5 consumers downstream (before-loss + 3 gradient legs + rel gradient)
    val wp = Window.partitionBy(PairKey.map(col): _*)
    val withS = pairDiffs(pairs, emb0, rel0)
      .withColumn("spos", round(sum(col("dp") * col("dp")).over(wp), 6))
      .withColumn("sneg", round(sum(col("dn") * col("dn")).over(wp), 6))
      .localCheckpoint()
    // margin-ranking activity: only pairs with positive loss carry gradient
    val act = withS.filter(lit(Margin) + col("spos") - col("sneg") > 0)
    val entGrad = act.select(col("subj").as("ent"), col("d"),
        (lit(2.0) * (col("dp") - col("dn"))).as("g"))
      .unionAll(act.select(col("obj").as("ent"), col("d"),
        (lit(-2.0) * col("dp")).as("g")))
      .unionAll(act.select(col("neg_obj").as("ent"), col("d"),
        (lit(2.0) * col("dn")).as("g")))
      .groupBy("ent", "d").agg(round(avg(col("g")), 6).as("g"))
    val relGrad = act.groupBy("pred", "d")
      .agg(round(avg(lit(2.0) * (col("dp") - col("dn"))), 6).as("g"))
    val emb1 = emb0.join(entGrad, Seq("ent", "d"), "left")
      .select(col("ent"), col("d"),
        (col("v") - lit(Lr) * coalesce(col("g"), lit(0.0))).as("v"))
    val rel1 = rel0.join(relGrad, Seq("pred", "d"), "left")
      .select(col("pred"), col("d"),
        (col("v") - lit(Lr) * coalesce(col("g"), lit(0.0))).as("v"))
    // the d=1 slice of the window-scored frame IS the per-pair before-score
    val before = withS.filter(col("d") === 1)
      .select((PairKey.map(col) :+ col("spos") :+ col("sneg")): _*)
    val after = pairScores(pairDiffs(pairs, emb1, rel1))
      .withColumnRenamed("spos", "spos1").withColumnRenamed("sneg", "sneg1")
    before.join(after, PairKey)
      .select(col("pred"),
        greatest(lit(0.0), lit(Margin) + col("spos") - col("sneg")).as("lb"),
        greatest(lit(0.0), lit(Margin) + col("spos1") - col("sneg1")).as("la"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("lb") > 0, lit(1L)).otherwise(lit(0L))).as("n_active"),
        round(avg(col("lb")), 6).as("loss_before"),
        round(avg(col("la")), 6).as("loss_after"))
  }

  /** One gradient epoch: window-score the pairs against (emb, rel), apply
    * the degree-normalized update — returns the updated (emb, rel) plus the
    * per-pred mean loss rows OF THE INPUT embeddings (epoch-entry loss). */
  private def epochUpdate(pairs: DataFrame, emb: DataFrame, rel: DataFrame)
    : (DataFrame, DataFrame, Array[(String, Double)]) = {
    val wp = Window.partitionBy(PairKey.map(col): _*)
    val withS = pairDiffs(pairs, emb, rel)
      .withColumn("spos", round(sum(col("dp") * col("dp")).over(wp), 6))
      .withColumn("sneg", round(sum(col("dn") * col("dn")).over(wp), 6))
      .localCheckpoint()
    val loss = withS.filter(col("d") === 1)
      .select(col("pred"),
        greatest(lit(0.0), lit(Margin) + col("spos") - col("sneg")).as("l"))
      .groupBy("pred").agg(round(avg(col("l")), 6).as("loss"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val act = withS.filter(lit(Margin) + col("spos") - col("sneg") > 0)
    val entGrad = act.select(col("subj").as("ent"), col("d"),
        (lit(2.0) * (col("dp") - col("dn"))).as("g"))
      .unionAll(act.select(col("obj").as("ent"), col("d"),
        (lit(-2.0) * col("dp")).as("g")))
      .unionAll(act.select(col("neg_obj").as("ent"), col("d"),
        (lit(2.0) * col("dn")).as("g")))
      .groupBy("ent", "d").agg(round(avg(col("g")), 6).as("g"))
    val relGrad = act.groupBy("pred", "d")
      .agg(round(avg(lit(2.0) * (col("dp") - col("dn"))), 6).as("g"))
    val emb1 = emb.join(entGrad, Seq("ent", "d"), "left")
      .select(col("ent"), col("d"),
        (col("v") - lit(Lr) * coalesce(col("g"), lit(0.0))).as("v"))
    val rel1 = rel.join(relGrad, Seq("pred", "d"), "left")
      .select(col("pred"), col("d"),
        (col("v") - lit(Lr) * coalesce(col("g"), lit(0.0))).as("v"))
    (emb1, rel1, loss)
  }

  /** The TRAINING LOOP: `epochs` full-batch degree-normalized steps, loss
    * trajectory out — `(epoch, pred, loss)` for epoch 0..epochs, where
    * epoch e's row is the mean margin loss of the embeddings AFTER e
    * updates (epoch 0 = the hash init). Each epoch's embedding table is
    * pinned (`localCheckpoint` — entity-scale × Dim rows) so plan depth
    * stays constant in `epochs` instead of nesting every earlier epoch's
    * gather joins (the Lloyd-loop lineage rule); the per-epoch loss is a
    * pred-count-sized aggregate collected eagerly (it IS the output). */
  def transeEpochs(triples: DataFrame, epochs: Int = 2): DataFrame = {
    require(epochs >= 1, s"transeEpochs needs epochs >= 1, got $epochs")
    val spark = triples.sparkSession
    val (pairs, emb0, rel0) = setup(triples)
    var emb = emb0.localCheckpoint()
    var rel = rel0.localCheckpoint()
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, Double)]
    for (e <- 0 until epochs) {
      val (emb1, rel1, loss) = epochUpdate(pairs, emb, rel)
      loss.foreach { case (p, l) => out += ((e, p, l)) }
      emb = emb1.localCheckpoint()
      rel = rel1.localCheckpoint()
    }
    // final-epoch loss: score once more without updating
    pairScores(pairDiffs(pairs, emb, rel))
      .select(col("pred"),
        greatest(lit(0.0), lit(Margin) + col("spos") - col("sneg")).as("l"))
      .groupBy("pred").agg(round(avg(col("l")), 6).as("loss"))
      .collect().foreach(r => out += ((epochs, r.getString(0), r.getDouble(1))))
    import spark.implicits._
    out.toSeq.toDF("epoch", "pred", "loss")
  }

  /** Link-prediction ranking eval at the deterministic init — or, with
    * `epochs` > 0, after that many [[epochUpdate]] training steps — (the
    * FILTERED protocol over [[Relations.negatives]]' corruptions): each
    * positive is
    * ranked among {itself} ∪ {its surviving negatives} by squared-L2 score
    * (lower is better; a corruption scoring ≤ the positive — ties count
    * against, deterministically — beats it). Per predicate: positive count,
    * mean reciprocal rank, hits@1. Local-candidate ranking is the standard
    * cheap proxy when scoring every positive against the FULL entity table
    * (|positives| × |entities| rows) is not warranted for a QA gate; the
    * candidate count per positive varies where corruptions were filtered
    * out, which is the documented filtered-protocol behavior.
    *
    * Scale shape: [[pairScores]]' one pair-key aggregation, one positive-key
    * aggregation (dp does not involve the corruption, so the positive's own
    * score rides each slot row — no second join to fetch it), one
    * predicate rollup. */
  def transeRank(triples: DataFrame, epochs: Int = 0): DataFrame = {
    val (pairs, emb0, rel0) = setup(triples)
    var emb = emb0
    var rel = rel0
    if (epochs > 0) {
      emb = emb.localCheckpoint(); rel = rel.localCheckpoint()
      for (_ <- 0 until epochs) {
        val (e1, r1, _) = epochUpdate(pairs, emb, rel)
        emb = e1.localCheckpoint(); rel = r1.localCheckpoint()
      }
    }
    val ranks = pairScores(pairDiffs(pairs, emb, rel))
      .groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") <= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
    ranks.groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }
}
