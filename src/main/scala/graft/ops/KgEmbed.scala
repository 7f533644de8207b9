package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed KG-embedding training: full-batch TransE (Bordes et al.
  * 2013) expressed entirely as joins + keyed aggregations — the shape a
  * PyTorch-BigGraph-style trainer takes when the entity table no longer
  * fits one machine. Embeddings live as ARRAYS keyed by entity; an epoch
  * is: hash-derived deterministic init → gather (3 entity-keyed equi-joins
  * + a broadcast relation join) → margin-ranking loss over
  * [[Relations.negatives]]' filtered corruptions, scored map-side by the
  * codegen'd [[graft.functions.TranseScores]] — no per-(pair, dim) window,
  * no pairs×dims exchange (the first long-format form pinned a 64M-row
  * intermediate at the 2M-page probe and spent 199 s/epoch on it) →
  * per-parameter gradient as ONE aggregation (the MEAN of that parameter's
  * pair contributions, not the sum — degree-normalized, so a
  * power-law-hot entity touched by a million pairs takes the same bounded
  * step as a cold one; the summed form diverges at lr=0.1) → SGD update
  * projected back into the array form (fixed small Dim → plain `array()`
  * of codegen'd `element_at` updates, no higher-order functions).
  *
  * Determinism contract (the cross-engine float rules used everywhere):
  * init components are BIT-identical (one md5-derived 60-bit integer
  * divided by fixed constants); per-pair squared distances, per-parameter
  * gradient means, and final mean losses are ROUND(6) — the only places a
  * float sum's order varies between engines. The oracle keeps its
  * long-format SQL: dp/dn values are bit-identical and every comparison
  * happens on ROUND(6) quantities, so the array refactor is invisible
  * to it.
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
  private def initV(prefix: String, id: Column, d: Int): Column =
    Sketch.hash60(concat(lit(prefix), id, lit(":" + d))) /
      lit(Two60) * lit(2.0) - lit(1.0)

  /** `(id, emb)` init rows — a fixed-width `array()` of per-dimension hash
    * components (codegen'd; Dim is a small constant). */
  private def embInit(ids: DataFrame, idCol: String, prefix: String): DataFrame =
    ids.select(col(idCol),
      array((1 to Dim).map(d => initV(prefix, col(idCol), d)): _*).as("emb"))

  private val PairKey = Seq("subj", "pred", "obj", "slot", "neg_obj")

  /** The gather: corruption pairs pick up their four embedding arrays
    * (relations broadcast — the predicate vocabulary is tiny) and score
    * map-side; `spos`/`sneg` are ROUND(6) squared L2 (the float contract). */
  private def gatherScores(pairs: DataFrame, emb: DataFrame,
                           rel: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftShim
    pairs
      .join(emb.select(col("ent").as("subj"), col("emb").as("h")), Seq("subj"))
      .join(broadcast(rel.select(col("pred"), col("emb").as("r"))), Seq("pred"))
      .join(emb.select(col("ent").as("obj"), col("emb").as("t")), Seq("obj"))
      .join(emb.select(col("ent").as("neg_obj"), col("emb").as("x")), Seq("neg_obj"))
      .withColumn("sc", GraftShim.column(graft.functions.TranseScores(
        GraftShim.expression(array(col("h"), col("r"), col("t"), col("x"))))))
      .withColumn("spos", round(element_at(col("sc"), 1), 6))
      .withColumn("sneg", round(element_at(col("sc"), 2), 6))
  }

  /** Per-pair scores only — the eval path. */
  private def pairScores(pairs: DataFrame, emb: DataFrame,
                         rel: DataFrame): DataFrame =
    gatherScores(pairs, emb, rel)
      .select((PairKey.map(col) :+ col("spos") :+ col("sneg")): _*)

  /** Shared eval/training inputs: distinct positives → filtered negative
    * pairs + hash-initialized entity/relation embedding tables. */
  private def setup(triples: DataFrame)
    : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val pos = triples.select(col("subj"), col("pred"), col("obj"))
      .distinct().localCheckpoint() // feeds negatives + entity pool + rel pool
    val pairs = Relations.negatives(pos, NegK)
      .localCheckpoint() // scored once per epoch + once per eval
    val ents = pos.select(col("subj").as("ent"))
      .union(pos.select(col("obj").as("ent"))).distinct()
    (pos, pairs, embInit(ents, "ent", "e:"),
      embInit(pos.select(col("pred")).distinct(), "pred", "r:"))
  }

  private def marginLoss: Column =
    greatest(lit(0.0), lit(Margin) + col("spos") - col("sneg"))

  /** One gradient epoch. Returns the updated (emb, rel) and the entry-loss
    * metrics of the INPUT embeddings: `(pred, n_pairs, n_active, loss)` —
    * predicate-count-sized, collected eagerly (it IS the output). */
  private def epochUpdate(pairs: DataFrame, emb: DataFrame, rel: DataFrame,
                          withLoss: Boolean = true)
    : (DataFrame, DataFrame, scala.concurrent.Future[Array[(String, Long, Long, Double)]]) = {
    import scala.concurrent.ExecutionContext.Implicits.global
    // the pinned pair table carries the two per-dimension DIFFERENCE
    // arrays (dp_d = h_d + r_d − t_d, dn_d likewise vs the corruption)
    // instead of the four raw embedding arrays the gradients used to
    // index: the same element_at expression trees evaluate BEFORE the
    // checkpoint (bit-identical doubles), and the resident block — the
    // trainer's dominant memory at the 2M-page probe scale, where the
    // four-array form sat at a razor-thin margin with intermittent
    // [UNABLE_TO_ACQUIRE_MEMORY] — shrinks by ~40%
    def dArr(c: Column): Column = array((1 to Dim).map(d =>
      element_at(col("h"), d) + element_at(col("r"), d)
        - element_at(c, d)): _*)
    val scored = gatherScores(pairs, emb, rel)
      .select((PairKey.map(col) :+ col("spos") :+ col("sneg") :+
        dArr(col("t")).as("dps") :+ dArr(col("x")).as("dns")): _*)
      .localCheckpoint() // metrics + 4 gradient consumers
    // the entry-loss metrics and the gradient chain both read the pinned
    // `scored` and are otherwise independent — collect the metrics on a
    // driver thread so the caller's gradient/update materialization
    // overlaps it (the trustRank concurrent-jobs pattern) instead of
    // serializing two full passes over scored; callers that discard the
    // metrics (conceptNeighbors, the trained rank eval) skip the pass
    // outright via withLoss = false
    val loss = if (!withLoss) scala.concurrent.Future.successful(
      Array.empty[(String, Long, Long, Double)])
    else scala.concurrent.Future(
      scored.select(col("pred"), marginLoss.as("l"))
        .groupBy("pred")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l") > 0, lit(1L)).otherwise(lit(0L))).as("na"),
          round(avg(col("l")), 6).as("loss"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))))
    // active pairs, exploded to per-dimension difference rows for the
    // gradient legs (element_at projections — codegen'd, no HOFs)
    val act = scored.filter(lit(Margin) + col("spos") - col("sneg") > 0)
    val actD = act
      .select(col("subj"), col("pred"), col("obj"), col("neg_obj"),
        explode(sequence(lit(1), lit(Dim))).as("d"),
        col("dps"), col("dns"))
      .withColumn("dp", element_at(col("dps"), col("d")))
      .withColumn("dn", element_at(col("dns"), col("d")))
    // per-parameter mean gradient, pivoted to one row per entity in the
    // SAME aggregation (avg(when(d = j)) ignores the other dims' NULLs —
    // exactly the per-(ent, d) mean, one exchange instead of two)
    val gradCols = (1 to Dim).map(j =>
      round(avg(when(col("d") === j, col("g"))), 6).as(s"g$j"))
    val entGrad = actD.select(col("subj").as("ent"), col("d"),
        (lit(2.0) * (col("dp") - col("dn"))).as("g"))
      .unionAll(actD.select(col("obj").as("ent"), col("d"),
        (lit(-2.0) * col("dp")).as("g")))
      .unionAll(actD.select(col("neg_obj").as("ent"), col("d"),
        (lit(2.0) * col("dn")).as("g")))
      .groupBy("ent")
      .agg(gradCols.head, gradCols.tail: _*)
    val relGrad = actD
      .select(col("pred"), col("d"), (lit(2.0) * (col("dp") - col("dn"))).as("g"))
      .groupBy("pred")
      .agg(gradCols.head, gradCols.tail: _*)
    def updated(base: DataFrame, grads: DataFrame, key: String): DataFrame =
      base.join(grads, Seq(key), "left")
        .select(col(key), array((1 to Dim).map(j =>
          element_at(col("emb"), j)
            - lit(Lr) * coalesce(col(s"g$j"), lit(0.0))): _*).as("emb"))
    (updated(emb, entGrad, "ent"), updated(rel, relGrad, "pred"), loss)
  }

  /** One full-batch TransE step over `triples(subj, pred, obj)`; returns one
    * row per predicate: `(pred, n_pairs, n_active, loss_before, loss_after)`. */
  def transeStep(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    val (_, pairs, emb0, rel0) = setup(triples)
    val (emb1u, rel1u, beforeF) = epochUpdate(pairs, emb0, rel0)
    // pinned before the re-eval (the transeEpochs policy): gatherScores
    // joins the entity table THREE times (subj/obj/neg_obj legs), and an
    // unpinned emb1 re-executes the gradient-aggregation chain per leg.
    // SEQUENCE MATTERS at scale (measured at the 2M-page probe): the two
    // pins run one after the other, AFTER the metrics await — with the
    // four-array pair checkpoint, concurrent gradient materializations
    // (and even the overlapped metrics collect) tipped the trainer into
    // [UNABLE_TO_ACQUIRE_MEMORY]; the difference-array checkpoint above
    // restored the margin and the serial pins then pass the same probe.
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    val before = Await.result(beforeF, Duration.Inf)
    val emb1 = emb1u.localCheckpoint()
    val rel1 = rel1u.localCheckpoint()
    val after = pairScores(pairs, emb1, rel1)
      .select(col("pred"), marginLoss.as("l"))
      .groupBy("pred").agg(round(avg(col("l")), 6).as("loss"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    import spark.implicits._
    before.toSeq
      .map { case (p, n, na, lb) => (p, n, na, lb, after(p)) }
      .toDF("pred", "n_pairs", "n_active", "loss_before", "loss_after")
  }

  /** The TRAINING LOOP: `epochs` full-batch degree-normalized steps, loss
    * trajectory out — `(epoch, pred, loss)` for epoch 0..epochs, where
    * epoch e's row is the mean margin loss of the embeddings AFTER e
    * updates (epoch 0 = the hash init). Each epoch's embedding table is
    * pinned (`localCheckpoint` — entity-scale rows) so plan depth stays
    * constant in `epochs` instead of nesting every earlier epoch's gather
    * joins (the Lloyd-loop lineage rule). */
  def transeEpochs(triples: DataFrame, epochs: Int = 2): DataFrame = {
    require(epochs >= 1, s"transeEpochs needs epochs >= 1, got $epochs")
    val spark = triples.sparkSession
    val (_, pairs, emb0, rel0) = setup(triples)
    var emb = emb0.localCheckpoint()
    var rel = rel0.localCheckpoint()
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, Double)]
    for (e <- 0 until epochs) {
      val (emb1, rel1, lossF) = epochUpdate(pairs, emb, rel)
      scala.concurrent.Await.result(lossF,
          scala.concurrent.duration.Duration.Inf)
        .foreach { case (p, _, _, l) => out += ((e, p, l)) }
      emb = emb1.localCheckpoint()
      rel = rel1.localCheckpoint()
    }
    // final-epoch loss: score once more without updating
    pairScores(pairs, emb, rel)
      .select(col("pred"), marginLoss.as("l"))
      .groupBy("pred").agg(round(avg(col("l")), 6).as("loss"))
      .collect().foreach(r => out += ((epochs, r.getString(0), r.getDouble(1))))
    import spark.implicits._
    out.toSeq.toDF("epoch", "pred", "loss")
  }

  /** Link-prediction ranking eval at the deterministic init — or, with
    * `epochs` > 0, after that many [[epochUpdate]] training steps — (the
    * FILTERED protocol over [[Relations.negatives]]' corruptions): each
    * positive is ranked among {itself} ∪ {its surviving negatives} by
    * squared-L2 score (lower is better; a corruption scoring ≤ the
    * positive — ties count against, deterministically — beats it). Per
    * predicate: positive count, mean reciprocal rank, hits@1.
    * Local-candidate ranking is the standard cheap proxy when scoring
    * every positive against the FULL entity table is not warranted for a
    * QA gate; the candidate count per positive varies where corruptions
    * were filtered out, which is the documented filtered-protocol
    * behavior. */
  /** Related-concept retrieval from the TRAINED embeddings — the artifact
    * being USED: after `epochs` [[epochUpdate]] steps, restrict the entity
    * table to CONCEPT entities (the positives' objects — the ontology-scale
    * side; page subjects stay out), compute pairwise squared-L2 distances,
    * and keep each concept's `k` nearest (ties broken by neighbor id).
    *
    * Scale shape: the concept embedding table is ontology-scale (the same
    * bound that lets the dictionary automaton broadcast), so the pair
    * generation is a BROADCAST join of concepts against themselves —
    * vocab²-bounded map-side work, never a corpus shuffle — and the top-k
    * window partitions by concept (vocab-scale groups). Beyond a ~10^6
    * vocabulary the bucketed ANN path ([[Similarity]] LSH/IVF/PQ) takes
    * over; this operator is the exact-retrieval form. The distance is the
    * ascending-dimension `element_at` sum (codegen'd, fixed Dim order),
    * ROUND(6) per the float contract. */
  def conceptNeighbors(triples: DataFrame, epochs: Int = 2,
                       k: Int = 3): DataFrame = {
    require(epochs >= 1, s"conceptNeighbors needs epochs >= 1, got $epochs")
    val (pos, pairs, emb0, rel0) = setup(triples)
    var emb = emb0.localCheckpoint()
    var rel = rel0.localCheckpoint()
    for (_ <- 0 until epochs) {
      val (e1, r1, _) = epochUpdate(pairs, emb, rel, withLoss = false)
      emb = e1.localCheckpoint(); rel = r1.localCheckpoint()
    }
    val cemb = emb.join(pos.select(col("obj").as("ent")).distinct(), "ent")
    val dist = round((1 to Dim).map { j =>
      val d = element_at(col("ea"), j) - element_at(col("eb"), j)
      d * d
    }.reduce(_ + _), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("concept").orderBy(col("dist"), col("neighbor"))
    cemb.select(col("ent").as("concept"), col("emb").as("ea"))
      .join(broadcast(cemb.select(col("ent").as("neighbor"),
        col("emb").as("eb"))), col("concept") =!= col("neighbor"))
      .select(col("concept"), col("neighbor"), dist.as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DistMult ranking eval at the deterministic init (Yang et al., ICLR
    * 2015 — the diagonal-bilinear scorer: `score = Σ_d h_d·r_d·t_d`,
    * HIGHER is better): the multiplicative complement of the additive
    * TransE scorer behind the SAME [[Relations.negatives]] corruptions,
    * hash init, and filtered local-candidate ranking protocol — the scorer
    * is a seam, everything around it is shared shape. A corruption scoring
    * ≥ the positive beats it (ties count against, as in [[transeRank]]).
    * Known model property, documented not hidden: the diagonal form is
    * symmetric in (h, t), so inverse relations are indistinguishable —
    * the reason ComplEx exists; at init this only affects which
    * corruptions tie.
    *
    * Scale shape: identical to the TransE eval — 3 entity equi-joins + a
    * broadcast relation join over the pair stream, both dots computed
    * map-side as fixed-`Dim` ascending `element_at` folds (codegen'd, no
    * higher-order functions), ROUND(6) per the float contract; then the
    * per-positive rank agg and the per-predicate rollup. */
  def distmultRank(triples: DataFrame): DataFrame = {
    val (_, pairs, emb0, rel0) = setup(triples)
    def dot3(a: Column, b: Column, c: Column): Column =
      round((1 to Dim).map(j =>
        element_at(a, j) * element_at(b, j) * element_at(c, j))
        .reduce(_ + _), 6)
    val scored = pairs
      .join(emb0.select(col("ent").as("subj"), col("emb").as("h")), Seq("subj"))
      .join(broadcast(rel0.select(col("pred"), col("emb").as("r"))), Seq("pred"))
      .join(emb0.select(col("ent").as("obj"), col("emb").as("t")), Seq("obj"))
      .join(emb0.select(col("ent").as("neg_obj"), col("emb").as("x")),
        Seq("neg_obj"))
      .withColumn("spos", dot3(col("h"), col("r"), col("t")))
      .withColumn("sneg", dot3(col("h"), col("r"), col("x")))
    scored.groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") >= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }

  /** ComplEx ranking eval at the deterministic init (Trouillon et al.,
    * ICML 2016 — `score = Re(⟨h, r, conj(t)⟩)`, HIGHER is better): the
    * scorer that fixes DistMult's (h, t) symmetry — the imaginary parts
    * make inverse relations distinguishable — completing the standard
    * additive/symmetric-bilinear/complex-bilinear trio behind ONE shared
    * negatives/init/ranking seam. The `Dim`-wide real embedding splits
    * into `Dim/2` complex dimensions (first half = real components,
    * second half = imaginary — the standard packing); per complex dim j:
    *
    * `re(h)·re(r)·re(t) + im(h)·re(r)·im(t) + re(h)·im(r)·im(t)
    *  − im(h)·im(r)·re(t)`
    *
    * Scale shape: byte-identical to the DistMult eval — 3 entity
    * equi-joins + a broadcast relation join over the pair stream, the
    * score a fixed-order codegen'd `element_at` fold, ROUND(6) per the
    * float contract, then the per-positive rank agg and per-predicate
    * rollup. Zero new exchange classes: the seam is the scalar expression
    * only. */
  def complexRank(triples: DataFrame): DataFrame = {
    val (_, pairs, emb0, rel0) = setup(triples)
    val half = Dim / 2
    def cscore(h: Column, r: Column, t: Column): Column =
      round((1 to half).map { j =>
        val (hre, him) = (element_at(h, j), element_at(h, j + half))
        val (rre, rim) = (element_at(r, j), element_at(r, j + half))
        val (tre, tim) = (element_at(t, j), element_at(t, j + half))
        hre * rre * tre + him * rre * tim + hre * rim * tim - him * rim * tre
      }.reduce(_ + _), 6)
    val scored = pairs
      .join(emb0.select(col("ent").as("subj"), col("emb").as("h")), Seq("subj"))
      .join(broadcast(rel0.select(col("pred"), col("emb").as("r"))), Seq("pred"))
      .join(emb0.select(col("ent").as("obj"), col("emb").as("t")), Seq("obj"))
      .join(emb0.select(col("ent").as("neg_obj"), col("emb").as("x")),
        Seq("neg_obj"))
      .withColumn("spos", cscore(col("h"), col("r"), col("t")))
      .withColumn("sneg", cscore(col("h"), col("r"), col("x")))
    scored.groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") >= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }

  /** RotatE ranking eval at the deterministic init (Sun et al., ICLR 2019
    * — relations as ROTATIONS in the complex plane: `score =
    * ‖h ∘ r − t‖²` with |r_j| = 1, LOWER is better): the rotational
    * scorer that models composition/inversion patterns DistMult and
    * ComplEx cannot, completing the additive / symmetric-bilinear /
    * complex-bilinear / rotational quartet behind ONE shared
    * negatives/init/ranking seam.
    *
    * The unit-modulus rotation derives from the j-th relation component
    * u via the RATIONAL Weierstrass (tan-half-angle) parametrization —
    * `cos θ = (1 − u²)/(1 + u²)`, `sin θ = 2u/(1 + u²)` — unit modulus
    * by construction and TRANSCENDENTAL-FREE: pure IEEE ±/×/÷ with a
    * mirrored expression tree, so Spark and DuckDB agree bit-for-bit
    * where cos/sin library calls would only agree to ~1 ulp.
    *
    * Scale shape: byte-identical to the DistMult/ComplEx evals — 3
    * entity equi-joins + a broadcast relation join over the pair stream,
    * a fixed-order codegen'd `element_at` fold, ROUND(6), then the
    * per-positive rank agg (distance form: a corruption at `sneg ≤ spos`
    * beats the positive, as in [[transeRank]]) and per-predicate
    * rollup. */
  def rotateRank(triples: DataFrame): DataFrame = {
    val (_, pairs, emb0, rel0) = setup(triples)
    val half = Dim / 2
    def rscore(h: Column, r: Column, t: Column): Column =
      round((1 to half).map { j =>
        val (hre, him) = (element_at(h, j), element_at(h, j + half))
        val (tre, tim) = (element_at(t, j), element_at(t, j + half))
        val u = element_at(r, j)
        val den = lit(1.0) + u * u
        val c = (lit(1.0) - u * u) / den
        val s = (lit(2.0) * u) / den
        val dre = hre * c - him * s - tre
        val dim = hre * s + him * c - tim
        dre * dre + dim * dim
      }.reduce(_ + _), 6)
    val scored = pairs
      .join(emb0.select(col("ent").as("subj"), col("emb").as("h")), Seq("subj"))
      .join(broadcast(rel0.select(col("pred"), col("emb").as("r"))), Seq("pred"))
      .join(emb0.select(col("ent").as("obj"), col("emb").as("t")), Seq("obj"))
      .join(emb0.select(col("ent").as("neg_obj"), col("emb").as("x")),
        Seq("neg_obj"))
      .withColumn("spos", rscore(col("h"), col("r"), col("t")))
      .withColumn("sneg", rscore(col("h"), col("r"), col("x")))
    scored.groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") <= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }

  /** [[transeRank]] at the init over TYPE-CONSTRAINED corruptions
    * ([[Relations.negativesTyped]] — same scorer, same protocol, harder
    * negatives): comparing its per-pred MRR against `kg_transe_rank`'s
    * untyped reading is the standard "how much of the score is type
    * discrimination" decomposition. */
  def transeRankTyped(triples: DataFrame, objTypes: DataFrame): DataFrame = {
    val pos = triples.select(col("subj"), col("pred"), col("obj"))
      .distinct().localCheckpoint()
    val pairs = Relations.negativesTyped(pos, objTypes, NegK)
      .localCheckpoint()
    val ents = pos.select(col("subj").as("ent"))
      .union(pos.select(col("obj").as("ent"))).distinct()
    val emb = embInit(ents, "ent", "e:")
    val rel = embInit(pos.select(col("pred")).distinct(), "pred", "r:")
    pairScores(pairs, emb, rel)
      .groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") <= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }

  def transeRank(triples: DataFrame, epochs: Int = 0): DataFrame = {
    val (_, pairs, emb0, rel0) = setup(triples)
    var emb = emb0
    var rel = rel0
    if (epochs > 0) {
      emb = emb.localCheckpoint(); rel = rel.localCheckpoint()
      for (_ <- 0 until epochs) {
        val (e1, r1, _) = epochUpdate(pairs, emb, rel, withLoss = false)
        emb = e1.localCheckpoint(); rel = r1.localCheckpoint()
      }
    }
    val ranks = pairScores(pairs, emb, rel)
      .groupBy("subj", "pred", "obj")
      .agg((lit(1L) + sum(when(col("sneg") <= col("spos"), lit(1L))
        .otherwise(lit(0L)))).as("rank"))
    ranks.groupBy("pred")
      .agg(count(lit(1)).as("n_pos"),
        round(avg(lit(1.0) / col("rank")), 6).as("mrr"),
        round(avg(when(col("rank") === 1, lit(1.0)).otherwise(lit(0.0))), 6)
          .as("hits1"))
  }

  /** Ascending-dimension dot product of two Dim-wide embedding arrays —
    * codegen'd `element_at` expansion (fixed small Dim), the additive twin
    * of [[graft.functions.TranseScores]]' fused form. */
  private def dotDim(a: Column, b: Column): Column =
    (1 to Dim).map(j => element_at(a, j) * element_at(b, j))
      .reduce(_ + _)

  /** One full-batch skip-gram negative-sampling step (word2vec SGNS —
    * Mikolov et al. 2013) over a `(center, context)` pair corpus: the
    * trainer DeepWalk/node2vec bolt onto
    * [[graft.graph.KgGraph.randomWalks]]' walk pairs, completing the
    * embedding-family set next to the translational/bilinear KG scorers
    * (TransE/DistMult/ComplEx/RotatE share one triple seam; SGNS is the
    * two-table input/output-matrix form over undirected co-occurrence).
    *
    * Protocol (the [[Relations.negatives]] discipline, context-side
    * corruption): per distinct pair and slot, the corruption index is the
    * portable 60-bit hash of `center|context|slot` into the context
    * vocabulary; self-corruptions and corruptions that are TRUE pairs are
    * dropped, not resampled. Full-batch over the DISTINCT pair set — the
    * deterministic twin of frequency-weighted minibatch sampling (walk
    * multiplicity is already the sampler at real scale; replaying it here
    * would square-count). Input (`w:`-init) and output (`c:`-init)
    * matrices are separate, the word2vec two-matrix form. Loss per
    * (pair, corruption) row is the softplus pair
    * `ln(1+e^{-s_pos}) + ln(1+e^{s_neg})`; gradients are per-parameter
    * MEANS (degree-normalized — the [[epochUpdate]] rule: a power-law-hot
    * page takes the same bounded step as a cold one).
    *
    * Float contract: dots are ROUND(6) before the sigmoid terms (the only
    * cross-engine float-sum exposure), gradient means and per-center
    * losses ROUND(6) — so the oracle's long-format recomputation lands on
    * identical quantities.
    *
    * Scale shape: embedding tables are entity-keyed rows (the
    * PyTorch-BigGraph layout); the gather is three entity-keyed equi-joins;
    * gradient legs are a UNION ALL of keyed contributions into ONE hash
    * agg per table; the update is an entity-keyed left join. Nothing
    * shuffles more than (pairs × NegK × Dim) short rows. The context-vocab
    * dense ids ride [[Relations.negatives]]' window form here (matching
    * the oracle's ROW_NUMBER bit-for-bit); at web scale the id pass swaps
    * to the D6 two-pass range-repartition + zipWithIndex form — the same
    * documented flip as the dictionary build.
    *
    * Returns one row per center that kept ≥1 corruption (the filtered-
    * protocol behavior): `(center, n_pairs, loss_before, loss_after)`. */
  def sgnsStep(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = pairs.select(col("center"), col("context")).distinct()
      .localCheckpoint() // vocab + candidates + anti-join + both inits
    val ents = pos.select(col("context").as("ctx")).distinct()
      .withColumn("eid",
        row_number().over(Window.orderBy("ctx")).cast("long") - 1)
      .localCheckpoint() // counted + joined
    val n = ents.count()
    val neg = pos
      .select(col("center"), col("context"),
        explode(array((0 until NegK).map(lit): _*)).as("slot"))
      .withColumn("eid", pmod(Sketch.hash60(
        concat_ws("|", col("center"), col("context"), col("slot"))), lit(n)))
      .join(broadcast(ents), "eid")
      .withColumnRenamed("ctx", "neg_ctx")
      .filter(col("neg_ctx") =!= col("context"))
      .join(pos.select(col("center"), col("context").as("neg_ctx")),
        Seq("center", "neg_ctx"), "left_anti")
      .select(col("center"), col("context"), col("slot"), col("neg_ctx"))
      .localCheckpoint() // scored before AND after the update
    val w0 = embInit(pos.select(col("center")).distinct(), "center", "w:")
    val c0 = embInit(ents.select(col("ctx")), "ctx", "c:")
    def gather(w: DataFrame, c: DataFrame): DataFrame = neg
      .join(w.select(col("center"), col("emb").as("wv")), Seq("center"))
      .join(c.select(col("ctx").as("context"), col("emb").as("cp")),
        Seq("context"))
      .join(c.select(col("ctx").as("neg_ctx"), col("emb").as("cn")),
        Seq("neg_ctx"))
      .withColumn("sp", round(dotDim(col("wv"), col("cp")), 6))
      .withColumn("sn", round(dotDim(col("wv"), col("cn")), 6))
    def pairLoss: Column =
      log(lit(1.0) + exp(-col("sp"))) + log(lit(1.0) + exp(col("sn")))
    val scored = gather(w0, c0).localCheckpoint() // loss + 4 gradient legs
    val lossB = scored.groupBy("center")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(pairLoss), 6).as("loss_before"))
    // σ terms from the ROUND(6) dots: gp = σ(sp)−1, gn = σ(sn) — written
    // as single divisions so the oracle's expressions are term-identical
    val g = scored
      .withColumn("gp", lit(-1.0) / (lit(1.0) + exp(col("sp"))))
      .withColumn("gn", lit(1.0) / (lit(1.0) + exp(-col("sn"))))
      .select(col("center"), col("context"), col("neg_ctx"),
        explode(sequence(lit(1), lit(Dim))).as("d"),
        col("wv"), col("cp"), col("cn"), col("gp"), col("gn"))
    val wContrib = g.select(col("center").as("id"), col("d"),
        (col("gp") * element_at(col("cp"), col("d"))).as("gc"))
      .unionAll(g.select(col("center").as("id"), col("d"),
        (col("gn") * element_at(col("cn"), col("d"))).as("gc")))
    val cContrib = g.select(col("context").as("id"), col("d"),
        (col("gp") * element_at(col("wv"), col("d"))).as("gc"))
      .unionAll(g.select(col("neg_ctx").as("id"), col("d"),
        (col("gn") * element_at(col("wv"), col("d"))).as("gc")))
    // per-parameter mean gradient pivoted to one row per entity in the
    // same aggregation (avg(when(d = j)) ignores the other dims' NULLs)
    def gradPivot(contrib: DataFrame): DataFrame = {
      val aggs = (1 to Dim).map(j =>
        round(avg(when(col("d") === j, col("gc"))), 6).as(s"g$j"))
      contrib.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    }
    def updated(base: DataFrame, idCol: String, grads: DataFrame): DataFrame =
      base.join(grads, base(idCol) === grads("id"), "left")
        .select(base(idCol), array((1 to Dim).map(j =>
          element_at(col("emb"), j)
            - lit(Lr) * coalesce(col(s"g$j"), lit(0.0))): _*).as("emb"))
    val w1 = updated(w0, "center", gradPivot(wContrib))
    val c1 = updated(c0, "ctx", gradPivot(cContrib))
    val lossA = gather(w1, c1).groupBy("center")
      .agg(round(avg(pairLoss), 6).as("loss_after"))
    lossB.join(lossA, Seq("center"))
  }
}
