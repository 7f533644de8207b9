package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed quality-classifier DISTILLATION: full-batch logistic
  * regression trained to mimic the rule-based Gopher filter — the
  * CCNet/LLaMA-pipeline practice of replacing a hand-rule gate with a tiny
  * learned scorer (which then generalizes past the rules' hard edges and
  * emits a graded keep-probability instead of a boolean).
  *
  * The model is FEATURE-dimensional (5 weights), so training takes the
  * small-model/large-data shape: per step ONE aggregation over the corpus
  * computes the mean gradient, the metrics, and nothing else (map-side
  * combine; no shuffle wider than 5 doubles per partition), and the updated
  * weights ride back into the next step's plan as LITERALS — the
  * IVF-centroid/Lloyd precedent, so plan depth is constant in steps and
  * the corpus never reaches the driver.
  *
  * Determinism contract: features are exact or pre-rounded (gopherRules
  * rounds its ratios to 4dp); per-step gradients and metrics are ROUND(6)
  * of corpus-wide means (absorbing both summation order and the ≤1-ulp
  * exp/ln differences between the JVM and DuckDB's libm — the PMI/log
  * precedent); weight updates are exact arithmetic on the rounded
  * gradients, so both engines carry bit-identical weights into every step.
  * The p ≥ 0.5 accuracy boundary is hit only at z = 0 (exp(0) = 1 exactly
  * in both engines), which is the deterministic all-zero-weights step 0.
  *
  * Output: `(step, logloss, accuracy)` for step 0..steps — step 0 is the
  * zero-weight baseline (logloss = ln 2), later rows must descend (lr 0.25 over 8 steps descends monotonically on the synthetic corpus; accuracy needs more steps to leave the majority-class baseline — the distillation demo is the loss curve). */
object Classifier {
  val Lr = 0.25
  val Steps = 8
  /** Fixed feature scalings (conditioning only — single source with the
    * oracle): [bias, n_words/100, mean_word_len, symbol_ratio*10,
    * n_stop_hits/10]. */
  val NFeatures = 5

  /** Gopher-feature design matrix `(x0..x4, y)` — ONE pass, pinned: every
    * training step (and the AUC scorer) re-reads it. */
  private def features(docs: DataFrame): DataFrame =
    TextOps.gopherRules(docs).select(
      lit(1.0).as("x0"),
      (col("n_words") / lit(100.0)).as("x1"),
      col("mean_word_len").as("x2"),
      (col("symbol_ratio") * lit(10.0)).as("x3"),
      (col("n_stop_hits") / lit(10.0)).as("x4"),
      when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
      .localCheckpoint()

  /** Trained-model memo: `lrDistill`, `aucReport` and `brierReport` are
    * standalone registry queries over the SAME corpus, so an uncached full
    * registry pass would run the identical GD loop three times. Keyed on
    * (canonicalized input plan, lr, steps) — the canonicalized form embeds
    * LocalRelation data and scan identity, so two semantically different
    * inputs can't collide; values are (steps+1) metric rows + NFeatures
    * doubles, so the map stays trivially small for a session. */
  private val trainMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Double, Int), (Seq[(Int, Double, Double)], Array[Double])]()

  /** The full-batch GD loop over a pinned feature frame: per-step
    * `(step, logloss, accuracy)` rows plus the FINAL weight vector (exact
    * arithmetic on ROUND(6) mean gradients — bit-identical to the oracle's
    * CTE-carried weights). Memoized per (input plan, lr, steps) — see
    * [[trainMemo]]. */
  private def trainCore(f: => DataFrame, lr: Double, steps: Int,
                        memoKey: Option[String] = None)
      : (Seq[(Int, Double, Double)], Array[Double]) = {
    memoKey match {
      case Some(k) =>
        trainMemo.computeIfAbsent((k, lr, steps), _ => trainCoreRun(f, lr, steps))
      case None => trainCoreRun(f, lr, steps)
    }
  }

  /** Memo key for a corpus frame — the canonicalized logical plan
    * (auto-alias-normalized; embeds literal data for local relations). */
  private def docsKey(docs: DataFrame): String =
    docs.queryExecution.logical.canonicalized.toString

  private def trainCoreRun(f: DataFrame, lr: Double, steps: Int)
      : (Seq[(Int, Double, Double)], Array[Double]) = {
    val w = Array.fill(NFeatures)(0.0)
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Double, Double)]
    for (step <- 0 to steps) {
      val z = (0 until NFeatures).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      val withP = f.withColumn("p", lit(1.0) / (lit(1.0) + exp(-z)))
      val row = withP.agg(
        round(avg(-(col("y") * log(col("p"))
          + (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))), 6).as("loss"),
        (round(avg(when((col("p") >= 0.5) === (col("y") === 1.0), lit(1.0))
          .otherwise(lit(0.0))), 6).as("acc") +:
          (0 until NFeatures).map(j =>
            round(avg((col("p") - col("y")) * col(s"x$j")), 6).as(s"g$j"))): _*
      ).head()
      out += ((step, row.getDouble(0), row.getDouble(1)))
      if (step < steps)
        for (j <- 0 until NFeatures) w(j) -= lr * row.getDouble(2 + j)
    }
    (out.toSeq, w)
  }

  def lrDistill(docs: DataFrame, lr: Double = Lr, steps: Int = Steps): DataFrame = {
    require(steps >= 1, s"lrDistill needs steps >= 1, got $steps")
    val spark = docs.sparkSession
    import spark.implicits._
    trainCore(features(docs), lr, steps, Some(docsKey(docs)))
      ._1.toDF("step", "logloss", "accuracy")
  }

  /** Score-bin resolution for [[aucReport]] — 4dp, the binned-AUC estimator
    * contract (single source with the oracle). */
  val AucBinDp = 4

  /** Per-doc `(binned score z, label y)` pairs under the trained weights —
    * [[aucReport]]'s input surface, public for the spec's independent
    * driver-side rank recompute. */
  def scoredBins(docs: DataFrame, lr: Double = Lr, steps: Int = Steps): DataFrame = {
    require(steps >= 1, s"scoredBins needs steps >= 1, got $steps")
    val f = features(docs)
    val w = trainCore(f, lr, steps, Some(docsKey(docs)))._2
    val z = (0 until NFeatures).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    f.select(round(z, AucBinDp).as("z"), col("y").cast("long").as("y"))
  }

  /** Brier score of the distilled classifier — the third leg of the eval
    * triad (loss curve: fit; AUC: ordering; Brier: PROBABILITY quality,
    * what a downstream sampler consuming p as a weight actually needs):
    * `Σ (p − y)² / n` computed over the SAME score bins as [[aucReport]]
    * — per bin `pos·(p−1)² + (cnt−pos)·p²`, so the fold runs over ≤ a
    * few thousand bins at any corpus size, never per-doc. p = σ(z) on
    * the [[AucBinDp]]-rounded z (identical doubles both engines — the
    * lrDistill exp-on-rounded-inputs contract); ONE final division,
    * ROUND(6). */
  def brierReport(docs: DataFrame, lr: Double = Lr, steps: Int = Steps): DataFrame = {
    val bins = scoredBins(docs, lr, steps)
      .groupBy("z")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val p = lit(1.0) / (lit(1.0) + exp(-col("z")))
    bins
      .agg(sum(col("cnt")).as("n"),
        sum(col("pos") * (p - lit(1.0)) * (p - lit(1.0))
          + (col("cnt") - col("pos")) * p * p).as("se"))
      .select(col("n").as("n_docs"),
        round(col("se") / col("n"), 6).as("brier"))
  }

  /** Discrimination audit of the distilled classifier: ROC-AUC of the
    * trained scorer against the Gopher label it mimics, via the
    * Mann–Whitney rank statistic with average-rank tie handling —
    * `AUC = (Σ_pos r̄_i − P(P+1)/2) / (P·N)`. The companion to
    * [[lrDistill]]'s loss curve: loss says the probabilities fit, AUC says
    * the ORDERING separates keep from drop (what a threshold sweep on the
    * gate actually uses).
    *
    * Scale shape (the Spark-mllib BinaryClassificationMetrics design):
    * scores are binned to [[AucBinDp]] before ranking, so the rank pass
    * runs over SCORE BINS, not documents — one (bin → count, positives)
    * hash aggregation over the corpus (map-side combinable), then the
    * cumulative rank window + the final fold over the bin table only. The
    * unbinned form would put a global window over 10^12 rows; the binned
    * form's window sees ≤ a few thousand rows at any corpus size.
    *
    * Determinism contract: z = Σ w_j·x_j is a fixed-order left-associated
    * double chain over bit-identical weights (the lrDistill contract) and
    * exact/pre-rounded features, so both engines bin every doc identically;
    * everything after binning is BIGINT arithmetic until ONE final pinned
    * division, ROUND(6). Ranks use ascending z with average ranks on ties:
    * r̄ = (2·cum_below + cnt + 1)/2, folded as integer `numer2 = Σ
    * pos·(2·cum + cnt + 1)` so no fractional rank ever materializes.
    * Output: one row `(n_pos, n_neg, auc)`. */
  def aucReport(docs: DataFrame, lr: Double = Lr, steps: Int = Steps): DataFrame = {
    val bins = scoredBins(docs, lr, steps)
      .groupBy("z")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy("z").rowsBetween(Long.MinValue, -1)
    bins
      .withColumn("cum", coalesce(sum(col("cnt")).over(win), lit(0L)))
      .agg(sum(col("pos")).as("np"), (sum(col("cnt")) - sum(col("pos"))).as("nn"),
        sum(col("pos") * (lit(2L) * col("cum") + col("cnt") + lit(1L))).as("numer2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        round((col("numer2") - col("np") * (col("np") + lit(1L))) /
          (lit(2.0) * col("np") * col("nn")), 6).as("auc"))
  }
}
