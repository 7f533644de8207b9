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

  def lrDistill(docs: DataFrame, lr: Double = Lr, steps: Int = Steps): DataFrame = {
    require(steps >= 1, s"lrDistill needs steps >= 1, got $steps")
    val spark = docs.sparkSession
    val f = TextOps.gopherRules(docs).select(
      lit(1.0).as("x0"),
      (col("n_words") / lit(100.0)).as("x1"),
      col("mean_word_len").as("x2"),
      (col("symbol_ratio") * lit(10.0)).as("x3"),
      (col("n_stop_hits") / lit(10.0)).as("x4"),
      when(col("keep"), lit(1.0)).otherwise(lit(0.0)).as("y"))
      .localCheckpoint() // one feature pass; every step re-reads it
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
    import spark.implicits._
    out.toSeq.toDF("step", "logloss", "accuracy")
  }
}
