package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knowledge-fusion operators for KG construction: combining the SAME fact
  * extracted by INDEPENDENT extractors into one calibrated confidence — the
  * Knowledge Vault shape (Dong et al., KDD 2014): each extractor `e`
  * carries a precision prior `p_e`, and a fact seen by extractor set `E`
  * scores `1 − Π_{e∈E} (1 − p_e)` (noisy-OR under independent extractor
  * errors). The reference pipeline emits each annotation from exactly one
  * recognizer; at web scale the SAME (page, concept) fact arrives through
  * several independent channels (page text, lemmatized text, incoming
  * anchor text), and fusing them is what turns raw extractions into a
  * ranked, thresholdable KG.
  */
object Relations {

  /** Extractor precision priors for the web-KG fusion query: page-content
    * dictionary annotation (high precision — exact surface match),
    * lemmatized annotation (recovers inflections, slightly noisier), and
    * incoming anchor-text entity linking (what OTHER pages call a page —
    * independent but noisiest). SINGLE SOURCE for both the Column code and
    * the oracle-SQL literals. */
  val ExtractorPriors: Seq[(String, Double)] = Seq(
    "direct" -> 0.95, "lemma" -> 0.85, "anchor" -> 0.5)

  /** Fuse extraction events `(subj, obj, extractor)` into per-fact rows
    * `(subj, obj, n_extractors, confidence)` with the noisy-OR above.
    *
    * Scale shape: ONE hash aggregation on the short (subj, obj) fact key
    * (map-side partials — an extractor emitting a fact a million times
    * still ships one flag per map partition), the per-extractor presence
    * folded as max-indicators, and the noisy-OR computed as a FIXED literal
    * expression whose multiplication order follows `priors` — order-pinned,
    * so the oracle's identical expression is IEEE-bit-equal (each factor is
    * one of two exact constants because the flags are 0/1). Events whose
    * extractor has no prior are dropped up front: the prior IS an
    * extractor's license to vote. */
  def tripleConfidence(events: DataFrame,
                       priors: Seq[(String, Double)] = ExtractorPriors): DataFrame = {
    require(priors.nonEmpty, "at least one extractor prior required")
    require(priors.map(_._1).distinct.size == priors.size,
      "extractor names must be unique")
    val flags = priors.map { case (e, _) =>
      max(when(col("extractor") === e, lit(1.0)).otherwise(lit(0.0))).as(s"f_$e")
    }
    val miss = priors
      .map { case (e, p) => lit(1.0) - lit(p) * col(s"f_$e") }
      .reduce(_ * _)
    events
      .filter(col("extractor").isin(priors.map(_._1): _*))
      .groupBy(col("subj"), col("obj"))
      .agg(flags.head, flags.tail: _*)
      .select(col("subj"), col("obj"),
        priors.map(e => col(s"f_${e._1}")).reduce(_ + _).cast("int")
          .as("n_extractors"),
        round(lit(1.0) - miss, 6).as("confidence"))
  }
}
