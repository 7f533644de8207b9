package graft.emit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{MatchType, Pred, Score}

/** A12–A13 — triple assembly + partitioned sink (SURVEY.md §2.3 schema).
  * The P/R gate compares distinct (subj, pred, obj); match_type/distance/
  * score/from/to are provenance. Set semantics per leg are established by
  * aggregation (min distance / min match_type), so the final union needs no
  * cross-leg dedupe: the three legs carry distinct preds.
  */
object Triples {

  /** Direct leg from A6-grouped scores: (url, classIri, score, match_type). */
  def directLeg(directScores: DataFrame): DataFrame =
    directScores.select(
      col("url").as("subj"), lit(Pred.Direct).as("pred"), col("classIri").as("obj"),
      col("match_type"), lit(0).as("distance"), col("score"))

  /** Hierarchy leg from A7 output (url, ancestor, distance). */
  def hierLeg(hier: DataFrame): DataFrame =
    hier.select(
      col("url").as("subj"), lit(Pred.Expanded).as("pred"), col("ancestor").as("obj"),
      lit(MatchType.Hier).as("match_type"), col("distance"),
      (lit(7.0) / greatest(col("distance"), lit(1))).as("score"))

  /** Mapping leg from A8 output (url, mapped_iri, kind). */
  def mapLeg(mapped: DataFrame): DataFrame =
    mapped.select(col("url").as("subj"), lit(Pred.Mapped).as("pred"),
      col("mapped_iri").as("obj")).distinct()
      .select(col("subj"), col("pred"), col("obj"),
        lit(MatchType.Map).as("match_type"), lit(1).as("distance"),
        lit(Score.MapWeight).as("score"))

  /** UNION ALL of the legs + lineage columns. Each leg is already a set. */
  def assemble(direct: DataFrame, hier: DataFrame, mapped: DataFrame,
               dictVersion: String): DataFrame =
    directLeg(direct)
      .unionByName(hierLeg(hier))
      .unionByName(mapLeg(mapped))
      .withColumn("dict_version", lit(dictVersion))

  /** A13: attach part_date from the corpus and write partitioned by
    * (part_date, dict_version) — partition-pruning keys at read time.
    * Iceberg note: on a cluster this routes through TableIO's Iceberg impl
    * (SURVEY.md §7.6); locally it is a partitioned Parquet dir. */
  def withPartDate(triples: DataFrame, corpusDates: DataFrame): DataFrame =
    triples.join(
      corpusDates.select(col("url").as("subj"), to_date(col("warc_ts")).as("part_date")),
      Seq("subj"), "left")

  def write(triplesWithDate: DataFrame, outDir: String): Unit =
    triplesWithDate.write.mode("overwrite")
      .partitionBy("part_date", "dict_version")
      .parquet(outDir)
}
