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

  /** The reference's RESPONSE serialization: one JSON document per input
    * text, annotations ordered by score descending (the reference's ordering
    * contract), each annotation carrying its class, ontology, match spans,
    * per-class hierarchy (min distance) and mappings — the nested shape of
    * `NcboAnnotator#annotate`'s JSON output, produced relationally and
    * rendered with `to_json` (codegen'd, no UDF).
    *
    * Input `matches`: per-occurrence rows `(url, from, to, class_iri, ont,
    * match_type)`; `closure`: `(child, ancestor, distance)`;
    * `mappingsTable`: `(class_iri, mapped_iri)`. Output: `(url, response)`
    * where `response` is the JSON string; `.write.json`-able as-is.
    */
  def jsonResponses(matches: DataFrame, closure: DataFrame,
                    mappingsTable: DataFrame, maxLevel: Int): DataFrame = {
    val perClass = matches
      .groupBy(col("url"), col("class_iri"), col("ont"))
      .agg(
        sum(when(col("match_type") === MatchType.Pref, Score.PrefWeight)
          .otherwise(Score.SynWeight)).as("score"),
        sort_array(collect_list(struct(col("from"), col("to"),
          col("match_type")))).as("annotations"))
    val hier = matches.select(col("url"), col("class_iri")).distinct()
      .join(broadcast(closure.filter(col("distance") <= maxLevel)),
        col("class_iri") === col("child"))
      .groupBy(col("url"), col("class_iri"), col("ancestor"))
      .agg(min(col("distance")).as("distance"))
      .groupBy(col("url"), col("class_iri"))
      .agg(sort_array(collect_list(struct(col("ancestor"), col("distance"))))
        .as("hierarchy"))
    val mapped = matches.select(col("url"), col("class_iri")).distinct()
      .join(broadcast(mappingsTable.select(col("class_iri").as("m_class"),
        col("mapped_iri"))), col("class_iri") === col("m_class"))
      .groupBy(col("url"), col("class_iri"))
      .agg(sort_array(collect_set(col("mapped_iri"))).as("mappings"))
    perClass
      .join(hier, Seq("url", "class_iri"), "left")
      .join(mapped, Seq("url", "class_iri"), "left")
      // struct sorts lexicographically field-by-field: negated score first
      // = reference's score-descending response ordering, class breaks ties
      .groupBy(col("url"))
      .agg(sort_array(collect_list(struct(
        (-col("score")).as("neg_score"),
        col("class_iri").as("annotatedClass"),
        col("ont"),
        col("score"),
        col("annotations"),
        col("hierarchy"), // null (absent class) → field omitted by to_json
        col("mappings")))).as("ranked"))
      .select(col("url"), to_json(struct(col("url").as("text_id"),
        transform(col("ranked"), a => a.dropFields("neg_score"))
          .as("annotations"))).as("response"))
  }
}
