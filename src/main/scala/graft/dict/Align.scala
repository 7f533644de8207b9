package graft.dict

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy cross-ontology alignment — the near-match extension of LOOM.
  *
  * LOOM (Ghazvinian, Noy & Musen 2009; `OntologyTables.loomMappings`) maps
  * classes whose D3-normalized labels are EXACTLY equal. Real ontology pairs
  * also align through near-equal labels — reordered tokens ("SORT MERGE" vs
  * "MERGE SORT"), subset labels ("JOIN" vs "HASH JOIN") — so alignment
  * pipelines generate candidates by token-set Jaccard and let curators (or a
  * downstream model) adjudicate. This emits those candidates.
  *
  * Scale shape (the dedup_jaccard discipline applied to the label space):
  * NEVER all-pairs — labels explode to (token, label) postings, pairs form
  * only inside a token's posting list via one equi-self-join, and a hot-token
  * cap (`maxPostings`) bounds any one list (a stopword-ish token on 10^6
  * labels would otherwise contribute deg² candidate pairs — same guard as
  * Dedup's bucket cap). Cross-ontology only (`ont1 < ont2`: one matrix
  * triangle, each unordered pair once). Shared-token counts aggregate on
  * label-pair keys; Jaccard = shared / (n1 + n2 − shared) with token-SET
  * sizes computed inline. Dictionary-scale throughout — the corpus is never
  * touched.
  */
object Align {

  /** labels: distinct (term, class_iri, ont) normalized dictionary rows →
    * (class_iri_1, ont_1, label_1, class_iri_2, ont_2, label_2, shared,
    *  jaccard) for cross-ontology pairs with jaccard ≥ minJaccard. */
  def fuzzyAlign(labels: DataFrame, minJaccard: Double = 0.5,
                 maxPostings: Int = 1000): DataFrame = {
    val lab = labels.select("term", "class_iri", "ont").distinct()
    val toks = lab.select(col("term"), col("class_iri"), col("ont"),
      explode(array_distinct(split(col("term"), " "))).as("tok"))
    // hot-token posting cap — tokens above it are dropped from pairing
    // (both engines apply the same HAVING; candidates they would have
    // produced are the quadratic blowup this op exists to avoid)
    val keep = toks.groupBy("tok").agg(count(lit(1)).as("pc"))
      .filter(col("pc") <= maxPostings).select("tok")
    val capped = toks.join(broadcast(keep), "tok")
    val a = capped.select(col("tok"), col("term").as("label_1"),
      col("class_iri").as("class_iri_1"), col("ont").as("ont_1"))
    val b = capped.select(col("tok"), col("term").as("label_2"),
      col("class_iri").as("class_iri_2"), col("ont").as("ont_2"))
    val nOf = (c: String) => size(array_distinct(split(col(c), " "))).cast("double")
    a.join(b, Seq("tok"))
      .filter(col("ont_1") < col("ont_2"))
      .groupBy("class_iri_1", "ont_1", "label_1",
        "class_iri_2", "ont_2", "label_2")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", round(col("shared").cast("double") /
        (nOf("label_1") + nOf("label_2") - col("shared").cast("double")), 6))
      .filter(col("jaccard") >= minJaccard)
  }
}
