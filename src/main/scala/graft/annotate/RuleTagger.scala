package graft.annotate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The second recognizer behind the [[graft.Annotator.Recognizer]] seam —
  * the analogue of the reference Annotator+'s `recognizer=mallet` slot: a
  * NON-DICTIONARY token classifier producing the same per-occurrence match
  * stream `(url, from, to, text, class_iri, ont, match_type)` the dictionary
  * scan emits, so everything downstream (filters, scoring, expansion, triple
  * assembly) composes unchanged.
  *
  * Where the reference ships a trained ML tagger (MALLET CRF), this sandbox
  * has no model artifacts — so the slot is filled with a DETERMINISTIC
  * suffix/shape rule classifier (the classic lexical-guesser feature set of
  * Brill-style taggers: token shape + longest matching suffix). That keeps
  * the contract honest: a real CRF drops into [[graft.Annotator.Recognizer]]
  * with zero changes elsewhere, and the rule version is fully
  * DuckDB-recomputable (the `ann_tagger` oracle), which a learned model
  * would not be.
  *
  * Scale shape: tokenization + cumulative-length offsets need one window
  * keyed by `url` (high-cardinality, no hot key) — ONE shuffle; the
  * classification itself is a pure column CASE chain. Tag classes are emitted
  * under `ont = TAGGER` so the standard request-option ontology whitelist
  * selects or excludes them like any ontology.
  */
object RuleTagger {

  val Ont = "TAGGER"
  val MatchType = "RULE"
  val IriPrefix = "http://graft.tag/"
  val MinTokenLen = 3

  /** Suffix → class rules, PRIORITY ORDER (first match wins; longer/more
    * specific suffixes first). Single source of truth for the Scala when
    * chain AND the DuckDB oracle CASE ([[ruleCaseSql]]). */
  val SuffixRules: Seq[(String, String)] = Seq(
    "ING" -> "Gerund",
    "ER" -> "AgentNoun",
    "OW" -> "ModifierNoun",
    "RY" -> "AbstractNoun",
    "TA" -> "MassNoun")

  /** Classification of one UPPERCASED token, scalar form (spec oracle). */
  def classify(tokUpper: String): Option[String] =
    if (tokUpper.length < MinTokenLen) None
    else if (tokUpper.forall(c => c >= '0' && c <= '9')) Some("Number")
    else SuffixRules.collectFirst { case (suf, cls) if tokUpper.endsWith(suf) => cls }

  /** The same classification as a column expression over an UPPER token. */
  private def classifyCol(u: Column): Column = {
    val chain = SuffixRules.foldLeft(
      when(u.rlike("^[0-9]+$"), lit("Number"))) { case (acc, (suf, cls)) =>
      acc.when(u.endsWith(suf), lit(cls))
    }
    chain.otherwise(lit(null).cast("string"))
  }

  /** DuckDB CASE twin of [[classifyCol]] (same rule order) over `$tok`. */
  def ruleCaseSql(tok: String): String = {
    val suffixes = SuffixRules.map { case (suf, cls) =>
      // the suffix is interpolated RAW into a SQL LIKE pattern: a future
      // rule containing %, _ or a quote would silently change the oracle's
      // semantics (classifyCol's endsWith is literal) — fail loudly instead
      require(suf.matches("^[A-Z]+$"),
        s"suffix rule '$suf' must be ^[A-Z]+$$ (LIKE/quote metacharacters " +
          "would diverge from the literal endsWith in classifyCol)")
      require(cls.matches("^[A-Za-z]+$"),
        s"rule class '$cls' must be alphabetic (interpolated into SQL)")
      s"WHEN upper($tok) LIKE '%$suf' THEN '$cls'"
    }.mkString("\n           ")
    s"""CASE WHEN regexp_matches($tok, '^[0-9]+$$') THEN 'Number'
           $suffixes
           ELSE NULL END"""
  }

  /** Extracted corpus → tagger match stream. Offsets are 1-based inclusive
    * char positions in the original text, recovered from cumulative
    * separator+token lengths (the same machinery the lemma scan and its
    * oracle use). */
  def tag(extracted: DataFrame): DataFrame = {
    val parts = extracted
      .select(col("url"),
        regexp_extract_all(col("text"), lit("[A-Za-z0-9_]+"), lit(0)).as("toks"),
        split(col("text"), "[A-Za-z0-9_]+").as("seps"))
      .withColumn("seps0", slice(col("seps"), lit(1), size(col("toks"))))
      .select(col("url"),
        posexplode(arrays_zip(col("toks"), col("seps0"))).as(Seq("i", "z")))
      .select(col("url"), col("i"),
        col("z.toks").as("tok"), col("z.seps0").as("sep"))
    val w = Window.partitionBy(col("url")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("to", sum(length(col("sep")) + length(col("tok"))).over(w).cast("int"))
      .withColumn("from", (col("to") - length(col("tok")) + 1).cast("int"))
      .withColumn("cls", classifyCol(upper(col("tok"))))
      .filter(col("cls").isNotNull && length(col("tok")) >= MinTokenLen)
      .select(col("url"), col("from"), col("to"), col("tok").as("text"),
        concat(lit(IriPrefix), col("cls")).as("class_iri"),
        lit(Ont).as("ont"), lit(MatchType).as("match_type"))
  }
}
