package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Restricted Turtle source/sink for KG releases — the prefix-compressed
  * serialization next to N-Triples/N-Quads (a triple dump in Turtle with
  * predicate lists (`;`) and object lists (`,`) is typically 2-4× smaller
  * than N-Triples at web scale, and it is the format ontology tooling
  * ships).
  *
  * PROFILE (documented restrictions, all checked loudly):
  *  - one SUBJECT GROUP per line (`s p1 o1, o2 ; p2 o3 .`) — full Turtle
  *    allows arbitrary whitespace, but one-group-per-line keeps the files
  *    LINE-SPLITTABLE, so a 10-TB dump reads with per-split parallelism
  *    like the N-Triples path (the whole reason this profile exists);
  *  - IRIs only (no literals/blank nodes — the triple-store emits IRIs);
  *  - a FIXED prefix table ([[Prefixes]]) shared by writer and reader;
  *    `@prefix` header lines are emitted once per written file, validated
  *    against the table on read, and any IRI outside the table serializes
  *    as `<...>` (handled on read too).
  *
  * Scale shape: serialization is two keyed aggregations (objects per
  * (subj, pred), then groups per subj — sorted for determinism) + a
  * map-only prefix projection; parsing is split → explode → explode, all
  * codegen'd built-ins, as wide as the text scan.
  */
object Turtle {

  /** prefix → namespace. SINGLE SOURCE for writer, reader, and the oracle's
    * expansion CASE. Namespaces are disjoint, so application order is
    * immaterial. */
  val Prefixes: Seq[(String, String)] = Seq(
    "p" -> "http://graft.kg/p#",
    "o1" -> "http://fix.onto/ONT1#",
    "o2" -> "http://fix.onto/ONT2#",
    "d" -> "doc://")

  /** Full IRI → prefixed name (or `<iri>` if no prefix applies). */
  private def compact(c: Column): Column =
    Prefixes.foldRight(concat(lit("<"), c, lit(">")): Column) {
      case ((pfx, ns), els) =>
        when(c.startsWith(ns), concat(lit(pfx + ":"), expr_substr(c, ns))).otherwise(els)
    }

  private def expr_substr(c: Column, ns: String): Column =
    c.substr(lit(ns.length + 1), length(c) - ns.length)

  /** Prefixed name (or `<iri>`) → full IRI — the reader's inverse. */
  private def expand(c: Column): Column =
    Prefixes.foldRight(
      regexp_replace(c, "^<(.*)>$", "$1"): Column) {
      case ((pfx, ns), els) =>
        when(c.startsWith(pfx + ":"),
          concat(lit(ns), c.substr(lit(pfx.length + 2),
            length(c) - (pfx.length + 1)))).otherwise(els)
    }

  private def headerLines: Seq[String] =
    Prefixes.map { case (pfx, ns) => s"@prefix $pfx: <$ns> ." }

  /** Serialize `(subj, pred, obj)` full-IRI triples to one-group-per-line
    * Turtle body lines (no header — [[write]] adds it per file). */
  def lines(triples: DataFrame): DataFrame = {
    val po = triples
      .select(compact(col("subj")).as("s"), compact(col("pred")).as("p"),
        compact(col("obj")).as("o"))
      .groupBy("s", "p")
      .agg(array_join(sort_array(collect_set(col("o"))), ", ").as("objs"))
    po.groupBy("s")
      .agg(array_join(sort_array(collect_list(
        concat(col("p"), lit(" "), col("objs")))), " ; ").as("body"))
      .select(concat(col("s"), lit(" "), col("body"), lit(" .")).as("line"))
  }

  /** Write a Turtle dump: body lines partition-parallel, plus the @prefix
    * header prepended to EACH partition (every file independently valid
    * Turtle — the multi-file convention the WARC sink follows too). */
  def write(triples: DataFrame, path: String): Unit = {
    val hdr = headerLines
    val spark = triples.sparkSession
    import spark.implicits._
    lines(triples).as[String]
      .mapPartitions(it => hdr.iterator ++ it)
      .write.mode("overwrite").text(path)
  }

  /** Parse a Turtle dump written by [[write]] back to full-IRI
    * `(subj, pred, obj)`. STRICT on the profile: every `@prefix` line must
    * match [[Prefixes]] exactly (a dump written under a different table
    * must fail loudly, not silently mis-expand), and every body line must
    * end with ` .`. */
  def statements(linesDs: Dataset[String]): DataFrame = {
    val spark = linesDs.sparkSession
    // header audit: tiny by construction (prefix-table × files rows)
    val declared = linesDs.filter(_.startsWith("@prefix")).distinct().collect()
    val expected = headerLines.toSet
    val bad = declared.filterNot(expected.contains)
    require(bad.isEmpty,
      s"Turtle dump declares prefixes outside the fixed table: ${bad.mkString("; ")}")
    val body = linesDs.toDF("line").filter(!col("line").startsWith("@prefix"))
    val checked = body.select(col("line"),
      when(col("line").endsWith(" ."), col("line"))
        .otherwise(raise_error(concat(lit("malformed Turtle line: "), col("line"))))
        .as("ok"))
      .select(regexp_replace(col("ok"), " \\.$", "").as("stmt"))
    checked
      .select(split(col("stmt"), " ", 2).getItem(0).as("s"),
        split(col("stmt"), " ", 2).getItem(1).as("rest"))
      .select(col("s"), explode(split(col("rest"), " ; ")).as("pg"))
      .select(col("s"), split(col("pg"), " ", 2).getItem(0).as("p"),
        explode(split(split(col("pg"), " ", 2).getItem(1), ", ")).as("o"))
      .select(expand(col("s")).as("subj"), expand(col("p")).as("pred"),
        expand(col("o")).as("obj"))
  }
}
