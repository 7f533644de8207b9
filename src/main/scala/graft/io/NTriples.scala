package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** D1 interop: the reference's ontologies live in an RDF triplestore and
  * arrive as RDF submissions, so the natural at-rest interchange format for
  * the dictionary-build input is N-Triples (one statement per line — the ONE
  * RDF serialization that is line-splittable, which is why it is the right
  * one at 100 TB: `spark.read.text` splits on line boundaries, every
  * partition parses independently, and the only shuffle in the whole
  * concept-table build is the final per-subject aggregation).
  *
  * Vocabulary: SKOS for labels, RDFS for the is-a hierarchy, and BioPortal's
  * public UMLS predicates for semantic types / CUIs — the same properties the
  * reference's annotation pipeline reads from its triplestore.
  *
  * The line parser is scalar Scala shared verbatim between the Dataset path
  * and the specs (same single-source-of-truth pattern as the automaton's
  * scalar oracle); a typed `flatMap` is the justified non-builtin exception
  * here because N-Triples literal unescaping (`\"`, `\\`, `\uXXXX`) is not
  * expressible as a builtin-function chain.
  */
object NTriples {

  // ---- public vocabulary -------------------------------------------------
  val PrefLabel = "http://www.w3.org/2004/02/skos/core#prefLabel"
  val AltLabel = "http://www.w3.org/2004/02/skos/core#altLabel"
  val SubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  val HasSty = "http://bioportal.bioontology.org/ontologies/umls/hasSTY"
  val Cui = "http://bioportal.bioontology.org/ontologies/umls/cui"
  val StyPrefix = "http://purl.bioontology.org/ontology/STY/"

  /** One parsed statement; `literal` distinguishes `"..."` objects from
    * `<...>` IRIs (language tags / datatypes are accepted and dropped). */
  final case class Stmt(subj: String, pred: String, obj: String, literal: Boolean)

  // ---- scalar line parser (single source of truth) -----------------------

  /** Parse one N-Triples line. Returns None for blank lines, `#` comments,
    * and well-formed statements with a BLANK-NODE subject or object (`_:b0`
    * — ubiquitous in real BioPortal/OWL submissions as axiom reification;
    * they carry no labels of interest, and failing on them would reject
    * legitimate real-world ontology dumps). Throws on malformed statements
    * (corrupt ontology submissions should fail the build loudly, not
    * silently drop terms). */
  def parseLine(raw: String): Option[Stmt] = parseN(raw, allowGraph = false).map(_._1)

  /** One parsed N-Quads statement: [[Stmt]] + the named graph (None = the
    * default graph — a plain triple line is legal N-Quads). */
  final case class Quad(subj: String, pred: String, obj: String,
                        literal: Boolean, graph: Option[String])

  /** Parse one N-Quads line (same grammar as [[parseLine]] plus an optional
    * `<graph>` IRI between the object and the terminating dot). */
  def parseQuadLine(raw: String): Option[Quad] =
    parseN(raw, allowGraph = true).map { case (s, g) =>
      Quad(s.subj, s.pred, s.obj, s.literal, g)
    }

  /** The ONE scanner behind [[parseLine]] and [[parseQuadLine]] — a fourth
    * term is a syntax error in triples mode and the graph label in quads
    * mode; everything else (IRIs, literals with escapes/langtag/datatype,
    * blank-node skip semantics, strict trailing-content check) is shared. */
  private def parseN(raw: String, allowGraph: Boolean): Option[(Stmt, Option[String])] = {
    val line = raw.trim
    if (line.isEmpty || line.startsWith("#")) return None
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"bad N-Triples line ($msg): $raw")
    def ws(): Unit = { while (i < line.length && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1 }
    def iri(): String = {
      if (i >= line.length || line.charAt(i) != '<') fail("expected <IRI>")
      val end = line.indexOf('>', i + 1)
      if (end < 0) fail("unterminated IRI")
      val s = line.substring(i + 1, end); i = end + 1; s
    }
    // BLANKNODE ::= '_:' label — accepted (syntax still validated so corrupt
    // lines fail loudly) but the statement is SKIPPED by the caller
    def bnode(): String = {
      i += 2 // past "_:"
      val start = i
      while (i < line.length && {
        val c = line.charAt(i)
        Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'
      }) i += 1
      if (i == start) fail("empty blank-node label")
      // label grammar forbids a trailing '.': that dot is the terminator
      if (line.charAt(i - 1) == '.') i -= 1
      "_:" + line.substring(start, i)
    }
    def isBnodeAt(): Boolean =
      i + 1 < line.length && line.charAt(i) == '_' && line.charAt(i + 1) == ':'
    var hasBnode = false
    val subj =
      if (isBnodeAt()) { hasBnode = true; bnode() } else iri()
    ws()
    val pred = iri(); ws()
    if (i >= line.length) fail("missing object")
    val (obj, literal) =
      if (line.charAt(i) == '<') (iri(), false)
      else if (isBnodeAt()) { hasBnode = true; (bnode(), false) }
      else if (line.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed) {
          if (i >= line.length) fail("unterminated literal")
          line.charAt(i) match {
            case '"' => closed = true; i += 1
            case '\\' =>
              if (i + 1 >= line.length) fail("dangling escape")
              line.charAt(i + 1) match {
                case '"' => sb += '"'; i += 2
                case '\\' => sb += '\\'; i += 2
                case 'n' => sb += '\n'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'u' =>
                  if (i + 6 > line.length) fail("short \\u escape")
                  sb += Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar; i += 6
                case 'U' =>
                  if (i + 10 > line.length) fail("short \\U escape")
                  sb ++= Character.toChars(Integer.parseInt(line.substring(i + 2, i + 10), 16)); i += 10
                case c => fail(s"unknown escape \\$c")
              }
            case c => sb += c; i += 1
          }
        }
        // optional language tag or datatype — accepted, dropped. LANGTAG
        // grammar is [a-zA-Z0-9-]+ only: stopping at the first other char
        // (NOT at whitespace) keeps `"x"@en.` — dot immediately after the
        // tag, valid N-Triples — parseable
        if (i < line.length && line.charAt(i) == '@') {
          i += 1
          while (i < line.length && {
            val c = line.charAt(i)
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9') || c == '-'
          }) i += 1
        } else if (i + 1 < line.length && line.charAt(i) == '^' && line.charAt(i + 1) == '^') {
          i += 2; iri()
        }
        (sb.toString, true)
      } else fail("object must be <IRI> or \"literal\"")
    ws()
    val graph =
      if (allowGraph && i < line.length && line.charAt(i) == '<') {
        val g = iri(); ws(); Some(g)
      } else None
    if (i >= line.length || line.charAt(i) != '.') fail("missing terminating dot")
    i += 1; ws()
    // anything but a comment after the dot means a second statement got
    // glued onto this line (lost newline) — dropping it silently would be
    // exactly the "silently missing annotation" strict mode exists to stop
    if (i < line.length && line.charAt(i) != '#') fail("content after terminating dot")
    if (hasBnode) None // reification plumbing, no labels of interest — skip
    else Some((Stmt(subj, pred, obj, literal), graph))
  }

  /** Escape a literal for serialization (inverse of the parser's unescape;
    * UTF-8 is legal in N-Triples 1.1, so non-ASCII passes through). */
  def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '"' => sb ++= "\\\""
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c => sb += c
    }
    sb.toString
  }

  // ---- Dataset source ----------------------------------------------------

  /** Parse a Dataset of raw lines into (subj, pred, obj, is_literal).
    * STRICT: any malformed statement fails the job (the right default for
    * dictionary builds — a silently dropped label is a silently missing
    * annotation). */
  def statements(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine).toDF("subj", "pred", "obj", "is_literal")
  }

  /** Parse N-Quads lines → (subj, pred, obj, is_literal, graph); `graph` is
    * NULL for default-graph statements. STRICT, like [[statements]] — a
    * provenance dump with corrupt lines should fail the reload loudly. */
  def quadStatements(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseQuadLine(_).map(q =>
      (q.subj, q.pred, q.obj, q.literal, q.graph)))
      .toDF("subj", "pred", "obj", "is_literal", "graph")
  }

  /** PERMISSIVE parse for web-scale ingests where one corrupt line must not
    * kill the job: good statements carry `bad_line = NULL`, malformed lines
    * survive as `(NULL, NULL, NULL, NULL, <raw line>)` rows — the
    * badRecordsPath pattern, side channel and data in ONE pass with no
    * second read. Callers split with `filter(col("bad_line").isNull)` /
    * `.isNotNull` and are expected to COUNT the bad side into their ingest
    * metrics (silent truncation reads as "covered everything"). */
  def statementsPermissive(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap { l =>
      try parseLine(l).map(s =>
        (s.subj, s.pred, s.obj, Some(s.literal), Option.empty[String]))
      catch {
        case _: IllegalArgumentException =>
          Some((null: String, null: String, null: String,
            Option.empty[Boolean], Some(l)))
      }
    }.toDF("subj", "pred", "obj", "is_literal", "bad_line")
  }

  /** Read an N-Triples file/directory — line-splittable, parallel parse. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    statements(spark.read.textFile(path))
  }

  /** Concept table (D1 shape, = [[graft.fixture.OntologyFixture.conceptsDf]]
    * schema) from parsed statements. One aggregation — the lone shuffle —
    * keyed by subject; synonym/TUI sets sort-canonicalized. `ont` is the
    * submission acronym (one ontology per file, as in the reference's
    * per-ontology submissions; union across files for multi-ontology dicts).
    */
  def concepts(stmts: DataFrame, ont: String): DataFrame =
    stmts
      .groupBy(col("subj").as("class_iri"))
      .agg(
        min(when(col("pred") === PrefLabel && col("is_literal"), col("obj")))
          .as("pref_label"),
        sort_array(collect_set(
          when(col("pred") === AltLabel && col("is_literal"), col("obj"))))
          .as("synonyms"),
        sort_array(collect_set(when(col("pred") === HasSty && !col("is_literal"),
          regexp_extract(col("obj"), "[^/]+$", 0)))).as("tuis"),
        min(when(col("pred") === Cui && col("is_literal"), col("obj"))).as("cui"))
      .filter(col("pref_label").isNotNull) // subjects without a prefLabel are not concepts
      .select(col("class_iri"), lit(ont).as("ont"), col("pref_label"),
        col("synonyms"), col("tuis"), col("cui"))

  /** Hierarchy edges (H1 shape) from rdfs:subClassOf IRI statements. */
  def edges(stmts: DataFrame): DataFrame =
    stmts.filter(col("pred") === SubClassOf && !col("is_literal"))
      .select(col("subj").as("child_iri"), col("obj").as("parent_iri"))
      .distinct()

  // ---- Dataset sink ------------------------------------------------------

  private def esc(c: org.apache.spark.sql.Column) = {
    val backslash = replace(c, lit("\\"), lit("\\\\"))
    val quote = replace(backslash, lit("\""), lit("\\\""))
    val nl = replace(quote, lit("\n"), lit("\\n"))
    val cr = replace(nl, lit("\r"), lit("\\r"))
    replace(cr, lit("\t"), lit("\\t"))
  }

  /** Serialize concept + edge tables to N-Triples lines (column `line`) —
    * distributed, write with `.write.text(path)`. Inverse of
    * [[concepts]]/[[edges]] up to synonym/TUI ordering. */
  def lines(conceptsDf: DataFrame, edgesDf: DataFrame): DataFrame = {
    def literalStmt(p: String, o: org.apache.spark.sql.Column) =
      concat(lit("<"), col("class_iri"), lit(s"> <$p> \""), esc(o), lit("\" ."))
    val pref = conceptsDf.select(literalStmt(PrefLabel, col("pref_label")).as("line"))
    val syn = conceptsDf
      .select(col("class_iri"), explode(col("synonyms")).as("s"))
      .select(literalStmt(AltLabel, col("s")).as("line"))
    val sty = conceptsDf
      .select(col("class_iri"), explode(col("tuis")).as("t"))
      .select(concat(lit("<"), col("class_iri"), lit(s"> <$HasSty> <$StyPrefix"),
        col("t"), lit("> .")).as("line"))
    val cui = conceptsDf.filter(col("cui").isNotNull)
      .select(literalStmt(Cui, col("cui")).as("line"))
    val sub = edgesDf.select(concat(lit("<"), col("child_iri"),
      lit(s"> <$SubClassOf> <"), col("parent_iri"), lit("> .")).as("line"))
    pref.unionAll(syn).unionAll(sty).unionAll(cui).unionAll(sub)
  }

  /** Serialize an all-IRI quad table `(subj, pred, obj, graph)` to N-Quads
    * lines (column `line`) — the named-graph provenance dump of the triple
    * sink. Distributed concat (codegen), write with `.write.text(path)`;
    * inverse of [[quadStatements]] for IRI-object statements. */
  def quadLines(quads: DataFrame): DataFrame =
    quads.select(concat(lit("<"), col("subj"), lit("> <"), col("pred"),
      lit("> <"), col("obj"), lit("> <"), col("graph"), lit("> .")).as("line"))

  /** Write per-ontology submission directories under `root` — one subdir per
    * acronym, edge statements riding with the FIRST submission (they are
    * ont-agnostic). The single source of truth for the layout
    * `graft.OntologyTables.fromNTriples` reads; returns the acronyms. */
  def writeSubmissions(conceptsDf: DataFrame, edgesDf: DataFrame,
                       root: String): Seq[String] = {
    val spark = conceptsDf.sparkSession
    import spark.implicits._
    val onts = conceptsDf.select("ont").distinct().as[String].collect().sorted.toSeq
    onts.zipWithIndex.foreach { case (o, idx) =>
      lines(conceptsDf.filter(col("ont") === o),
          if (idx == 0) edgesDf else edgesDf.limit(0))
        .coalesce(1).write.mode("overwrite").text(s"$root/$o")
    }
    onts
  }
}
