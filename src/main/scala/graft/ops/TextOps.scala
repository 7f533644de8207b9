package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder-prompt first-class extras): token stats, quality scoring,
  * language-ID heuristic, document fingerprinting. All but the fingerprint
  * are pure column expressions (whole-stage codegen, no UDFs) with exact
  * DuckDB oracle equivalents.
  */
object TextOps {

  /** Whitespace tokens (the corpus is single-space separated; a BPE-ish
    * fallback regex splitter is exposed separately). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-word regex tokenizer: word pieces, numbers, punctuation —
    * GPT-2-style coarse pre-tokenization (public pattern). */
  def bpeishTokens(text: Column): Column =
    // Scala regexp: letters+, digits+, or single non-space symbol
    expr(raw"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")

  /** Per-doc token statistics (doc_id, n_tokens, n_distinct_tokens, n_chars). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      length(col("text")).as("n_chars"))

  val stopwords: Seq[String] = Seq("the", "a")

  private def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Deterministic quality score in [0,1]: length component + lexical
    * diversity + (1 - stopword ratio), at 4dp. Formula is the contract;
    * mirrored in the oracle SQL (SparkEntry.qualityExprSql — single source).
    *
    * Rounding is EXACT-RATIONAL HALF-UP done in BIGINT, not float round():
    * the score is numer/denom with denom = 1000·n (n = token count), so it
    * can land EXACTLY on a .xxxx5 boundary (e.g. 0.53275 at n = 16) —
    * where Spark's round() (HALF_UP on the double's shortest decimal repr)
    * and DuckDB's (nearbyint on x·10⁴, which carries the float
    * representation error) legitimately disagree. Three sf0.1 docs hit
    * that boundary in round 5. q4 = (10⁴·numer + denom/2) div denom is
    * boundary-free: both engines do the identical integer arithmetic.
    * The floor-of-double-division below is exact — numerator ≤ ~10⁷·n ≤
    * 10¹² < 2⁵³ and the true quotient is ≥ 1/denom ≥ 10⁻⁸ away from any
    * integer it doesn't equal, far beyond the ~10⁻¹² ulp at 10⁴. */
  /** The integer 4dp quality (q4 ∈ [0, 10000]) as a Column — the single
    * engine-side source; consumers that need quality alongside OTHER
    * per-doc columns should use this in their own projection instead of
    * joining [[qualityScore]] back onto the corpus (a corpus×corpus join
    * at 10^12 docs for a value one map-side expression computes). */
  def quality4(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val d = size(array_distinct(toks)).cast("long")
    val s = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    // quality = 0.4·min(n,100)/100 + 0.3·d/n + 0.3·(n−s)/n
    //         = (4·min(n,100)·n + 300·d + 300·(n−s)) / (1000·n)
    val numer = lit(4L) * least(n, lit(100L)) * n + lit(300L) * d +
      lit(300L) * (n - s)
    floor((lit(10000L) * numer + lit(500L) * n).cast("double") /
      (lit(1000L) * n).cast("double")).cast("long")
  }

  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (quality4(col("text")) / lit(10000.0)).as("quality"))

  /** Language-ID heuristic (n-gram/stopword profile — real corpora would use
    * char-trigram profiles; the deterministic contract here is
    * stopword-density based and mirrored in the oracle SQL): docs whose
    * English-stopword density ≥ 3% → 'en', else 'und'. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langPred(col("text")).as("lang_pred"))

  /** The [[langId]] detector as a Column — ONE source for [[langId]] and
    * [[langConsistency]] (and their oracle SQL twins). */
  def langPred(text: Column): Column = {
    val ratio = stopwordCount(text) / size(tokens(text)).cast("double")
    when(ratio >= 0.03, lit("en")).otherwise(lit("und"))
  }

  /** Declared-vs-detected language audit (the release-QA gate crawl
    * pipelines run before trusting page-DECLARED `lang` attributes —
    * cf. the lang-tag noise findings behind CLD-based re-detection in
    * C4/CCNet-style curation): the (declared, detected) confusion matrix
    * with per-declared-language shares and a literal-disagreement flag.
    *
    * Scale shape: detection is a pure column expression riding the corpus
    * scan (map-only, whole-stage codegen); ONE hash aggregation on the
    * (declared, detected) pair — map-side partials collapse it to
    * |langs|·|preds| rows per task; the share window runs over the
    * already-aggregated confusion matrix (langs² rows, never the corpus). */
  def langConsistency(docs: DataFrame): DataFrame = {
    val conf = docs
      .select(col("lang").as("lang_declared"),
        langPred(col("text")).as("lang_pred"))
      .groupBy("lang_declared", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang_declared")
    conf.select(col("lang_declared"), col("lang_pred"), col("n_docs"),
      round(col("n_docs") / sum(col("n_docs")).over(w), 6).as("share"),
      (col("lang_declared") =!= col("lang_pred")).as("mismatch"))
  }

  /** Gopher-style quality rule filter (Rae et al. 2021, public rule set):
    * word-count band, mean-word-length band, symbol-token ratio cap, and a
    * minimum stopword-hit count — emitted as per-rule stats plus the
    * composite `keep` flag. Pure column expressions (whole-stage codegen, no
    * shuffle — at 100 TB this is a map-only pass). The stopword list is the
    * suite-wide [[stopwords]] (the driver corpus's vocabulary carries only
    * those; Gopher's own 8-word list drops in via the same column). `keep`
    * is computed from the UNROUNDED values in both engines (integer-derived
    * ratios — identical doubles, no boundary risk); the rounded stats are
    * the 4dp display contract. */
  def gopherRules(docs: DataFrame,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minStopHits: Int = 2): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val meanLen =
      aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
        .cast("double") / n
    val symRatio =
      size(filter(toks, t => !t.rlike("[A-Za-z0-9]"))).cast("double") / n
    val stopHits = stopwordCount(col("text"))
    docs.select(
      col("doc_id"),
      n.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symRatio, 4).as("symbol_ratio"),
      stopHits.as("n_stop_hits"),
      (n.between(minWords, maxWords)
        && meanLen.between(minMeanLen, maxMeanLen)
        && symRatio <= maxSymbolRatio
        && stopHits >= minStopHits).as("keep"))
  }

  /** Gopher-style repetition signals: `top_bigram_frac` (fraction of all
    * bigrams taken by the most frequent one) and `dup_token_ratio`
    * (1 − distinct/total tokens). The max bigram frequency is the longest
    * equal-run of the SORTED per-doc bigram array — a sequential
    * `aggregate` fold over a column, so the whole operator is map-only
    * (the oracle recomputes it the declarative way: unnest + GROUP BY +
    * MAX, proving the fold). Docs with <2 tokens have no bigrams → 0.0. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    // Dedup.shingles carries the short-doc guard (empty array, not a
    // descending sequence) at the data definition, not the use site
    val bigrams = Dedup.shingles(col("text"), 2)
    val maxRun = aggregate(
      sort_array(bigrams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val newRun = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), newRun.as("run"),
          greatest(acc.getField("best"), newRun).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(
      col("doc_id"),
      when(n >= 2, round(maxRun.cast("double") / (n - 1), 4))
        .otherwise(lit(0.0)).as("top_bigram_frac"),
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 4)
        .as("dup_token_ratio"))
  }

  /** Token-unigram Shannon entropy per document (nats) — the classic
    * gibberish/boilerplate signal (low entropy = repeated tokens, high =
    * diverse vocabulary; a standard web-corpus quality feature alongside
    * the Gopher rules). H = ln(n) − (Σ_t c_t·ln(c_t))/n over token counts
    * c_t, computed as a sequential fold over the SORTED token array (run
    * lengths = counts) — map-only, no shuffle, same fold pattern as
    * [[repetitionStats]]; the oracle recomputes it the declarative way
    * (unnest + GROUP BY + SUM). 4dp cross-engine contract (the two
    * engines sum the c·ln(c) terms in different orders). */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks).cast("double")
    def closeRun(acc: Column): Column =
      acc.getField("s") +
        when(acc.getField("run") > 0,
          acc.getField("run").cast("double")
            * log(acc.getField("run").cast("double"))).otherwise(lit(0.0))
    val sumClnC = aggregate(
      sort_array(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0.0).as("s")),
      (acc, x) => {
        val same = x === acc.getField("prev")
        struct(x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1)).as("run"),
          when(same, acc.getField("s")).otherwise(closeRun(acc)).as("s"))
      },
      // flush the final run: toks is never empty (split() worst case [""]),
      // so run >= 1 here and ln(1)·1 = 0 keeps single-token docs exact
      acc => closeRun(acc))
    docs.select(col("doc_id"),
      round(log(n) - sumClnC / n, 4).as("token_entropy"))
  }

  /** Corpus-wide collocation extraction (phrase mining): adjacent token
    * bigrams PMI-scored against unigram frequencies — the classic
    * multi-word-expression signal for tokenizer/vocab curation.
    * pmi = ln( (c_xy/N_b) / ((c_x/N_t)·(c_y/N_t)) ) with corpus totals
    * N_t tokens / N_b bigrams; `minCount` floors the bigram count (PMI is
    * noise at low counts). Deterministic; arithmetic order mirrored exactly
    * in the oracle SQL, 6dp contract.
    *
    * Scale shape: bigram emission is a map-side zip_with of two shifted
    * slices (empty on <2-token docs — no descending-sequence hazard), then
    * TWO hash aggregations (bigram, unigram) and two hash joins on short
    * string keys; the totals row is a broadcast. The minCount filter runs
    * BEFORE the unigram joins, shrinking the join input by the long tail. */
  /** Deterministic acronym synthesis for the [[acronyms]] tests/oracle
    * (the Dedup.withQuotes precedent): every 11th doc gains an appended
    * "long form (LF)" clause built from its own first two tokens, so the
    * miner has ground truth the synthetic corpus otherwise lacks. */
  def withAcronyms(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val t1 = element_at(toks, 1)
    val t2 = element_at(toks, 2)
    val ab = concat(upper(substring(t1, 1, 1)), upper(substring(t2, 1, 1)))
    docs.select(col("doc_id"),
      when(col("doc_id") % 11 === 0 && size(toks) >= 2,
        concat(col("text"), lit(" "), t1, lit(" "), t2,
          lit(" ("), ab, lit(")")))
        .otherwise(col("text")).as("text"))
  }

  /** Schwartz–Hearst-style acronym mining (the initial-letter core of the
    * 2003 algorithm): find "(ABBR)" parentheticals (2–5 uppercase letters),
    * take the |ABBR| immediately-preceding tokens as the long-form
    * candidate, accept iff their initials spell the abbreviation. The
    * dictionary-construction feeder the NCBO world calls synonym discovery
    * — mined (abbr, long form) pairs become label rows for the next dict
    * release. Entirely MAP-ONLY until the final (abbr, long_form) count
    * agg: regex scan, token slice, and the initials fold are per-row
    * column expressions in the Java∩RE2-identical regex subset. */
  def acronyms(docs: DataFrame): DataFrame = {
    val ms = regexp_extract_all(col("text"),
      lit("(?:[A-Za-z0-9]+ ){1,5}\\([A-Z]{2,5}\\)"), lit(0))
    val pre = split(regexp_replace(col("m"), " \\([A-Z]{2,5}\\)$", ""), " ")
    docs.select(col("doc_id"), explode(ms).as("m"))
      .select(col("doc_id"),
        regexp_extract(col("m"), "\\(([A-Z]{2,5})\\)", 1).as("abbr"),
        pre.as("pre"))
      .filter(size(col("pre")) >= length(col("abbr")))
      .withColumn("lf", slice(col("pre"),
        size(col("pre")) - length(col("abbr")) + 1, length(col("abbr"))))
      .withColumn("initials", aggregate(col("lf"), lit(""),
        (acc, t) => concat(acc, upper(substring(t, 1, 1)))))
      .filter(col("initials") === col("abbr"))
      .groupBy(col("abbr"), array_join(col("lf"), " ").as("long_form"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
  }

  def collocations(docs: DataFrame, minCount: Int = 5): DataFrame = {
    val toks = tokens(col("text"))
    val bigrams = docs
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
    val bg = bigrams.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val uni = docs.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val totals = docs.agg(
      sum(size(toks)).as("nt"),
      sum(greatest(size(toks) - 1, lit(0))).as("nb"))
    bg.filter(col("n_xy") >= minCount)
      .join(uni.select(col("t").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(totals))
      .select(col("x"), col("y"), col("n_xy"),
        round(log((col("n_xy").cast("double") / col("nb"))
          / ((col("cx").cast("double") / col("nt"))
            * (col("cy").cast("double") / col("nt")))), 6).as("pmi"))
  }

  /** Tokenizer-vocabulary build: the `topN` most frequent whitespace
    * tokens with dense 1-based ids (descending frequency, token-string
    * tie-break — fully deterministic). The global sort+limit reduces the
    * VOCAB (distinct tokens, already one aggregation down from the
    * corpus) and `limit` bounds what reaches the final id window to
    * `topN` rows — the single-partition window runs over topN entries,
    * never the full vocabulary. */
  def vocab(docs: DataFrame, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokens(): the ONE corpus tokenization contract every text op shares
    val counts = docs.select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(topN)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("freq").desc, col("token"))))
  }

  /** Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016 —
    * the standard subword-vocabulary construction): iteratively merge the
    * most frequent adjacent symbol pair across the word-frequency table,
    * starting from characters. Returns the ordered merge list
    * `(round, lhs, rhs, pair_count)` — the artifact a tokenizer ships.
    * Ties break (count desc, lhs asc, rhs asc): fully deterministic, no
    * rng. Variant notes (named decisions): no end-of-word marker (merges
    * act within words), lowercase `[a-z]+` words only (keeps symbols free
    * of the delimiter chars below).
    *
    * Symbol sequences are stored as ONE delimiter-framed string per word —
    * `cat → '|c||a||t|'` (leading/trailing `|`, `||` between symbols) — so
    * applying a merge is a plain left-to-right non-overlapping string
    * `replace('|a||b|' → '|ab|')`, which is EXACTLY BPE's application rule
    * (both engines' replace scans left-to-right past each replacement:
    * `aaaa` + merge(a,a) → `aa,aa`, never the overlapping middle pair).
    * The framing makes boundary matches exact: a trailing `|` means `b`
    * cannot false-match a longer symbol's prefix, and the replacement
    * `'|ab|'` restores the invariant for chained merges.
    *
    * Scale shape: the word-frequency table (not the corpus) drives every
    * round — one explode + hash-agg per round for pair counts (map-side
    * partials over short symbol pairs); the argmax pair is ONE row, so it
    * is collected at the loop's inherently sequential point (a 1-row
    * driver action per round — the same class as the convergence guards
    * every iterative op pays) and applied as replace LITERALS: one job
    * per round instead of four (the former top-checkpoint + isEmpty +
    * broadcast-build + word-table checkpoint). The replace chain is left
    * un-truncated deliberately — `merges` stacked map expressions over
    * the vocab-bounded word table, each round consumed exactly once, so
    * there is no re-execution and no plan-depth hazard. `vocabWords` caps
    * the table for the oracle's sake; at corpus scale pass Int.MaxValue
    * and the rounds are k linear passes over the distinct-word table. */
  def bpeMerges(docs: DataFrame, vocabWords: Int = 50,
                merges: Int = 8): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    require(vocabWords >= 1, s"vocabWords must be >= 1, got $vocabWords")
    val words = docs.select(explode(tokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(vocabWords)
    var w = words.select(
      concat(lit("|"), array_join(split(col("word"), ""), "||"), lit("|"))
        .as("s"),
      col("freq")).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to merges) {
      val syms = w.select(
        split(trim(col("s"), "|"), "\\|\\|").as("l"), col("freq"))
      val pairs = syms
        .select(explode(zip_with(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // the argmax is ONE row: collect it — a 1-row driver action at the
      // loop's inherently sequential point (same class as the former
      // isEmpty guard) — and apply the merge as LITERALS, which deletes
      // three of the four per-round jobs (top checkpoint, isEmpty,
      // broadcast build) plus the per-round word-table checkpoint: the
      // un-truncated replace chain is `merges` map expressions over a
      // vocab-bounded table with one consumer per round, not a lineage
      // hazard
      val topRow = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(topRow.nonEmpty,
        s"BPE round $r: no adjacent pairs left — lower `merges` ($merges)")
      val (a, b, cnt) =
        (topRow(0).getString(0), topRow(0).getString(1), topRow(0).getLong(2))
      out += ((r, a, b, cnt))
      w = w.select(
        call_function("replace", col("s"), lit(s"|$a||$b|"), lit(s"|$a$b|"))
          .as("s"), col("freq"))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    out.toSeq.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** BPE ENCODE — apply a trained merge list ([[bpeMerges]] output) to the
    * corpus: the tokenizer-application stage that pairs with training.
    * Emits one row per subword piece:
    * `(doc_id, word_pos, piece_pos, piece)` — `word_pos` is the 1-based
    * token index in the doc's whitespace token stream (positions of
    * non-encodable tokens are skipped, keeping alignment with the original
    * text), `piece_pos` the 1-based piece index within the word.
    *
    * Scale shape: the merge list is a TOKENIZER-sized artifact (≤ |vocab|
    * rows — 32k–100k in production), so it is collected once and unrolled
    * into a chain of `replace` expressions over the same delimiter-framed
    * word strings training used (`cat → '|c||a||t|'`). Application is
    * therefore MAP-ONLY over the corpus — zero shuffles, whole-stage
    * codegen, and the left-to-right non-overlapping `replace` scan is
    * EXACTLY BPE's application rule, in merge order, same as training
    * (see [[bpeMerges]]). Encoding generalizes past the training vocab:
    * every `[a-z]+` token is encoded, whether or not training saw it. */
  def bpeEncode(docs: DataFrame, merges: DataFrame): DataFrame = {
    // merge order IS the tokenizer: apply strictly by round
    val ms = merges.orderBy(col("round"))
      .select(col("lhs"), col("rhs")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).cast("int").as("word_pos"),
        lower(col("tok")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    val framed =
      concat(lit("|"), array_join(split(col("word"), ""), "||"), lit("|"))
    val encoded = ms.foldLeft(framed) { case (c, (a, b)) =>
      call_function("replace", c, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    toks.select(col("doc_id"), col("word_pos"),
        posexplode(split(trim(encoded, "|"), "\\|\\|")).as(Seq("j", "piece")))
      .select(col("doc_id"), col("word_pos"),
        (col("j") + 1).cast("int").as("piece_pos"), col("piece"))
  }

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS plagiarism-detection algorithm): hash every k-token shingle,
    * slide a window of `w` consecutive hashes, select each window's MINIMUM
    * (RIGHTMOST position on ties — "robust winnowing", which makes the
    * selection stable under edits outside the window), and emit the
    * distinct selected `(pos, hash)` pairs as the document's fingerprint.
    * Guarantee: two documents sharing a run of ≥ w+k−1 tokens share a
    * fingerprint hash — the sub-document match detector that samples ~2/(w+1)
    * of positions instead of keeping every shingle (what makes fingerprint
    * indexes fit at corpus scale).
    *
    * Entirely MAP-ONLY: shingle hashes via the codegen'd `fingerprint64`
    * (registered SQL function — same rolling hash the oracle recomputes in
    * HUGEINT), window argmin as an `aggregate` fold per window inside one
    * `transform` — a doc never leaves its partition; the only exchange is
    * the final distinct on (doc, pos, hash) output rows. Docs with fewer
    * than `w` shingles emit nothing (mirrored in the oracle). */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 2, s"w must be >= 2, got $w")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sel = expr(
      s"""array_distinct(transform(sequence(1, size(h) - ${w - 1}), i ->
            aggregate(sequence(i + 1, i + ${w - 1}),
              named_struct('hv', element_at(h, i), 'p', i),
              (acc, j) -> IF(element_at(h, j) <= acc.hv,
                named_struct('hv', element_at(h, j), 'p', j), acc))))""")
    docs.select(col("doc_id"), Dedup.shingles(col("text"), k).as("g"))
      .withColumn("h", transform(col("g"),
        s => call_function("fingerprint64", s)))
      .filter(size(col("h")) >= w)
      .select(col("doc_id"), explode(sel).as("s"))
      .select(col("doc_id"), col("s.p").as("pos"), col("s.hv").as("hash"))
      .distinct()
  }

  /** PII scrubbing before training — redact email addresses and long digit
    * runs (phone-number shaped) with typed placeholders. Map-only
    * `regexp_replace` chain; the patterns stay inside the POSIX-ish subset
    * Java regex and DuckDB's RE2 interpret identically (character classes,
    * +, {n,} — no lookarounds, no backrefs), which is what makes the
    * DuckDB oracle byte-exact. Redaction BEFORE dedup/sharding so scrubbed
    * duplicates still collapse. */
  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[+]?[0-9][0-9 ()+.-]{6,}[0-9]", "<PHONE>").as("text_redacted"))

  /** Context-window chunking — split each document into fixed-size
    * character windows with overlap (the training-sequence packing
    * pre-step). Chunk starts at 1, 1+stride, … (stride = size − overlap);
    * the final partial window is kept iff non-empty. Pure column
    * expressions: `sequence` generates the starts, `transform + substring`
    * cuts the windows — map-side explode, no UDF, no shuffle. */
  def chunk(docs: DataFrame, size: Int = 200, overlap: Int = 50): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val stride = size - overlap
    val n = length(col("text"))
    // starts run while start <= n - overlap (every chunk past the first
    // contributes >= 1 char beyond its overlap; a doc shorter than `size`
    // gets exactly one chunk). greatest(..., 1): sequence(1, stop)
    // DESCENDS when stop < 1 (the Dedup.shingles guard pattern) — empty
    // docs emit zero chunks via the filter instead
    val starts = sequence(lit(1),
      greatest(n - lit(overlap), lit(1)), lit(stride))
    docs.filter(n > 0)
      .select(col("doc_id"), explode(starts).as("chunk_start"), col("text"))
      .select(col("doc_id"), col("chunk_start"),
        col("text").substr(col("chunk_start"), lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
  }

  /** 64-bit rolling polynomial fingerprint (base 131, natural Long overflow)
    * — deterministic content hash for change-detection/dedup prefiltering.
    * Uses the native codegen'd Catalyst expression
    * [[graft.functions.Fingerprint64]] (whole-stage codegen, no object-mode
    * island); [[fingerprintTyped]] is the mapPartitions formulation kept for
    * cross-checking. Not SQL-oracle-checkable (custom hash) — covered by the
    * scalar parity tests instead. */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id").cast("long").as("doc_id"),
      expr("fingerprint64(text)").as("fingerprint"))
  }

  /** Typed-map formulation of [[fingerprint]] (parity reference). */
  def fingerprintTyped(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, fingerprint64(text)) })
      .toDF("doc_id", "fingerprint")
  }

  def fingerprint64(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 131 + s.charAt(i); i += 1 }
    h
  }

  /** BM25 retrieval scoring (Robertson/Walker; the Lucene-form idf with the
    * +1 so scores stay positive): score(d) = Σ_q idf(q) · tf·(k1+1) /
    * (tf + k1·(1−b+b·len/avglen)). The query term set is a literal (a
    * search is driver input); arithmetic order is pinned so the DuckDB
    * oracle reproduces the doubles bit-for-bit before the 6dp round.
    *
    * Scale shape: explode → filter to the query terms (a tiny IN-list the
    * scan prunes on) → one (doc, term) count aggregation; df and corpus
    * stats are term-count-sized broadcasts; final score is one per-doc
    * aggregation. No windows, nothing corpus²; top-k is a sort-limit the
    * planner runs as TakeOrderedAndProject. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], topK: Int = 20,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("len"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("len")).as("avglen"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df_ = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avglen"))))
          .as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
    scored
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001 —
    * the language-modeling counterpart to [[bm25]]'s probabilistic form):
    * score(d) = Σ_q ln((tf_{q,d} + μ·cf_q/|C|) / (len_d + μ)). Unlike BM25,
    * EVERY query term scores every document — a missing term contributes
    * through the collection prior, so the doc side is docs × |Q| rows from
    * a broadcast |Q|-row literal with LEFT joins for tf/cf (an inner
    * tf-join would silently drop the smoothing mass that defines QL).
    *
    * Float contract: per-(doc, term) ln arguments are reproduced
    * bit-for-bit by the oracle (fixed multiply/divide order), the per-doc
    * sum is ≤|Q| terms, and the score is ROUND(6) before the ordering —
    * the [[bm25]] discipline.
    *
    * Scale shape: one token explode feeding an IN-pruned (doc, term) tf
    * agg; cf and the corpus token total are |Q|-row / 1-row broadcasts;
    * the docs × |Q| expansion is map-side (|Q| is driver input, single
    * digits); one per-doc agg; top-k runs as TakeOrderedAndProject. */
  def qlm(docs: DataFrame, queryTerms: Seq[String], topK: Int = 20,
          mu: Double = 300.0): DataFrame = {
    require(queryTerms.nonEmpty, "qlm needs at least one query term")
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("len"))
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val totals = toks.agg(count(lit(1)).cast("double").as("n_toks"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val cf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("cf"))
    val q = docs.sparkSession.range(1)
      .select(explode(array(queryTerms.map(lit): _*)).as("term"))
    val scored = lens
      .crossJoin(broadcast(q))
      .join(tf, Seq("doc_id", "term"), "left")
      .join(broadcast(cf), Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        log((coalesce(col("tf"), lit(0.0))
          + lit(mu) * coalesce(col("cf"), lit(0.0)) / col("n_toks"))
          / (col("len") + lit(mu))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
    scored
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** RM3-style pseudo-relevance-feedback expansion terms (Lavrenko &
    * Croft 2001 relevance models; the RM3 recipe per Abdul-Jaleel et al.
    * 2004): run [[qlm]] first-pass retrieval, take the top `fbDocs`
    * documents with RANK-based weights `w_d = 1/rank` (the deterministic
    * stand-in for the usual exp(score) posterior — library `exp` is only
    * ~1-ulp reproducible across engines, where 1/rank is exact; a named,
    * flag-worthy decision in the NonWordEdgeBoundary discipline), and
    * score every feedback-doc term by `Σ_d w_d · tf_{t,d}/len_d` (the
    * MLE relevance model). Original query terms are excluded (they
    * re-enter [[rm3]] at weight 1), weights ROUND(6) BEFORE the top-
    * `fbTerms` (weight desc, term asc) selection — the cross-engine
    * ranking contract.
    *
    * Scale shape: the feedback set is ≤ fbDocs rows (driver-bounded, the
    * PPR-seed contract — its rank window runs over that tiny frame, never
    * the corpus); term scoring joins the corpus token stream against the
    * BROADCAST feedback set, one short-key term agg; top-m is
    * TakeOrderedAndProject. The corpus-side scans stay lazy — RM3 is
    * inherently two-pass over the scan, nothing corpus-scale pins. */
  def rm3Weights(docs: DataFrame, queryTerms: Seq[String], fbDocs: Int = 5,
                 fbTerms: Int = 5, mu: Double = 300.0): DataFrame = {
    val first = qlm(docs, queryTerms, topK = fbDocs, mu = mu)
    val fb = broadcast(first.select(col("doc_id"), (lit(1.0) /
      row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .as("wd")).localCheckpoint())
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("len"))
    val ftf = toks.join(fb.select("doc_id"), "doc_id")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    ftf.join(fb, "doc_id").join(lens, "doc_id")
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term")
      .agg(round(sum(col("wd") * col("tf") / col("len")), 6).as("w"))
      .orderBy(col("w").desc, col("term"))
      .limit(fbTerms)
  }

  /** RM3 reranking: second-pass [[qlm]]-style scoring with the expanded
    * weighted query — original terms at weight 1, [[rm3Weights]] expansion
    * terms at `beta · w` (the unnormalized-interpolation form; with
    * rank-based doc weights the relevance model's normalizer is a global
    * constant, so it only rescales `beta`). Per-(doc, term) ln arguments
    * and the `wt · ln(...)` products are bit-for-bit mirrored by the
    * oracle; the per-doc sum spans ≤ |Q| + fbTerms terms, ROUND(6) before
    * the (score desc, doc_id) ordering — the [[bm25]]/[[qlm]] discipline.
    *
    * Scale shape: [[qlm]]'s exactly — the expanded term set is a ≤
    * (|Q| + fbTerms)-row broadcast, tf/cf aggs are IN-pruned by it,
    * docs × terms expansion is map-side, top-k is
    * TakeOrderedAndProject. */
  def rm3(docs: DataFrame, queryTerms: Seq[String], fbDocs: Int = 5,
          fbTerms: Int = 5, topK: Int = 20, mu: Double = 300.0,
          beta: Double = 0.5): DataFrame = {
    val exp = rm3Weights(docs, queryTerms, fbDocs, fbTerms, mu)
    val q = docs.sparkSession.range(1)
      .select(explode(array(queryTerms.map(lit): _*)).as("term"),
        lit(1.0).as("wt"))
    val wts = broadcast(q.unionByName(
      exp.select(col("term"), (lit(beta) * col("w")).as("wt")))
      .localCheckpoint())
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("len"))
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val totals = toks.agg(count(lit(1)).cast("double").as("n_toks"))
    val tf = toks.join(wts.select("term"), "term")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val cf = toks.join(wts.select("term"), "term")
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("cf"))
    lens.crossJoin(wts)
      .join(tf, Seq("doc_id", "term"), "left")
      .join(broadcast(cf), Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (col("wt") * log((coalesce(col("tf"), lit(0.0))
          + lit(mu) * coalesce(col("cf"), lit(0.0)) / col("n_toks"))
          / (col("len") + lit(mu)))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Heaps-law vocabulary-growth curve (Heaps 1978; the release-card
    * companion to `web_powerlaw`'s Zipf exponent): cumulative token count
    * vs cumulative distinct BIGRAM vocabulary at `buckets` corpus prefixes
    * (deterministic doc_id-range buckets — no data-dependent ntile) —
    * bigrams because that's the vocabulary a tokenizer/merge planner
    * actually sizes (and the synthetic corpus's unigram vocab is closed,
    * so unigram Heaps is a constant) — plus
    * the log–log OLS slope β of `V(n) ≈ K·n^β` attached to every row
    * (0 < β < 1 on natural text; a corpus whose β jumps between releases
    * changed composition — boilerplate collapse or language mix). K is
    * NOT emitted: it needs exp(intercept), and library exp is only ~1-ulp
    * reproducible cross-engine (the rm3Weights decision).
    *
    * Scale shape: one map-side length projection + one (term) min agg for
    * first occurrences (map-side partials on short word keys); everything
    * after runs on a ≤ buckets-row frame (its cumulative window and the
    * 1-row OLS fold are bounded by `buckets`, never the corpus). The OLS
    * slope is the pinned form (n·Σxy − Σx·Σy)/(n·Σx² − Σx·Σx), ROUND(6)
    * — the only float output. */
  def heapsLaw(docs: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2,
      s"buckets=$buckets must be >= 2 (the OLS slope needs two points)")
    val m = docs.agg((max(col("doc_id")) + lit(1L)).cast("double").as("m"))
    def bucketOf(id: Column) =
      floor(id.cast("double") * lit(buckets) / col("m"))
    val bToks = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("len"))
      .crossJoin(broadcast(m))
      .groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(sum(col("len")).as("toks"))
    val bVocab = docs
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shingles(col("text"), 2)).as("term"))
      .groupBy("term").agg(min(col("doc_id")).as("first_id"))
      .crossJoin(broadcast(m))
      .groupBy(bucketOf(col("first_id")).as("bucket"))
      .agg(count(lit(1)).as("vocab"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ buckets rows from here on — the cumulative window and OLS fold
    // are bounded frames, not corpus windows
    val cum = bToks.join(bVocab, Seq("bucket"), "full")
      .select(col("bucket"),
        sum(coalesce(col("toks"), lit(0L))).over(w).as("n_tokens"),
        sum(coalesce(col("vocab"), lit(0L))).over(w).as("n_vocab"))
    // degenerate-prefix guard: a leading bucket holding only sub-2-token
    // docs has n_vocab = 0 (ln → -inf, engine-convention-exposed) — the
    // OLS fit runs over the positive points only, both engines
    val fit = cum.filter(col("n_vocab") > 0L && col("n_tokens") > 0L)
      .select(log(col("n_tokens").cast("double")).as("x"),
        log(col("n_vocab").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("beta"))
    cum.crossJoin(broadcast(fit))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * retrieval runs: `score(d) = Σ_r 1/(k + rank_r(d))` over the union of
    * the runs' result lists — the standard score-free way to combine
    * [[bm25]] and [[qlm]] (whose raw scores live on incomparable scales);
    * k = 60 per the paper. A doc absent from a run simply contributes
    * nothing (RRF over the union, the published form). Ranks are integers
    * and each doc's sum spans ≤ |runs| exact rationals, ROUND(6) — no
    * float-order exposure.
    *
    * Scale shape: each run is already a top-k frame (TakeOrderedAndProject
    * output), so the rank windows, the union, the fusion agg and the final
    * top-k all ride ≤ |runs|·topK rows — fusion never touches the
    * corpus. */
  def rrfFuse(runs: Seq[DataFrame], k: Int = 60, topK: Int = 20): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k >= 1, s"k=$k must be >= 1 (k + rank must stay positive)")
    runs.map { r =>
      r.select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long").as("rank"))
    }.reduce(_ unionByName _)
      .select(col("doc_id"),
        (lit(1.0) / (lit(k.toLong) + col("rank"))).as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"), round(sum(col("c")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Inverted-index publication artifact (the at-rest retrieval structure
    * next to [[bm25]]'s online form — cf. the postings layout every
    * Lucene-lineage engine serializes): per term, document frequency,
    * collection frequency, and the posting list as `gap:tf` entries with
    * DELTA-encoded doc ids (gap₀ = doc_id₀; the standard d-gap form that
    * makes postings compress — published here as the readable string so
    * the oracle can recompute it byte-for-byte).
    *
    * Terms outside the `[minDf, maxDf]` band are excluded: df < minDf is
    * hapax noise; df > maxDf bounds BOTH the per-term window partition and
    * the collected posting array (a stopword's posting list is
    * corpus-sized — a production index splits hot terms into posting
    * BLOCKS; the cap is this pipeline's declared stand-in, the
    * [[graft.graph.KgGraph.relatedDocs]] maxDocFreq discipline).
    *
    * Scale shape: one (term, doc) count agg off the token explode; the df
    * band filter joins on term BEFORE the lag window, so every window
    * partition is ≤ maxDf rows (never a hot-term skew bomb); one final
    * per-term agg whose arrays are ≤ maxDf entries. */
  def postings(docs: DataFrame, minDf: Long = 2,
               maxDf: Long = 1000): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val kept = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
      .select("term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc_id")
    tf.join(kept, "term")
      .withColumn("gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("gap"),
              col("tf")))),
            s => concat(s.getField("gap").cast("string"), lit(":"),
              s.getField("tf").cast("string"))), ",").as("postings"))
  }

  /** DuckDB twin of [[postings]] — full query SQL (same df band). */
  def postingsSql(minDf: Long = 2, maxDf: Long = 1000): String =
    s"""WITH tf AS (SELECT term, doc_id, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)
          GROUP BY 1, 2),
        kept AS (SELECT term FROM tf GROUP BY term
                 HAVING COUNT(*) BETWEEN $minDf AND $maxDf),
        g AS (SELECT t.term, t.doc_id, t.tf,
                t.doc_id - COALESCE(lag(t.doc_id) OVER (
                  PARTITION BY t.term ORDER BY t.doc_id), 0) AS gap
              FROM tf t JOIN kept USING (term))
        SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
          string_agg(CAST(gap AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                     ',' ORDER BY doc_id) AS postings
        FROM g GROUP BY 1"""

  /** Corpus-trained bigram language-model fluency score — the KenLM-style
    * quality signal LLM-data pipelines gate on (CCNet/Gopher use an external
    * LM; here the LM IS the corpus's own bigram model, so everything stays
    * one deterministic job): per doc, the mean negative log-likelihood of
    * its token bigrams under add-k smoothing,
    * nll(w₁w₂) = −ln((c(w₁w₂) + k) / (c₁(w₁) + k·V)), where c₁ counts
    * bigram PREFIXES (so the conditional normalizes) and V = distinct
    * corpus tokens. Low score = phrasing the corpus finds typical; high =
    * gibberish/boilerplate-mangled text.
    *
    * Scale shape: ONE corpus-sized count aggregation (bigrams); the prefix
    * counts are derived by RE-AGGREGATING the already-reduced bigram-count
    * table (c₁(w₁) = Σ c₂ over bigrams prefixed w₁ — a vocabulary-sized
    * input, not a second corpus explode+shuffle); V rides as a 1-row
    * in-plan aggregate broadcast back (never a driver action); the per-doc
    * join carries (doc_id, bigram) — at 100 TB hash the bigram key to 64
    * bits for the exchanges ([[Dedup.exact]] math; text kept verbatim here
    * because the oracle recomputes on the raw strings). Docs with < 2
    * tokens have no bigrams and score NULL (the oracle's LEFT JOIN twin). */
  /** DSIR smoothing constant and feature-bucket count — SINGLE SOURCE for
    * the Column code and the oracle literals. */
  val DsirAlpha: Double = 0.5
  val DsirBuckets: Int = 64

  /** DSIR importance weights (Xie et al., NeurIPS 2023 — "Data Selection
    * for Language Models via Importance Resampling"): per-doc
    * log-importance of the doc under a TARGET token distribution vs the
    * raw-corpus distribution, over hashed unigram features:
    * `Σ_tokens ln p̂_target(b(w)) − ln p̂_raw(b(w))` with add-α smoothing
    * over `buckets` hashed feature buckets. Docs scoring high look like the
    * target (e.g. the English slice, a wiki-quality slice) and survive
    * importance resampling; `isTarget` is any deterministic Column gate.
    *
    * Scale shape: token explode → bucket via the portable 60-bit md5 hash
    * ([[Sketch.hash60]] — exchanges carry (doc_id, bucket), never tokens);
    * two bucket-count aggregations (the bucket table is `buckets` rows);
    * totals as 1-row in-plan aggregates broadcast back (never a driver
    * action); the per-doc sum joins a `buckets`-row broadcast. Per-doc
    * double sums are order-free at the ROUND(6) output contract (the BM25
    * argument). */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = DsirBuckets,
                  alpha: Double = DsirAlpha): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.as("is_target"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("is_target"),
        (Sketch.hash60(col("w")) % buckets).as("b"))
    val tgt = toks.filter(col("is_target"))
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val raw = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val tTot = tgt.agg(sum(col("tc")).as("t_total"))
    val rTot = raw.agg(sum(col("rc")).as("r_total"))
    val logRatio = raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + lit(alpha)) /
            (col("t_total") + lit(alpha * buckets)))
          - log((col("rc") + lit(alpha)) /
            (col("r_total") + lit(alpha * buckets)))).as("lr"))
    toks.join(broadcast(logRatio), "b")
      .groupBy("doc_id")
      .agg(round(sum(col("lr")), 6).as("dsir_logweight"))
  }

  def ngramLmScore(docs: DataFrame, kSmooth: Double = 0.5): DataFrame = {
    val bg = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 2)).as("bg"))
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val preCounts = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val scored = bg
      .join(bgCounts, "bg")
      .join(preCounts, substring_index(col("bg"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (-log((col("c2") + lit(kSmooth)) /
          (col("c1") + lit(kSmooth) * col("v")))).as("nll"))
      .groupBy("doc_id")
      .agg(round(avg(col("nll")), 6).as("lm_nll"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
  }

  /** Mojibake injection codepoints, ONE source for the Scala literal and
    * the DuckDB `chr()` chain: `" caf" + U+00C3 U+00A9` is "café"'s UTF-8
    * (0xC3 0xA9) mis-decoded as Latin-1 — the classic double-encoding
    * artifact a real crawl is full of. */
  val MojibakeCafe: Seq[Int] = Seq(' ', 'c', 'a', 'f', 0xC3, 0xA9)

  /** Replacement-character injection (a decoder already gave up). */
  val MojibakeRepl: Seq[Int] = Seq(' ', 'x', 0xFFFD, 'y')

  private def cps(s: Seq[Int]): String = s.map(_.toChar).mkString

  private def chrChainSql(s: Seq[Int]): String =
    s.map(c => s"chr($c)").mkString(" || ")

  /** Double-encoded UTF-8 signature: a Latin-1-visible `Ã` (U+00C3, the
    * mis-decoded first byte of every 2-byte U+0080–U+07FF sequence)
    * followed by a continuation-byte codepoint U+0080–U+00BF. Shared
    * Java∩RE2 dialect — both engines take `\\x{..}` escapes. */
  val DoubleUtf8Re: String = "\\x{00C3}[\\x{0080}-\\x{00BF}]"

  /** Decode-failure signature: U+FFFD replacement characters. */
  val ReplCharRe: String = "\\x{FFFD}"

  /** Corpus with deterministic encoding damage for [[mojibakeReport]]:
    * docs with `doc_id % 7 == 3` get a double-encoded "café" suffix, docs
    * with `doc_id % 11 == 5` a replacement-char suffix (the classes
    * overlap at `doc_id % 77 == 38`, so the detector must count both
    * signatures on one doc). Mirrored in [[mojibakePagesCteSql]]. */
  def withMojibake(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 3, lit(cps(MojibakeCafe)))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 5, lit(cps(MojibakeRepl)))
          .otherwise(lit(""))).as("text"))

  /** DuckDB CTE twin of [[withMojibake]] — `mjpg(doc_id, text)`. */
  def mojibakePagesCteSql: String =
    s"""mjpg AS (SELECT doc_id, text
          || CASE WHEN doc_id % 7 = 3 THEN ${chrChainSql(MojibakeCafe)}
                  ELSE '' END
          || CASE WHEN doc_id % 11 = 5 THEN ${chrChainSql(MojibakeRepl)}
                  ELSE '' END AS text
        FROM documents)"""

  /** Per-doc encoding-damage report (the charset-QA gate of web-corpus
    * curation — cf. the UTF-8 repair passes in CCNet/C4-style pipelines):
    * counts of double-encoded UTF-8 signatures and replacement chars plus
    * a boolean `damaged` verdict. Pure map-side regexp counting — zero
    * shuffles, as wide as the corpus scan at 10^12 pages; the damaged
    * FRACTION (not the per-doc rows) is what a release dashboard
    * aggregates downstream. */
  def mojibakeReport(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(DoubleUtf8Re), lit(0)))
        .cast("long").as("n_double"),
      size(regexp_extract_all(col("text"), lit(ReplCharRe), lit(0)))
        .cast("long").as("n_repl"))
      .withColumn("damaged", col("n_double") + col("n_repl") > 0)

  /** Accent-fold map — SINGLE SOURCE for [[foldAccents]], [[withAccents]]
    * and the `ann_folded` oracle SQL. 1:1 codepoint map ON PURPOSE: a
    * same-length fold preserves every char offset, so fold-then-annotate
    * reports spans valid against the ORIGINAL text (the reason production
    * annotators fold with translate tables, not Unicode NFD+strip, on the
    * matching path). Kept to the chars the synthesis injects; a real
    * deployment ships the full Latin-1/Latin-2 table. */
  val AccentFrom = "\u00e9\u00e0" // e-acute, a-grave
  val AccentTo = "ea"

  /** Accent-injection synthesis for `ann_folded` (the damage-synthesis
    * discipline of [[withMojibake]]): every third doc has its e/a vowels
    * replaced by accented forms — without folding, those docs lose ALL
    * dictionary matches (the spec's negative control). */
  def withAccents(docs: DataFrame): DataFrame =
    docs.select(concat(lit("doc://"), col("doc_id")).as("url"),
      when(col("doc_id") % 3 === 0,
        translate(col("text"), AccentTo, AccentFrom))
        .otherwise(col("text")).as("text"))

  /** The matching-path accent fold (A1's normalization contract: original
    * offsets survive because the map is 1:1). Codegen'd `translate`. */
  def foldAccents(text: Column): Column =
    translate(text, AccentFrom, AccentTo)

  /** Typo-injection synthesis for `dict_spell_variants` (the
    * damage-synthesis discipline of [[withMojibake]]): every 5th doc
    * APPENDS its 3rd token with the 2nd character deleted — a
    * single-deletion OCR/keyboard error next to a healthy occurrence of
    * the source word (append, not replace, so no other operator's
    * contract moves). Mirrored in the oracle SQL. */
  def withTypos(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val t3 = element_at(toks, 3)
    val typo = concat(t3.substr(lit(1), lit(1)), t3.substr(lit(3), length(t3)))
    docs.withColumn("text",
      when(col("doc_id") % 5 === 0 && size(toks) >= 3 && length(t3) >= 4,
        concat(col("text"), lit(" "), typo))
        .otherwise(col("text")))
  }

  /** RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010 — the
    * standard unsupervised per-document keyword extractor): candidate
    * phrases are maximal runs of non-stopword tokens; each word scores
    * `deg/freq` over the document's candidates (deg = Σ phrase length per
    * occurrence — favors words that travel in long phrases); a phrase
    * scores the sum of its member-occurrence word scores; top-k phrases
    * per document win. Stopword list shared with the oracle via
    * [[graft.dict.DictBuild.CandidateStopwords]].
    *
    * Determinism: ranking uses the 6dp-ROUNDED score (absorbs float-sum
    * ordering across engines) with the phrase string as tie-break.
    *
    * Scale shape: everything is doc_id-keyed — the phrase-island
    * row_number window, the per-(doc, word) stats agg, the score join and
    * the final top-k window all reuse ONE exchange on doc_id (Catalyst
    * collapses the matching partitionings); frames are bounded by document
    * length (the S2 length-bucket bound). No corpus-global state at all —
    * RAKE is per-document by definition, so the operator is as wide as the
    * corpus scan. */
  def rake(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = graft.dict.DictBuild.CandidateStopwords
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "tok")))
      .select(col("doc_id"), (col("i") + 1).as("p"), col("tok"))
      .filter(!col("tok").isin(stop: _*))
    val islW = Window.partitionBy("doc_id").orderBy("p")
    val occ = toks.withColumn("island", col("p") - row_number().over(islW))
      .withColumn("plen",
        count(lit(1)).over(Window.partitionBy("doc_id", "island")))
    val wordScore = occ.groupBy("doc_id", "tok")
      .agg((sum(col("plen")).cast("double") /
        count(lit(1)).cast("double")).as("wscore"))
    val phrases = occ.join(wordScore, Seq("doc_id", "tok"))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x("tok")), " ").as("phrase"),
        round(sum(col("wscore")), 6).as("score"))
      // the same phrase can recur in one doc: identical stats, ONE row
      .groupBy("doc_id", "phrase").agg(first(col("score")).as("score"))
    val rankW = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase"))
    phrases.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("phrase"), col("score"))
  }

  /** Drift-synthesis marker token appended to every re-crawled (truncated)
    * document in [[tokenDrift]]'s snapshot-2 synthesis — shared with the
    * oracle SQL literal. */
  val DriftMarker = "driftmarker2"

  /** Token-distribution drift between two crawl snapshots — the
    * training-data pipeline's distribution-shift monitor (Rae et al. 2021
    * track corpus composition over time; a silent upstream crawl change
    * shifts the unigram distribution long before any quality rule fires).
    * Snapshot 1 = each document's full token stream; snapshot 2 re-crawls
    * `doc_id % 3 == 0` documents TRUNCATED to their first half (the
    * [[graft.SparkEntry]] `kg_fact_history` half-token idiom) plus one
    * injected [[DriftMarker]] token (new-vocabulary drift), everything
    * else unchanged — deterministic, mirrored literally in the oracle.
    *
    * Output: the `topK` most-drifted tokens by L1 distance
    * `|p1 − p2|` between the two unigram relative-frequency
    * distributions (exact-rational doubles — division and subtraction are
    * IEEE-identical cross-engine, so the pre-round ORDER is deterministic
    * with the token string as tie-break), each row also carrying the
    * corpus-level Jensen–Shannon divergence (nats). JSD is the one `ln`
    * consumer, so it inherits `text_entropy`'s 4dp cross-engine contract;
    * per-token probabilities/drift round 6dp.
    *
    * Scale shape: token explode → ONE (token)-keyed hash aggregation with
    * conditional partial sums (map-side combine; both snapshots counted in
    * the same pass — no per-snapshot shuffle, no full-outer join of two
    * vocab tables); totals and the JSD sum are 1-row in-plan scalars
    * attached by broadcast crossJoin (the house dangling-mass pattern);
    * the global top-k is `orderBy.limit` → TakeOrderedAndProject, never a
    * vocab-wide window sort. At 100 TB the only wide state is the
    * vocab-keyed agg — exactly as wide as `text_vocab`. */
  def tokenDrift(docs: DataFrame, topK: Int = 50): DataFrame = {
    val toks = split(col("text"), " ")
    val half = expr(
      "slice(split(text, ' '), 1, (size(split(text, ' ')) + 1) div 2)")
    val toks2 = when(col("doc_id") % 3 === 0,
      concat(half, array(lit(DriftMarker)))).otherwise(toks)
    val cnt = docs.select(explode(toks).as("token"), lit(1L).as("v"))
      .unionByName(docs.select(explode(toks2).as("token"), lit(2L).as("v")))
      .groupBy("token")
      .agg(sum(when(col("v") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("v") === 2, 1L).otherwise(0L)).as("c2"))
    val tot = cnt.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    val probs = cnt.crossJoin(broadcast(tot))
      .withColumn("p1", col("c1").cast("double") / col("n1"))
      .withColumn("p2", col("c2").cast("double") / col("n2"))
      .withColumn("mid", (col("p1") + col("p2")) / 2)
      .withColumn("jsd_term",
        when(col("p1") > 0, col("p1") / 2 * log(col("p1") / col("mid")))
          .otherwise(lit(0.0)) +
        when(col("p2") > 0, col("p2") / 2 * log(col("p2") / col("mid")))
          .otherwise(lit(0.0)))
    val jsd = probs.agg(round(sum("jsd_term"), 4).as("jsd"))
    probs
      .orderBy(abs(col("p1") - col("p2")).desc, col("token"))
      .limit(topK)
      .crossJoin(broadcast(jsd))
      .select(col("token"), col("c1"), col("c2"),
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(abs(col("p1") - col("p2")), 6).as("drift"), col("jsd"))
  }

  // ---- readability -------------------------------------------------------

  /** Flesch reading-ease + Flesch–Kincaid grade level (Kincaid et al. 1975
    * — the standard readability pair on corpus release cards; a curation
    * signal next to the Gopher rules). Syllables ≈ vowel-group runs
    * `[aeiouy]+` (the classic heuristic); counting over the WHOLE text
    * equals the per-word sum because the space separator is never a vowel,
    * so one regexp_extract_all replaces an explode+agg. The synthesis
    * corpus carries no sentence punctuation, so sentence length is the
    * documented stand-in: `5 + doc_id % 5` tokens per sentence (varies the
    * words/sentence term across docs; a real deployment splits on the
    * extractor's sentence boundaries — the flip point is this one column).
    * Pure map-side column arithmetic, zero shuffles at any corpus size;
    * published constants (206.835/1.015/84.6 and 0.39/11.8/15.59) mirrored
    * literally in the oracle SQL; 4dp cross-engine rounding on the two
    * scores only (counts are exact integers). */
  def readability(docs: DataFrame): DataFrame = {
    val w = size(tokens(col("text"))).cast("double")
    val syl = size(regexp_extract_all(col("text"), lit("[aeiouy]+"), lit(0)))
      .cast("double")
    val k = (lit(5) + col("doc_id") % 5).cast("double")
    val sent = ceil(w / k).cast("double") // ≥ 1: split() is never empty
    docs.select(col("doc_id"),
      w.cast("long").as("n_words"),
      syl.cast("long").as("n_syllables"),
      sent.cast("long").as("n_sentences"),
      round(lit(206.835) - lit(1.015) * (w / sent) - lit(84.6) * (syl / w), 4)
        .as("flesch"),
      round(lit(0.39) * (w / sent) + lit(11.8) * (syl / w) - lit(15.59), 4)
        .as("fk_grade"))
  }

  // ---- domain-mixture weighting ------------------------------------------

  /** Token budget the mixture is sampled into for `curate_mix_weights` —
    * SINGLE SOURCE with the oracle SQL. */
  val MixTokenBudget = 100000L

  /** Domain-mixture weighting for training-data assembly: per-source token
    * counts → sampling weight ∝ tokens^0.5 (the multilingual
    * sampling-temperature convention, Lample & Conneau 2019 / mT5's α) →
    * effective epochs each source repeats at a fixed token budget
    * (weight·budget / tokens; > 1 flags the small-domain upsampling risk
    * the release card reports). One map-side-combinable agg over
    * ≤ |sources| rows + a broadcast 1-row total; sqrt is IEEE-exact
    * cross-engine, 6dp contract on the two derived ratios (the w_raw sum
    * order differs between engines by ≤ 1 ulp over tens of sources). */
  def mixWeights(docs: DataFrame): DataFrame = {
    val per = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("n_tokens"))
      .withColumn("w_raw", sqrt(col("n_tokens").cast("double")))
    val tot = per.agg(sum("w_raw").as("w_sum"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w_raw") / col("w_sum"), 6).as("weight"),
        round(col("w_raw") / col("w_sum") * lit(MixTokenBudget.toDouble)
          / col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** MATERIALIZE the mixture — the missing step between
    * [[mixWeights]]' per-source weights and a training corpus: an
    * `nDocs`-document sample whose per-source counts follow the weights
    * by largest-remainder (Hamilton) apportionment — `floor(N·w)` seats
    * plus one for the largest fractional remainders (remainder desc,
    * source asc — fully deterministic, and Σ quotas = N exactly, which
    * proportional rounding alone can't guarantee) — and whose WITHIN-
    * source selection is the [[graft.ops.WebOps.domainQuota]] hash-rank
    * discipline (md5-derived order, doc_id tie-break: unbiased,
    * deterministic, re-runnable anywhere). A source whose quota exceeds
    * its size contributes all its docs — without-replacement sampling
    * caps at the source (the `epochs > 1` upsampling risk [[mixWeights]]
    * already reports).
    *
    * Scale shape: quotas ride the ≤|sources|-row weight frame (its
    * remainder window is bounded); selection is ONE window partitioned by
    * source (map-side WindowGroupLimit under the rank filter — the
    * domainQuota plan), quota attached by a broadcast join. */
  def mixSample(docs: DataFrame, nDocs: Int = 100): DataFrame = {
    require(nDocs >= 1, s"nDocs=$nDocs must be >= 1")
    val w = mixWeights(docs).select(col("source"), col("weight"))
    val base = w.select(col("source"),
      floor(lit(nDocs) * col("weight")).cast("long").as("n0"),
      (lit(nDocs) * col("weight") - floor(lit(nDocs) * col("weight")))
        .as("frac"))
    val rsum = base.agg((lit(nDocs.toLong) - sum(col("n0"))).as("r"))
    val quota = base
      .withColumn("rk", row_number().over(
        Window.orderBy(col("frac").desc, col("source"))).cast("long"))
      .crossJoin(broadcast(rsum))
      .select(col("source"),
        (col("n0") + when(col("rk") <= col("r"), lit(1L)).otherwise(lit(0L)))
          .as("q"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(
          graft.ops.Sketch.hash60(concat(lit("mix|"),
            col("doc_id").cast("string"))), col("doc_id"))).cast("long"))
      .join(broadcast(quota), "source")
      .filter(col("rn") <= col("q"))
      .select(col("source"), col("doc_id"))
  }
}
