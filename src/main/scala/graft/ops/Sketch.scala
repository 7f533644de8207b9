package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count sketching for corpus-scale cardinalities.
  *
  * KMV (k-minimum-values, a.k.a. bottom-k / theta sketch — Bar-Yossef et
  * al. 2002, the public DataSketches theta family): hash every value to a
  * uniform 60-bit integer, keep only the k smallest DISTINCT hashes per
  * group, estimate distinct = (k-1) · 2^60 / h_(k) where h_(k) is the kth
  * smallest kept hash (exact count when fewer than k distinct values were
  * seen).
  *
  * Why this sketch (vs HLL): the k-smallest-distinct-hashes set is
  * ORDER-INDEPENDENT and merge = set-union-then-truncate, so the estimate
  * is bit-deterministic across any partitioning / task order — which makes
  * it independently recomputable by the DuckDB oracle (k smallest distinct
  * hashes declaratively via row_number). HLL's register layout would match
  * too, but its 2^p register array is strictly more state for the same
  * oracle-checkable determinism at our k.
  *
  * Scale: the aggregation buffer is a bounded sorted Array[Long] (≤ k
  * entries, 8k bytes) regardless of input size — per-group state at a
  * 10^12-row corpus is k longs, map-side partials combine before the
  * shuffle, and the shuffle carries ≤ k·8 bytes per (group, partition).
  * The hash is the same portable md5-derived 60-bit integer the minhash
  * pipeline uses (codegen'd built-in in Spark, verbatim in DuckDB).
  */
object Sketch {

  /** 60-bit uniform hash of a string column: first 15 hex chars of md5,
    * identical in DuckDB as CAST(concat('0x', substring(md5(x),1,15)) AS
    * BIGINT). Domain [0, 2^60). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Scalar twin of [[hash60]] (specs + driver-side tooling). */
  def hash60Scalar(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private val Two60: Double = math.pow(2, 60)

  /** Bounded bottom-k distinct-hash aggregator. Buffer = sorted array of
    * the ≤ k smallest distinct hashes; reduce/merge keep it sorted and
    * deduplicated, so the final state is a pure function of the input SET
    * (task order / partitioning invisible). Runs under
    * ObjectHashAggregate — off the whole-stage-codegen path, which is fine
    * for an aggregate whose per-row work is an O(log k) binary search. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
    require(k >= 2, s"k=$k: KMV needs k >= 2")
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)
    def finish(buf: Array[Long]): Double = estimate(buf, k)
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()

    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already kept — set semantics
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // above the current kth min
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }
  }

  /** The estimator, shared with the spec's scalar oracle: exact when the
    * group had fewer than k distinct hashes, else (k-1)·2^60 / h_(k).
    * (The +1-free form has O(1/2^60) bias — negligible and identical in
    * both engines, which compute the same IEEE division.) */
  def estimate(bottomK: Array[Long], k: Int): Double =
    if (bottomK.length < k) bottomK.length.toDouble
    else (k - 1).toDouble * Two60 / bottomK(k - 1).toDouble

  /** Per-group KMV distinct estimate of `valueCol` (stringified before
    * hashing), with the exact distinct count alongside for error
    * inspection. One shuffle (partial → final aggregate on the group
    * key); the estimate column is the sketch path, the exact column a
    * COUNT(DISTINCT) the optimizer plans as expand+two-phase. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k), ExpressionEncoder[Long]())
    // NULL values are ignored (as COUNT(DISTINCT) does) — hash60(NULL) is
    // NULL, which the primitive-Long aggregator input cannot represent
    df.select(col(groupCol), col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("h", hash60(col("v")))
      .groupBy(groupCol)
      .agg(round(kmv(col("h")), 4).as("est_distinct"),
        countDistinct(col("v")).as("exact_distinct"))
  }

  // ---- HyperLogLog (register sketching) -----------------------------------

  /** 2^6 = 64 registers — the BigQuery/Presto APPROX_COUNT_DISTINCT family's
    * sketch, here at the small width the oracle can recompute cheaply. */
  val HllM = 64
  /** Remainder bits: the 60-bit hash minus the 6 bucket bits. */
  val HllRemBits = 54
  /** Flajolet et al. 2007's bias constant α_64. */
  val HllAlpha = 0.709
  /** 2^[[HllRemBits]]+1-free scale: every register contribution 2^{−M_j} is
    * carried as the exact BIGINT 2^{55−M_j} (absent register: 2^55), so the
    * harmonic-mean denominator is INTEGER until one final pinned division. */
  val HllScale: Long = 1L << (HllRemBits + 1)
  /** α_m · m² · 2^55 — the raw-estimate numerator, ONE double constant
    * whose shortest-repr string round-trips bit-exactly into the oracle. */
  val HllRawNum: Double = HllAlpha * (HllM.toDouble * HllM) * HllScale.toDouble

  /** Register rank ρ = leading-zero count of the 54-bit remainder + 1, as a
    * descending exact-integer threshold chain — never a float log2, whose
    * boundary ulps could disagree across engines. Codegen'd comparisons;
    * rem = 0 (all zeros) ranks [[HllRemBits]] + 1, per the HLL spec. */
  def hllRank(rem: Column): Column =
    (2 to HllRemBits).foldLeft(
      when(rem >= lit(1L << (HllRemBits - 1)), lit(1)))((acc, i) =>
      acc.when(rem >= lit(1L << (HllRemBits - i)), lit(i)))
      .otherwise(lit(HllRemBits + 1))

  /** DuckDB twin of [[hllRank]] — the same threshold constants, one source. */
  def hllRankSql(rem: String): String =
    "CASE " + (1 to HllRemBits).map(i =>
      s"WHEN $rem >= ${1L << (HllRemBits - i)} THEN $i").mkString(" ") +
      s" ELSE ${HllRemBits + 1} END"

  /** Per-group HyperLogLog distinct estimate (Flajolet, Fusy, Gandouet &
    * Meunier 2007) with the exact distinct count alongside — [[kmvDistinct]]'s
    * register-based sibling, and the shape production engines broadcast:
    * per-group state is 64 one-byte registers (vs KMV's k longs), merge is
    * elementwise MAX, so partials combine map-side and the shuffle carries
    * ≤ 64 rows per (group, partition).
    *
    * Plan shape: TWO hash aggregations — (group, bucket) → max rank, then
    * group → register fold — both fully codegen'd column arithmetic (the
    * rank is a comparison chain, no UDAF, unlike KMV's ObjectHashAggregate
    * path). Estimator: raw = α·m²/Σ2^{−M_j} with the harmonic sum carried
    * as exact BIGINTs ([[HllScale]]); small-range correction switches to
    * linear counting m·ln(m/V) when raw ≤ 2.5m and V (empty registers) > 0.
    * The 60-bit hash space makes the large-range correction unreachable.
    * Determinism: everything before the final division is exact integer
    * arithmetic; the division and the ln ride the ROUND(4) contract. */
  /** Per-group sparse HLL registers `(group, bucket, max rank)` — the
    * mergeable state [[hllDistinct]] estimates from and [[hllOverlap]]
    * element-wise-MAX-merges (HLL's defining property). */
  private def hllRegs(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame =
    df.select(col(groupCol), col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("h", hash60(col("v")))
      .select(col(groupCol), (col("h") % HllM).as("bucket"),
        expr(s"h div $HllM").as("rem"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(hllRank(col("rem"))).as("r"))

  /** The HLL estimator over a folded register set (raw harmonic form +
    * the small-range linear-counting branch) — one source for the
    * single-group and merged-union paths. */
  private def hllEstimate(nPresent: Column, sPresent: Column): Column = {
    val sInt = sPresent + (lit(HllM) - nPresent) * lit(HllScale)
    val raw = lit(HllRawNum) / sInt.cast("double")
    when(raw <= lit(2.5 * HllM) && nPresent < HllM,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) /
        (lit(HllM) - nPresent).cast("double"))).otherwise(raw)
  }

  private def hllFold(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_present"),
      sum(expr(s"shiftleft(cast(1 as bigint), ${HllRemBits + 1} - r)"))
        .as("s_present"))

  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val vals = df.select(col(groupCol), col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
    val folded = hllFold(hllRegs(df, groupCol, valueCol), Seq(groupCol))
    val exact = vals.groupBy(groupCol)
      .agg(countDistinct(col("v")).as("exact_distinct"))
    folded.join(exact, groupCol)
      .select(col(groupCol),
        round(hllEstimate(col("n_present"), col("s_present")), 4)
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** Cross-group OVERLAP estimation by HLL register merge + inclusion–
    * exclusion: `|A∩B| ≈ est(A) + est(B) − est(A∪B)`, where the union
    * sketch is the element-wise MAX of the two register sets — HLL's
    * defining mergeability, and the reason this works at 10^12 rows: the
    * union estimate needs NO second data pass, only the ≤m-row register
    * tables (what a warehouse ships between clusters). Estimates compose
    * from the 4dp-ROUNDED components (pinned — no fresh float exposure),
    * clamped at 0 (inclusion–exclusion on sketches can go negative for
    * tiny overlaps); the exact overlap rides alongside, the
    * q_distinct_approx audit contract.
    *
    * Scale shape: ONE register build (group-keyed hash agg, ≤m rows per
    * group); the group-pair frame is groups²-bounded (groups are an
    * enum here — the pair cartesian rides a broadcast over that tiny
    * list, never data rows); pair unions are two register⋈pairs
    * equi-joins + one (pair, bucket) MAX agg; the exact audit is one
    * value-keyed equi-self-join of the distinct (group, value) set. */
  def hllOverlap(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val regs = hllRegs(df, groupCol, valueCol).localCheckpoint()
    val groups = regs.select(col(groupCol).as("g")).distinct()
    val pairs = broadcast(groups.select(col("g").as("grp_a"))
      .crossJoin(groups.select(col("g").as("grp_b")))
      .filter(col("grp_a") < col("grp_b")).localCheckpoint())
    val tagged = regs.join(pairs, col(groupCol) === col("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("bucket"), col("r"))
      .unionByName(regs.join(pairs, col(groupCol) === col("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("bucket"), col("r")))
    val estU = hllFold(
      tagged.groupBy("grp_a", "grp_b", "bucket").agg(max(col("r")).as("r")),
      Seq("grp_a", "grp_b"))
      .select(col("grp_a"), col("grp_b"),
        round(hllEstimate(col("n_present"), col("s_present")), 4)
          .as("est_union"))
    val single = hllFold(regs, Seq(groupCol))
      .select(col(groupCol),
        round(hllEstimate(col("n_present"), col("s_present")), 4).as("e"))
    val dv = df.select(col(groupCol).as("g"),
        col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull).distinct()
    val exactOv = dv.alias("a")
      .join(dv.alias("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("grp_a"), col("b.g").as("grp_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    pairs
      .join(single.select(col(groupCol).as("grp_a"), col("e").as("est_a")),
        "grp_a")
      .join(single.select(col(groupCol).as("grp_b"), col("e").as("est_b")),
        "grp_b")
      .join(estU, Seq("grp_a", "grp_b"))
      .join(exactOv, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        col("est_union"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 4).as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  // ---- count-min (frequency sketching) -----------------------------------

  /** Count-min row hash: row `j`'s bucket for a value — the same portable
    * md5 hash salted with the row index, so the d hash functions are
    * independent-enough and IDENTICAL in DuckDB. */
  def cmBucket(v: Column, j: Column, w: Int): Column =
    hash60(concat(j.cast("string"), lit("|"), v)) % w

  /** Count-min sketch build (Cormode & Muthukrishnan 2005): a d×w counter
    * matrix; every value occurrence increments one bucket per row. The
    * whole build is ONE hash aggregation over a 4× exploded stream of
    * (row, bucket) keys — d·w total groups (a few KB) regardless of corpus
    * size, partials combine map-side, and the sketch itself is a
    * broadcastable table. The frequency estimate (min over rows, see
    * [[countMinEstimate]]) never under-counts — collisions only inflate.
    * NULL values are ignored, the [[kmvDistinct]] COUNT-style policy. */
  def countMin(values: DataFrame, valueCol: String, d: Int = 4,
               w: Int = 256): DataFrame =
    values
      .select(explode(sequence(lit(0), lit(d - 1))).as("j"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("j"), cmBucket(col("v"), col("j"), w).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** AMS second-moment (F2) estimator in its count-sketch "fast AMS" form
    * (Alon, Matias & Szegedy 1996; Charikar, Chen & Farach-Colton 2002):
    * `rows` independent sketch lines, each `width` signed counters —
    * counter(r, b) = Σ sign_r(key) over keys hashing to bucket b; the
    * per-line estimate is Σ_b counter², the sketch estimate is the MEDIAN
    * line. F2 = Σ_k f_k² is the SELF-JOIN SIZE of the key column — the
    * optimizer statistic behind `q_skew_report`'s salting decision (a join
    * whose F2 explodes needs salting before it runs, and the sketch reads
    * it in one pass where the exact rollup pays a key-wide shuffle). The
    * exact F2 rides alongside and `rel_err` is the measured error — the
    * `q_distinct_approx` audit contract.
    *
    * Determinism/exactness: signs and buckets are [[hash60]]-derived
    * (shared md5 idiom), every counter/estimate/median is BIGINT
    * arithmetic — the ONLY float is the final rel_err division, ROUND(6).
    * Median of `rows` values = element (rows+1)/2 of the sorted list
    * (rows odd), a `rows`-element array on a 1-row frame.
    *
    * Scale shape: the sketch is ONE hash agg over (line, bucket) — at most
    * rows × width counters total regardless of corpus size — fed by a
    * map-side rows-way explode; partials combine map-side (signed sums are
    * commutative). The exact side is the two-agg F2 rollup. Nothing else
    * shuffles. */
  def amsF2(keys: DataFrame, keyCol: String, rows: Int = 5,
            width: Int = 16): DataFrame = {
    require(rows >= 1 && rows % 2 == 1,
      s"rows=$rows must be positive and odd (median line)")
    require(width >= 1, s"width=$width must be >= 1")
    val tagged = keys.select(col(keyCol).as("key"))
      .select(col("key"), explode(sequence(lit(0), lit(rows - 1))).as("r"))
      .select(col("r"),
        pmod(hash60(concat(lit("b"), col("r").cast("string"), lit("|"),
          col("key"))), lit(width.toLong)).as("b"),
        (lit(1L) - lit(2L) * pmod(hash60(concat(lit("s"),
          col("r").cast("string"), lit("|"), col("key"))), lit(2L)))
          .as("sign"))
    val perLine = tagged.groupBy("r", "b").agg(sum(col("sign")).as("c"))
      .groupBy("r").agg(sum(col("c") * col("c")).as("est"))
    val med = perLine.agg(element_at(sort_array(collect_list(col("est"))),
      (rows + 1) / 2).as("f2_est"))
    val exact = keys.select(col(keyCol).as("key"))
      .groupBy("key").agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    exact.crossJoin(med)
      .select(col("f2_exact"), col("f2_est"),
        round(abs(col("f2_est") - col("f2_exact")).cast("double") /
          col("f2_exact"), 6).as("rel_err"))
  }

  /** Point-query the sketch for each distinct non-NULL value in `queries`:
    * estimate = min over the d rows of the value's bucket counter, where an
    * EMPTY (never-incremented) bucket counts as 0 — so a value absent from
    * the build stream correctly estimates 0 when any of its buckets is
    * untouched (the left join below; an inner join would silently take the
    * min over only the collided rows). `d`/`w` must match the build's. One
    * broadcast join (the sketch is d·w rows) + one min-aggregation. */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
                       valueCol: String, d: Int = 4, w: Int = 256): DataFrame = {
    val probes = queries.select(col(valueCol).as("v")).distinct()
      .filter(col("v").isNotNull)
      .select(col("v"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("v"), col("j"), w))
    probes.join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cm_estimate"))
  }
}
