package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-ORDER layout clustering — the multi-dimensional data-skipping layout
  * (Iceberg `rewrite_data_files(strategy => 'sort', sort_order => zorder)`,
  * Delta `OPTIMIZE ZORDER BY`): interleave the bits of two dimension keys so
  * that rows close in EITHER dimension land in the same file, making
  * per-file min/max stats prune scans filtered on either one. The companion
  * of `q_compaction_plan` (which sizes files; this orders rows into them).
  *
  * One expression-term list drives BOTH engines ([[zExpr]] with
  * dialect-specific shift syntax) — the cross-engine contract is the exact
  * term order and constants, the `fpSql`/hyperplane-literal discipline.
  *
  * Scale shape: the z-value is a pure map-side codegen expression (bitwise
  * built-ins only — no UDF); bucketing by the z-value's TOP BITS needs no
  * global sort or range exchange at all — ONE hash aggregation computes the
  * per-bucket extent stats that evidence the layout (each bucket's min/max
  * is tight on BOTH dims). A production rewrite would instead
  * `repartitionByRange(zval)` and write; the stats query is the part that
  * is oracle-checkable and the part a table-maintenance planner consumes.
  */
object ZOrder {

  /** Interleave `bits` low bits of x (even positions) and y (odd positions):
    * Σ_i ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1). Disjoint bits, so `+` == `|`
    * — and `+` parses identically in both dialects. */
  def zExpr(x: String, y: String, bits: Int,
            shl: (String, Int) => String,
            shr: (String, Int) => String): String =
    (0 until bits).flatMap { i =>
      Seq(shl(s"(${shr(x, i)} & 1)", 2 * i),
          shl(s"(${shr(y, i)} & 1)", 2 * i + 1))
    }.mkString("(", " + ", ")")

  def sparkZ(x: String, y: String, bits: Int = 16): String =
    zExpr(x, y, bits,
      (e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")

  def duckZ(x: String, y: String, bits: Int = 16): String =
    zExpr(x, y, bits, (e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")

  /** Reference scalar (spec oracle for the expression builders). */
  def zValue(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  /** Per-z-bucket extent stats over events (x = user_id, y = epoch-hour,
    * both masked to `bits` low bits — match the key widths to the data's
    * actual cardinality or every row lands in one bucket and the layout
    * evidences nothing; bucket = z >> (2·bits − topBits)). */
  def layoutStats(events: DataFrame, bits: Int = 8, topBits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits out of range: $bits")
    require(topBits >= 1 && topBits <= 2 * bits, s"topBits out of range: $topBits")
    val mask = (1L << bits) - 1
    val prep = events.select(
      expr(s"user_id & $mask").as("x"),
      expr(s"(cast(cast(ts as timestamp) as bigint) div 3600) & $mask").as("y"))
    prep.withColumn("zval", expr(sparkZ("x", "y", bits)))
      .groupBy(expr(s"shiftright(zval, ${2 * bits - topBits})").as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }
}
