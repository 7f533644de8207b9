package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of ("most recent value at or before t") joins — the temporal join the
  * versioned-dictionary pipeline needs: which dictionary snapshot was live
  * when each page was crawled (`warc_ts`), which prior event of the same
  * key most recently preceded this one. Two shapes, each matched to the
  * side sizes:
  *
  *  1. small right side (dictionary/version snapshots — tens of rows):
  *     inline the sorted (ts, version) list as an array literal and pick
  *     the last entry ≤ ts with pure column expressions. Map-only, ZERO
  *     shuffle, zero join — the correct 10^12-row plan for a dim that is
  *     small by construction (a broadcast-nested-loop inequality join
  *     would fan every row out ×|versions| and re-aggregate).
  *
  *  2. keyed self as-of (both sides corpus-scale, sharing a key): one
  *     window partitioned by the key — a single shuffle on the key, no
  *     join at all. This is the union-sort as-of plan specialized to the
  *     self-join case.
  */
object AsOf {

  /** Shape 1: annotate `df` with the latest version whose effective
    * timestamp is ≤ `tsCol` (NULL before the first version). `versions`
    * must be driver-small (it is collected into an array literal — the
    * version dim is snapshots of one dictionary, not data-scale); ties on
    * effective ts are rejected rather than resolved arbitrarily. */
  def withVersionAsOf(df: DataFrame, tsCol: String,
                      versions: Seq[(Timestamp, String)],
                      out: String = "version"): DataFrame = {
    require(versions.map(_._1).distinct.size == versions.size,
      "as-of requires distinct effective timestamps")
    val sorted = versions.sortBy(_._1.getTime)
    // array<struct<t:long,v:string>> literal, sorted ascending by t —
    // microsecond precision on BOTH sides (a whole-second truncation here
    // would activate sub-second version boundaries up to 1s early)
    def micros(ts: Timestamp): Long = {
      val i = ts.toInstant
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    }
    val varr = array(sorted.map { case (ts, v) =>
      struct(lit(micros(ts)).as("t"), lit(v).as("v"))
    }: _*)
    // last element with t <= ts: filter keeps order, try_element_at(-1)
    // takes the latest (NULL — not an ANSI error — on an empty filter
    // result, i.e. rows before the first version)
    val ep = unix_micros(col(tsCol).cast("timestamp"))
    df.withColumn(out,
      try_element_at(filter(varr, x => x.getField("t") <= ep), lit(-1))
        .getField("v"))
  }

  /** Shape 2: for each row, the most recent STRICTLY PRECEDING row of the
    * same `keyCol` satisfying `predCol` (boolean), carrying `carryCol`
    * from that row (NULL when no such row). Ordering ties on (ts) break by
    * `idCol` so the result is deterministic. One shuffle (window on key). */
  def lastPrecedingWhere(df: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, predCol: String, carryCol: String,
                         out: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(out,
      last(when(col(predCol), col(carryCol)), ignoreNulls = true).over(w))
  }
}
