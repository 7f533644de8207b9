package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is strictly synchronous
  * request/response (SURVEY.md §3.4 — no stream semantics to replicate), so
  * this module demonstrates the engine's streaming-capable shape over the
  * `events` table: watermarked windowed aggregation + custom keyed state via
  * `mapGroupsWithState`. The annotate scan itself is a stateless flatMap and
  * lifts to `readStream → mapPartitions → writeStream` unchanged.
  */
object EventStream {

  /** Watermarked hourly windowed aggregation per event_type. Works on both a
    * streaming and a batch DataFrame (same plan — Structured Streaming's
    * unified semantics). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** SLIDING-window aggregation (1-hour windows every 15 minutes): each
    * event lands in 4 overlapping windows — `window(slide)` explodes rows
    * into their windows BEFORE the shuffle, so the cost is slide-factor ×
    * the tumbling shuffle, bounded and explicit. Same plan batch/stream
    * (the batch form is the DuckDB-oracle-checked one: the oracle rebuilds
    * the window explosion with generate_series). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** SESSION-window aggregation (the gap-based sessionization every
    * click/crawl-event pipeline needs): per user, events closer than `gap`
    * to their predecessor merge into one session; the session ends `gap`
    * after its last event (Spark's `session_window` semantics — an event at
    * EXACTLY start+gap still MERGES, i.e. same-session iff the delta
    * is <= gap; spec-pinned at the boundary). Same plan batch/stream; the
    * batch form is
    * the DuckDB-oracle-checked one (the oracle rebuilds sessions as
    * gaps-and-islands: a lag-delta break flag cumulatively summed).
    *
    * Scale shape: ONE shuffle on the user key; Spark merges each
    * partition's candidate windows in-sort rather than materializing
    * per-event windows. Timestamps surface as epoch micros
    * (`unix_micros`/`epoch_us` — the as-of ops' cross-engine contract). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes") // no-op in batch; required to
      // merge/expire session state in a stream
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("w.start").cast("timestamp")).as("session_start"),
        unix_micros(col("w.end").cast("timestamp")).as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup — the streaming form of [[graft.ops.Dedup.exact]]
    * for a continuously-ingested crawl: drop any document whose CONTENT was
    * already seen, keyed by a fixed-width double-xxhash64+length composite —
    * the STATE STORE holds only ~24-byte keys, never raw text (the dedup
    * repartition still moves whole rows to their stateful partition, like
    * any keyed stateful op) — with state expired by event-time watermark so
    * the store stays bounded: the standard Structured Streaming
    * `dropDuplicatesWithinWatermark` shape. Survivor rows pass through with
    * their original schema (internal key columns are prefixed to avoid
    * clobbering user columns). */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__dedup_h1", xxhash64(lit(1), col("text")))
      .withColumn("__dedup_h2", xxhash64(lit(2), col("text")))
      .withColumn("__dedup_n", length(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__dedup_h1", "__dedup_h2", "__dedup_n")
      .drop("__dedup_h1", "__dedup_h2", "__dedup_n")

  /** STREAM-STREAM join — the crawl-scheduler shape: a link-DISCOVERY
    * stream (url first seen on some page) joined with the page-FETCH stream
    * to measure discovery→fetch latency. Both sides are watermarked and the
    * join condition carries the event-time BOUND (fetch within `maxGap` of
    * discovery), which is what lets Structured Streaming expire buffered
    * state on both sides — an unbounded-condition stream-stream inner join
    * would hold every row forever. Works identically on batch frames
    * (the batch/stream parity contract every op here keeps): same plan,
    * minus the state store. */
  def discoveryFetchJoin(discoveries: DataFrame, fetches: DataFrame,
                         watermark: String = "1 hour",
                         maxGap: String = "30 minutes"): DataFrame = {
    val d = discoveries
      .select(col("url"), col("ts").as("discover_ts"))
      .withWatermark("discover_ts", watermark)
    val f = fetches
      .select(col("url").as("f_url"), col("ts").as("fetch_ts"))
      .withWatermark("fetch_ts", watermark)
    d.join(f,
        col("url") === col("f_url") &&
          col("fetch_ts") >= col("discover_ts") &&
          col("fetch_ts") <= col("discover_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("url"), col("discover_ts"), col("fetch_ts"),
        (unix_micros(col("fetch_ts").cast("timestamp")) -
          unix_micros(col("discover_ts").cast("timestamp"))).as("latency_us"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  case class HHState(counters: Map[String, Long])
  case class HHEntry(shard: Int, value: String, est: Long)

  /** Streaming heavy hitters by the Misra–Gries space-saving summary
    * (Misra & Gries 1982; the streaming frequent-items standard): per
    * SHARD (deterministic `String.hashCode` bucket), keyed state holds at
    * most `capacity` counters — seen value increments, unseen value takes
    * a free slot, and with the summary full EVERY counter decrements (the
    * MG step; zeros evicted). Guarantees: any value with true frequency
    * > N_shard/(capacity+1) is IN the summary, and each estimate
    * undercounts its true frequency by at most N_shard/(capacity+1).
    *
    * Scale shape: state is BOUNDED at `capacity` entries per shard forever
    * — the whole point vs an exact groupBy count whose state grows with
    * the key universe; shards give parallelism and merge by estimate
    * addition downstream. Order-sensitivity note: the summary CONTENT
    * (beyond the guarantees) depends on arrival order, so this op is
    * spec-gated (MemoryStream, controlled order), not SQL-oracle-gated —
    * same policy as streaming exact dedup. */
  def heavyHitters(values: Dataset[String], capacity: Int = 8,
                   nShards: Int = 4): Dataset[HHEntry] = {
    val spark = values.sparkSession
    import spark.implicits._
    values.groupByKey(v => math.floorMod(v.hashCode, nShards))
      .flatMapGroupsWithState[HHState, HHEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[String], state: GroupState[HHState]) =>
          var m = state.getOption.map(_.counters).getOrElse(Map.empty)
          it.foreach { v =>
            if (m.contains(v)) m += v -> (m(v) + 1L)
            else if (m.size < capacity) m += v -> 1L
            else m = m.map { case (k, c) => k -> (c - 1L) }.filter(_._2 > 0L)
          }
          state.update(HHState(m))
          m.iterator.map { case (k, c) => HHEntry(shard, k, c) }
      }
  }

  case class AnomState(curHour: Long, curN: Long, prior: Seq[Long])
  case class AnomalyRow(event_type: String, hour: Timestamp, n: Long,
                        z: Double, anomaly: Boolean)

  /** STREAMING ingest-anomaly alarm — the continuous form of the batch
    * `q_anomaly` z-score: per event type, keyed state holds the current
    * hour's accumulating count plus the trailing 6 COMPLETED hourly counts;
    * when the stream advances past an hour boundary the hour closes and is
    * z-scored against the trailing window (|z| > 3 flags). Hours the stream
    * SKIPS close as explicit ZERO counts — the batch op's densified grid,
    * reproduced in state (an outage is the primary signal; without the
    * zero-fill it would silently stretch the window).
    *
    * State is BOUNDED: one (hour, count) accumulator + 6 longs per event
    * type, forever — the Misra–Gries discipline. The final in-flight hour
    * never closes (no successor has arrived); tests compare closed hours
    * against the batch result with the per-type last hour excluded.
    * Summary content is arrival-order-insensitive ACROSS batches as long as
    * event time is non-decreasing per type (each micro-batch sorts its own
    * slice); wildly late events belong to the watermarked variants — so
    * this is spec-gated (MemoryStream, controlled order), the streaming
    * exact-dedup / heavy-hitters policy. */
  def anomalyStream(events: Dataset[Event]): Dataset[AnomalyRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def closeHour(tpe: String, hour: Long, n: Long,
                  prior: Seq[Long]): Option[AnomalyRow] =
      if (prior.size < 6) None
      else {
        val mu = prior.map(_.toDouble).sum / prior.size
        val sd = math.sqrt(
          prior.map(x => (x - mu) * (x - mu)).sum / (prior.size - 1))
        if (sd <= 0) None
        else {
          val z = (n - mu) / sd
          // HALF_UP to 6dp — Spark round()'s mode, so stream == batch holds
          // bit-for-bit (math.rint is half-even and diverges on exact .5)
          val z6 = BigDecimal(z)
            .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          Some(AnomalyRow(tpe, new Timestamp(hour * 1000L), n, z6,
            math.abs(z) > 3.0))
        }
      }
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, AnomalyRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[Event], state: GroupState[AnomState]) =>
          val rows = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyRow]
          var st = state.getOption.orNull
          rows.foreach { e =>
            val h = e.ts.getTime / 1000L / 3600L * 3600L
            if (st == null) st = AnomState(h, 0L, Vector.empty)
            while (st.curHour < h) { // close current + zero-fill skipped
              out ++= closeHour(tpe, st.curHour, st.curN, st.prior)
              st = AnomState(st.curHour + 3600L, 0L,
                (st.prior :+ st.curN).takeRight(6))
            }
            st = st.copy(curN = st.curN + 1L)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** [[anomalyStream]] driven to QUIESCENCE over a bounded event slice —
    * the deterministic final-state projection that puts the streaming tier
    * under the SQL-oracle gate: all events are fed through ONE MemoryStream
    * batch in event-time order (the op's documented in-order contract), the
    * real streaming query (flatMapGroupsWithState, update mode, memory
    * sink) runs to completion, and the closed-hour rows come back as a
    * batch DataFrame. The result is order-insensitive BY CONSTRUCTION here:
    * a single batch hands each type its full sorted slice. Equals the batch
    * `q_anomaly` grid restricted to hours the stream actually closes —
    * every per-type grid hour strictly before that type's final event hour
    * (the in-flight hour never closes; no successor has arrived).
    *
    * Scale note: the driver-side collect is the gate-harness FEED (the
    * bounded events fixture — the PPR-seed query-input contract), not the
    * production path; production is `readStream → anomalyStream →
    * writeStream` unchanged, same plan over a real source. */
  def anomalyClosedHours(events: Dataset[Event]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = events.collect().sortBy(_.ts.getTime)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event]
    val sink = "graft_stream_anomaly_sink"
    spark.catalog.dropTempView(sink)
    val q = anomalyStream(input.toDS()).writeStream
      .format("memory").queryName(sink).outputMode(OutputMode.Update).start()
    val out =
      try {
        input.addData(evs.toIndexedSeq: _*)
        q.processAllAvailable()
        // pin before dropping the sink view (hour stays TimestampType —
        // session TZ is UTC and parquet writes it tz-less, matching the
        // batch q_anomaly dump's arrow shape)
        spark.table(sink)
          .select(col("event_type"), col("hour"), col("n"), col("z"),
            col("anomaly"))
          .localCheckpoint()
      } finally q.stop()
    spark.catalog.dropTempView(sink)
    out
  }

  /** Custom keyed state: running per-user totals via mapGroupsWithState
    * (processing-time timeout; update mode). */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserAgg(userId, n, tot)
          state.update(next)
          next
      }
  }
}
