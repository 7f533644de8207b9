package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dict.AnnotatorModel

/** D9's blue/green dictionary swap lifted to a RUNNING stream: the reference
  * rebuilds its term cache on the inactive side and atomically flips a
  * "current instance" pointer with zero request downtime. The streaming
  * equivalent: a continuous annotate whose dictionary pointer is re-resolved
  * at every microbatch boundary.
  *
  * Mechanics: `foreachBatch` plans each microbatch FRESH, so the closure
  * reads the [[LiveDict]] pointer at batch-plan time and captures whichever
  * broadcast is current. In-flight batches finish on the version they
  * started with — exactly the reference's contract (requests already routed
  * to blue complete on blue; new requests hit green). Swapping costs
  * nothing on the hot path: no stream restart, no state migration (the scan
  * is stateless), and the old broadcast becomes garbage once its last batch
  * completes. Every output row carries `dict_version` for lineage, so
  * downstream consumers can tell which dictionary produced which triples —
  * the same per-partition lineage story as the batch pipeline (A13).
  *
  * At cluster scale the pointer is [[graft.dict.DictVersioning]]'s atomic
  * manifest re-read in the `foreachBatch` callback (the driver-side read is
  * one tiny file per batch); the in-memory [[AtomicReference]] here is the
  * same semantics minus the filesystem.
  */
object DictSwapStream {

  /** The live "current dictionary" pointer — blue/green's switchable side. */
  final class LiveDict(initial: Broadcast[AnnotatorModel]) {
    private val ref = new AtomicReference(initial)
    /** Atomic flip to the freshly built side; next microbatch picks it up. */
    def swap(next: Broadcast[AnnotatorModel]): Unit = ref.set(next)
    def current: Broadcast[AnnotatorModel] = ref.get
  }

  /** Start a streaming annotate over a (url, text) stream. Each microbatch
    * annotates with the pointer's current dictionary (native Generator scan
    * — the same zero-shuffle plan as batch) and hands the result, tagged
    * with `dict_version`, to `sink`. */
  def start(stream: DataFrame, live: LiveDict,
            sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val m = live.current // resolved at batch-plan time, not stream start
        val annotated = graft.annotate.NativeAnnotate
          .annotateMatches(batch, m)
          .withColumn("dict_version", lit(m.value.version))
        sink(annotated, batchId)
      }
      .start()

  /** The fully-deployed shape: follow [[graft.dict.DictVersioning]]'s
    * ON-DISK blue/green manifest. Each microbatch re-reads the pointer file
    * (one tiny driver-side read); when the active version changes, the new
    * snapshot is loaded, compiled, and broadcast ONCE, then reused until the
    * next flip. The offline rebuild job writes + activates snapshots; the
    * stream needs no coordination with it beyond the atomic manifest rename.
    * (The compile happens inside the first post-flip microbatch; to hide
    * even that latency, prebuild the broadcast and use [[LiveDict]]/
    * [[start]] instead — both shapes are supported.) */
  /** [[startFollowingManifest]] composed with [[graft.annotate.Incremental]]:
    * a RUNNING stream that reacts to an on-disk dictionary flip by
    * re-annotating ONLY the already-emitted docs the v1→v2 delta can affect
    * — not everything seen so far (that is the flip's whole cost model: a
    * synonym tweak must not replay a 10^12-doc history).
    *
    * State (the A13 sink shape, parquet under `storeDir`, executor-side
    * writes): every batch appends its raw docs to `corpus/` and its emitted
    * match rows to the CURRENT `matches/epoch=N/`. On a version flip,
    * detected at the microbatch boundary:
    *
    *  1. the two snapshots' flat dicts diff into a [[Incremental.DictUpdate]]
    *     (ontology-scale — tiny);
    *  2. `affected` = [[Incremental.affectedUrls]] over the persisted corpus
    *     + match stream (removed leg: broadcast semi-join against the
    *     matches; added leg: an added-terms-only automaton scan);
    *  3. corrections = a fresh v2 scan of ONLY the affected docs;
    *  4. the corrected full match state — unaffected rows re-stamped to v2
    *     (their content is identical under v2) plus the corrections — is
    *     written as `epoch=N+1` and `onSwap(affected, corrections, v2)`
    *     fires so the sink can retract/install. The epoch rewrite is the
    *     plain-parquet stand-in for an Iceberg MERGE (row-level deletes) —
    *     the same seam as [[graft.io.TableIO]].
    *
    * Post-flip batches annotate under v2 as usual. In-flight batches finish
    * on the version they started with (the blue/green contract). */
  def startIncrementalFollowingManifest(
      stream: DataFrame, versionsDir: String, storeDir: String,
      sink: (DataFrame, Long) => Unit,
      onSwap: (DataFrame, DataFrame, String) => Unit): StreamingQuery = {
    import graft.dict.{AutomatonBuild, DictBuild, DictVersioning}
    import graft.annotate.{Incremental, NativeAnnotate}
    import org.apache.hadoop.fs.Path
    // foreachBatch callbacks run sequentially on the query thread — the
    // cache slot needs no synchronization. (epoch, version) additionally
    // persist to $storeDir/state (temp + atomic rename, the DictVersioning
    // manifest pattern), so a RESTARTED query resumes at the right epoch
    // and detects a flip that happened during downtime instead of silently
    // appending v2 rows into stale v1 state.
    var cached: Option[(String, Broadcast[AnnotatorModel])] = None
    var epoch = -1 // lazily recovered from the state file on first batch
    def fs(spark: org.apache.spark.sql.SparkSession) =
      new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readState(spark: org.apache.spark.sql.SparkSession): Option[(Int, String)] = {
      val f = fs(spark); val p = new Path(s"$storeDir/state")
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        val Array(e, ver) = s.split(" ", 2)
        Some((e.toInt, ver))
      }
    }
    def writeState(spark: org.apache.spark.sql.SparkSession, e: Int, ver: String): Unit = {
      val f = fs(spark)
      val tmp = new Path(s"$storeDir/.state.tmp")
      val out = f.create(tmp, true)
      out.write(s"$e $ver".getBytes("UTF-8")); out.close()
      f.delete(new Path(s"$storeDir/state"), false)
      require(f.rename(tmp, new Path(s"$storeDir/state")),
        s"state rename failed under $storeDir")
    }
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val v = DictVersioning.currentVersion(versionsDir).getOrElse(
          sys.error(s"no active dictionary version under $versionsDir"))
        // recover (epoch, last-seen version) across restarts
        val prevVersion: Option[String] = cached.map(_._1).orElse {
          readState(spark).map { case (e, ver) => epoch = e; ver }
        }
        if (epoch < 0) epoch = 0
        val m = cached match {
          case Some((cv, b)) if cv == v => b
          case _ =>
            val dict = spark.read.parquet(DictVersioning.versionPath(versionsDir, v))
            val b = AutomatonBuild.broadcastModel(spark,
              AutomatonBuild.build(spark, dict, v))
            cached = Some((v, b))
            b
        }
        prevVersion match {
          case Some(pv) if pv != v && fs(spark).exists(new Path(s"$storeDir/corpus")) =>
            val flatOf = (ver: String) => DictBuild.flatDict(
              spark.read.parquet(DictVersioning.versionPath(versionsDir, ver)))
            val upd = Incremental.diff(flatOf(pv), flatOf(v))
            val corpus = spark.read.parquet(s"$storeDir/corpus")
              .select(col("url"), col("text"))
            val matches = spark.read.parquet(s"$storeDir/matches/epoch=$epoch")
              .drop("dict_version", "src")
            // persisted: the epoch write below AND the onSwap callback both
            // consume these — without the pin each action would re-run the
            // full corpus scan + annotate join (review finding r4)
            val affected = Incremental.affectedUrls(spark, corpus, matches, upd)
              .persist()
            val re = NativeAnnotate
              .annotateMatches(corpus.join(affected, Seq("url"), "left_semi"), m)
              .persist()
            try {
              val corrected = matches.join(affected, Seq("url"), "left_anti")
                .unionByName(re)
                .withColumn("dict_version", lit(v))
              corrected.write.mode("overwrite")
                .parquet(s"$storeDir/matches/epoch=${epoch + 1}/src=base")
              epoch += 1
              writeState(spark, epoch, v)
              onSwap(affected, re.withColumn("dict_version", lit(v)), v)
            } finally { affected.unpersist(false); re.unpersist(false) }
          case _ => ()
        }
        val annotated = NativeAnnotate.annotateMatches(batch, m)
          .withColumn("dict_version", lit(v))
        // batchId-keyed subdirs + overwrite = IDEMPOTENT under foreachBatch's
        // at-least-once retries (a replayed batch rewrites its own output
        // instead of appending duplicates)
        batch.select(col("url"), col("text")).write.mode("overwrite")
          .parquet(s"$storeDir/corpus/batch=$batchId")
        annotated.write.mode("overwrite")
          .parquet(s"$storeDir/matches/epoch=$epoch/src=b$batchId")
        writeState(spark, epoch, v)
        sink(annotated, batchId)
      }
      .start()
  }

  def startFollowingManifest(stream: DataFrame, versionsDir: String,
                             sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import graft.dict.{AutomatonBuild, DictVersioning}
    // foreachBatch callbacks run sequentially on the query thread, so the
    // single-slot (version -> broadcast) cache needs no synchronization
    var cached: Option[(String, Broadcast[AnnotatorModel])] = None
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val v = DictVersioning.currentVersion(versionsDir).getOrElse(
          sys.error(s"no active dictionary version under $versionsDir"))
        val m = cached match {
          case Some((cv, b)) if cv == v => b
          case _ =>
            val dict = spark.read.parquet(DictVersioning.versionPath(versionsDir, v))
            val b = AutomatonBuild.broadcastModel(spark,
              AutomatonBuild.build(spark, dict, v))
            cached = Some((v, b))
            b
        }
        val annotated = graft.annotate.NativeAnnotate
          .annotateMatches(batch, m)
          .withColumn("dict_version", lit(v))
        sink(annotated, batchId)
      }
      .start()
  }
}
