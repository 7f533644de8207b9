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
