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
}
