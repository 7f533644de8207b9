package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. (Builder-brief extra — not in the reference,
  * SURVEY.md §3.4.) The Spark side — schema, partition-friendly batch
  * shape, typed mapPartitions signatures — is real and tested; the actual
  * codec calls are STUBBED with deterministic fakes (this container has no
  * image/audio libraries), clearly marked below. On a cluster, swap
  * [[decodeImageStub]] / [[sampleFramesStub]] for real codec calls without
  * touching the surrounding plumbing.
  */
object Multimodal {

  case class MediaRow(url: String, kind: String, bytes: Array[Byte])
  case class MediaFeature(url: String, kind: String, n_bytes: Long,
                          checksum: Long, width: Int, height: Int)
  case class Frame(url: String, frame_idx: Int, frame_bytes: Array[Byte])

  /** Synthesize a media table from the documents corpus (text bytes stand in
    * for encoded media) — deterministic test fixture, kind cycles by doc_id. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val kinds = Seq("image", "audio", "video")
    docs.select(
      concat(lit("doc://"), col("doc_id")).as("url"),
      element_at(
        array(kinds.map(lit): _*),
        (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))
  }

  // ==== STUB: real decoder goes here =====================================
  // A production build calls an image codec (e.g. javax.imageio / ffmpeg
  // bindings) on `bytes`. Deterministic fake: dimensions derived from the
  // byte length, checksum = rolling hash. Same per-partition amortized shape
  // as a real decoder (expensive init once per partition).
  def decodeImageStub(bytes: Array[Byte]): (Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (16 + n % 64, 16 + (n / 64) % 64)
  }
  // =======================================================================

  /** Feature extraction via typed mapPartitions — the decoder (stub) is
    * invoked once per row, codec init amortized per partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col("kind"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        // per-partition codec init would happen here (amortized)
        it.map { m =>
          val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
          val (w, h) = decodeImageStub(bytes)
          val checksum = {
            var acc = 1125899906842597L
            var i = 0
            while (i < bytes.length) { acc = acc * 131 + bytes(i); i += 1 }
            acc
          }
          MediaFeature(m.url, m.kind, bytes.length.toLong, checksum, w, h)
        }
      }
  }

  // ==== STUB: real frame sampler goes here ===============================
  /** Deterministic fake frame sampling: every `stride` bytes, a 64-byte
    * "frame". Real impl: keyframe extraction via a video codec. */
  def sampleFramesStub(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
    if (bytes == null || bytes.isEmpty) Nil
    else bytes.grouped(stride).map(_.take(64)).toSeq
  // =======================================================================

  case class Resized(url: String, kind: String, width: Int, height: Int,
                     resized_bytes: Array[Byte])

  // ==== STUB: real resize goes here ======================================
  /** Deterministic fake resize: byte budget w×h, strided downsample of the
    * source bytes (shape-preserving: output length == w*h unless source is
    * smaller). Real impl: codec decode → bilinear resample → re-encode. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = if (bytes == null) Array.emptyByteArray else bytes
    val target = w * h
    if (src.length <= target) src
    else {
      val out = new Array[Byte](target)
      val stride = src.length.toDouble / target
      var i = 0
      while (i < target) { out(i) = src((i * stride).toInt); i += 1 }
      out
    }
  }
  // =======================================================================

  /** Image resize over binary media rows — typed mapPartitions so a real
    * codec's init cost amortizes per partition; output schema carries the
    * target dimensions alongside the resized payload. */
  def resizeImages(media: DataFrame, w: Int = 64, h: Int = 64): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("url"), col("kind"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        it.map(m => Resized(m.url, m.kind, w, h, resizeStub(m.bytes, w, h)))
      }
  }

  /** Frame sampling for video rows — one output row per sampled frame
    * (explode-shaped flatMap; batch shape matches a real sampler). */
  def sampleFrames(media: DataFrame, stride: Int = 256): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("url"), col("kind"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { m =>
          sampleFramesStub(m.bytes, stride).zipWithIndex.map { case (f, i) =>
            Frame(m.url, i, f)
          }
        }
      }
  }
}
