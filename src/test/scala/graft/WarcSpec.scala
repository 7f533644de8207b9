package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.annotate.Corpus
import graft.io.Warc

/** WARC source: scalar parser golden cases, serialize→parse round trips
  * (plain and gzipped, in-memory and on-disk), strict-failure behavior,
  * and end-to-end parity with the table-path corpus. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ts(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("parseFile: handcrafted file — skips warcinfo/request, keeps responses") {
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n" +
      "abcd\r\n\r\n").getBytes(UTF_8)
    val req = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: http://x/1\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
      .getBytes(UTF_8)
    val r1 = Warc.recordBytes("http://x/1", ts("2024-01-01T00:00:05Z"),
      "<p>one</p>".getBytes(UTF_8))
    val r2 = Warc.recordBytes("http://x/2", ts("2024-01-01T00:00:09Z"),
      "<p>two</p>".getBytes(UTF_8))
    // four trailing blank CRLF lines (8 bytes) must be tolerated too
    val file = info ++ req ++ r1 ++ r2 ++ "\r\n\r\n\r\n\r\n".getBytes(UTF_8)
    val got = Warc.parseFile(file)
    assert(got.map(_.url) === Seq("http://x/1", "http://x/2"))
    assert(got.map(_.warcTs) ===
      Seq(ts("2024-01-01T00:00:05Z"), ts("2024-01-01T00:00:09Z")))
    assert(got.map(r => new String(r.html, UTF_8)) ===
      Seq("<p>one</p>", "<p>two</p>"))
  }

  test("parseFile: strict on malformed framing") {
    val good = Warc.recordBytes("http://x/1", ts("2024-01-01T00:00:00Z"),
      "<p>a</p>".getBytes(UTF_8))
    // truncated payload
    intercept[IllegalArgumentException] {
      Warc.parseFile(good.dropRight(10))
    }
    // garbage before a record
    intercept[IllegalArgumentException] {
      Warc.parseFile("NOT-WARC\r\n\r\n".getBytes(UTF_8) ++ good)
    }
    // a length that runs past EOF
    val bad = new String(good, UTF_8).replace("Content-Length: ", "Content-Length: 9")
    intercept[IllegalArgumentException] { Warc.parseFile(bad.getBytes(UTF_8)) }
  }

  test("gzipped multi-member file parses identically to plain") {
    val r1 = Warc.recordBytes("http://x/1", ts("2024-01-01T00:00:00Z"),
      "<p>a</p>".getBytes(UTF_8))
    val r2 = Warc.recordBytes("http://x/2", ts("2024-01-01T00:00:01Z"),
      "<p>b</p>".getBytes(UTF_8))
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // per-record gzip members concatenated — the Common-Crawl layout
    val multi = gz(r1) ++ gz(r2)
    assert(Warc.parseFile(multi).map(_.url) ===
      Warc.parseFile(r1 ++ r2).map(_.url))
  }

  test("in-memory round trip: blobs → records == corpus rows") {
    val corpus = Corpus.readDriverDocuments(spark, sfDir).limit(100)
    val blobs = Warc.syntheticBlobs(corpus, buckets = 4)
    assert(blobs.count() === 4)
    val back = Corpus.extract(Warc.recordsFromBlobs(blobs))
      .select("url", "warc_ts", "text")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    val want = Corpus.extract(corpus).select("url", "warc_ts", "text")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(back === want) // byte-identical text through WARC + HTML extraction
  }

  test("distributed sink: executor-streamed files byte-equal the blob builder") {
    // duplicate urls with DIFFERENT record bytes (two captures, one second
    // apart): the sink's (bucket, url, rec) sort must tie-break identically
    // to syntheticBlobs' array_sort(struct(url, rec))
    val base80 = Corpus.readDriverDocuments(spark, sfDir).limit(80)
    val corpus = base80.unionByName(
      base80.limit(10).withColumn("warc_ts",
        col("warc_ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 SECOND")))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-dist").toString
    // 5 buckets hashed into 5 partitions: some task almost surely receives
    // two buckets, exercising the roll-on-bucket-boundary path; the
    // byte-parity assertion below is distribution-independent either way
    Warc.write(corpus, dir, numFiles = 5)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc"))
    assert(files.length === 5)
    val fileBytes = files.map(f =>
      java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSet
    val blobBytes = Warc.syntheticBlobs(corpus, buckets = 5)
      .collect().map(_.getAs[Array[Byte]]("file_bytes").toSeq).toSet
    assert(fileBytes === blobBytes) // same bucketing, same url sort, same bytes
    // empty corpus: directory exists, zero files, no task failure
    val empty = java.nio.file.Files.createTempDirectory("graft-warc-empty").toString + "/out"
    Warc.write(corpus.limit(0), empty, numFiles = 3)
    assert(new java.io.File(empty).isDirectory)
    assert(new java.io.File(empty).listFiles().forall(!_.getName.endsWith(".warc")))
  }

  test("on-disk round trip, plain and gzipped, file-parallel read") {
    val corpus = Corpus.readDriverDocuments(spark, sfDir).limit(60)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toString
    Warc.write(corpus, s"$dir/plain", numFiles = 3)
    Warc.write(corpus, s"$dir/gz", numFiles = 3, gzip = true)
    assert(new java.io.File(s"$dir/plain").list().count(_.endsWith(".warc")) === 3)
    assert(new java.io.File(s"$dir/gz").list().count(_.endsWith(".warc.gz")) === 3)
    val want = corpus.select("url").collect().map(_.getString(0)).toSet
    Seq(s"$dir/plain", s"$dir/gz").foreach { p =>
      val got = Corpus.extract(Warc.read(spark, p))
      assert(got.select("url").collect().map(_.getString(0)).toSet === want, p)
      // null-text rows force the extraction path; text must equal the table's
      val joined = got.withColumnRenamed("text", "warc_text")
        .join(Corpus.extract(corpus), Seq("url"))
        .filter(col("warc_text") =!= col("text"))
      assert(joined.count() === 0, p)
    }
  }
}
