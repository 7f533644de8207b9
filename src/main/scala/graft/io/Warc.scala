package graft.io

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A0 interop: Common-Crawl-style corpora are distributed as WARC files
  * (ISO 28500 — `WARC/1.0` header block, `Content-Length` payload, records
  * concatenated back-to-back), so the at-rest source for the web-page input
  * table is a WARC reader that yields exactly the canonical corpus shape
  * `(url, warc_ts, html, text=NULL, lang=NULL)` — null `text`, so
  * [[graft.annotate.Corpus.extract]] pays the HTML extraction on every row,
  * the same path a real crawl ingest takes.
  *
  * Scale shape: WARC records are NOT line-splittable (binary payloads with
  * declared lengths), so the unit of parallelism is the FILE — which is the
  * public Common-Crawl processing convention anyway: the crawl ships as
  * ~1 GB-gzipped segment files, tens of thousands per snapshot, and one
  * task per file saturates a 1000-executor cluster without any splitting.
  * Per-record gzip members (the CC on-disk format) decompress as one
  * multi-member stream. The parser is scalar Scala shared verbatim with the
  * specs (single-source-of-truth, like [[NTriples.parseLine]]); the typed
  * `flatMap` is the justified non-builtin exception because length-prefixed
  * binary framing is not expressible as a builtin-function chain.
  */
object Warc {

  /** One extracted response record (canonical corpus row, pre-extraction). */
  final case class WarcRecord(url: String, warcTs: java.sql.Timestamp,
                              html: Array[Byte])

  // ---- scalar record builder (single source of truth) --------------------

  private val WarcDateFmt = java.time.format.DateTimeFormatter.ISO_INSTANT

  /** Serialize ONE response record: WARC header block + HTTP/1.1 response
    * payload carrying `html` as the body. `Content-Length` covers the whole
    * HTTP block, per the spec. */
  def recordBytes(url: String, warcTs: java.sql.Timestamp,
                  html: Array[Byte]): Array[Byte] = {
    // fail with the offending row's identity, not an NPE deep in a task
    require(url != null, "WARC record with null url")
    require(warcTs != null, s"WARC record for $url with null warc_ts")
    require(html != null, s"WARC record for $url with null html AND null text")
    val httpHead =
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"
        .getBytes(UTF_8)
    val payloadLen = httpHead.length + html.length
    val date = WarcDateFmt.format(warcTs.toInstant)
    // WARC-Record-ID is mandatory (ISO 28500); name-derived UUID keeps the
    // no-wall-clock determinism contract
    val rid = java.util.UUID.nameUUIDFromBytes(url.getBytes(UTF_8))
    val head =
      (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:$rid>\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"WARC-Date: $date\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: $payloadLen\r\n\r\n").getBytes(UTF_8)
    val out = new Array[Byte](head.length + payloadLen + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(httpHead, 0, out, head.length, httpHead.length)
    System.arraycopy(html, 0, out, head.length + httpHead.length, html.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  // ---- scalar file parser (single source of truth) -----------------------

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream consumes concatenated members (the CC record-per-
    // member layout) as one stream
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse one WARC file (plain or gzipped): response records become
    * [[WarcRecord]]s (HTTP body = the page bytes); warcinfo / request /
    * metadata records are framing, skipped by Content-Length. STRICT on
    * malformed framing — a corrupt segment file should fail the ingest
    * loudly, not silently drop pages ([[NTriples.statements]] rationale;
    * permissive web-scale callers wrap per-file try/catch and count). */
  def parseFile(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    def fail(msg: String) =
      throw new IllegalArgumentException(s"bad WARC framing: $msg")
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < bytes.length && !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 >= bytes.length) fail(s"unterminated header line at $from")
      j
    }
    while (i < bytes.length) {
      // tolerate any run of trailing CRLF blank lines (writers vary), then
      // either EOF or another record — never a partial line
      while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n') i += 2
      if (i < bytes.length) {
        val e0 = lineEnd(i)
        val version = new String(bytes, i, e0 - i, UTF_8)
        if (!version.startsWith("WARC/")) fail(s"expected WARC/x.y at $i, got '$version'")
        i = e0 + 2
        var warcType: String = null; var uri: String = null
        var date: String = null; var contentLength = -1L
        var headerDone = false
        while (!headerDone) {
          val e = lineEnd(i)
          if (e == i) { headerDone = true; i += 2 } // blank line
          else {
            val line = new String(bytes, i, e - i, UTF_8)
            val sep = line.indexOf(':')
            if (sep < 0) fail(s"header without ':' — '$line'")
            // Locale.ROOT: a Turkish-default-locale JVM lowercases 'I' to
            // dotless 'ı', which would break WARC-Target-URI matching
            val name = line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT)
            val value = line.substring(sep + 1).trim
            name match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-date" => date = value
              case "content-length" => contentLength = value.toLong
              case _ => () // other headers are legal and ignored
            }
            i = e + 2
          }
        }
        if (contentLength < 0) fail("missing Content-Length")
        if (i + contentLength > bytes.length) fail("payload past end of file")
        if (warcType == "response") {
          if (uri == null) fail("response record without WARC-Target-URI")
          if (date == null) fail("response record without WARC-Date")
          // HTTP body starts after the first CRLFCRLF inside the payload
          var b = i
          val limit = i + contentLength.toInt - 3
          while (b < limit && !(bytes(b) == '\r' && bytes(b + 1) == '\n'
            && bytes(b + 2) == '\r' && bytes(b + 3) == '\n')) b += 1
          if (b >= limit) fail(s"no HTTP header/body separator in payload at $i")
          val bodyStart = b + 4
          val body = java.util.Arrays.copyOfRange(
            bytes, bodyStart, i + contentLength.toInt)
          val ts = java.sql.Timestamp.from(java.time.Instant.parse(date))
          out += WarcRecord(uri, ts, body)
        }
        i += contentLength.toInt
        // the spec's record separator: exactly two CRLFs
        if (i + 4 <= bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n'
          && bytes(i + 2) == '\r' && bytes(i + 3) == '\n') i += 4
        else if (i != bytes.length) fail(s"missing record separator at $i")
      }
    }
    out.result()
  }

  // ---- Dataset source ----------------------------------------------------

  /** Read a directory of `.warc` / `.warc.gz` files into the canonical
    * corpus shape. File-level parallelism (see class doc); `binaryFile`
    * prunes to `content` only when selected, and each task parses its file
    * independently — zero shuffles. */
  /** Shared parse → canonical-corpus-shape step for [[read]] and
    * [[recordsFromBlobs]] — ONE definition of the output schema. */
  private def toCorpus(files: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.flatMap(parseFile)
      .toDF("url", "warc_ts", "html")
      .select(col("url"), col("warc_ts"), col("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    toCorpus(spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]])
  }

  // ---- synthesis / sink (deterministic, for tests + benchmarks) ----------

  /** Deterministic HTML wrap for synthesizing page bytes from bare text
    * (no metacharacter escaping — the driver corpus is plain word soup, so
    * [[graft.annotate.Corpus.htmlToText]] inverts this exactly). */
  def wrapHtml(text: Column): Column =
    concat(lit("<html><body><p>"), text, lit("</p></body></html>"))
      .cast("binary")

  private val recordUdf =
    udf((url: String, ts: java.sql.Timestamp, html: Array[Byte]) =>
      recordBytes(url, ts, html))

  /** Linear binary concat: size the output once, arraycopy each record —
    * a fold with `concat(acc, x)` recopies the whole accumulated blob per
    * step (O(B²) bytes for a B-byte file; ruinous at the ~1 GB-file scale
    * this synthesizes for). */
  private val concatBlobUdf = udf((recs: Seq[Array[Byte]]) => {
    val out = new Array[Byte](recs.iterator.map(_.length).sum)
    var off = 0
    recs.foreach { r => System.arraycopy(r, 0, out, off, r.length); off += r.length }
    out
  })

  /** Canonical corpus → per-bucket WARC file blobs (column `file_bytes`),
    * `xxhash64(url) % buckets` records per blob, url-sorted within the
    * blob — fully deterministic. Rows with null `html` get [[wrapHtml]]'d
    * `text` as the page bytes. */
  def syntheticBlobs(corpus: DataFrame, buckets: Int): DataFrame = {
    val rec = recordUdf(col("url"), col("warc_ts"),
      coalesce(col("html"), wrapHtml(col("text"))))
    corpus
      .select(pmod(xxhash64(col("url")), lit(buckets.toLong)).as("bucket"),
        col("url"), rec.as("rec"))
      .groupBy("bucket")
      .agg(concatBlobUdf(
        transform(array_sort(collect_list(struct(col("url"), col("rec")))),
          s => s.getField("rec"))).as("file_bytes"))
      .select("file_bytes")
  }

  /** Parse a DataFrame of WARC file blobs back to the canonical corpus
    * shape — the in-memory form of [[read]] (same parser). */
  def recordsFromBlobs(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    toCorpus(blobs.select(col("file_bytes")).as[Array[Byte]])
  }

  /** Write the corpus as one WARC file per NON-EMPTY bucket under `dir`
    * (`xxhash64(url) % numFiles` bucketing, url-sorted within a file —
    * byte-identical file contents to [[syntheticBlobs]]' blobs, which the
    * round-trip spec pins).
    *
    * DISTRIBUTED: records are repartitioned by bucket and STREAMED to the
    * target filesystem from the executors through the Hadoop FileSystem API
    * (local FS here; HDFS/object store on a cluster — executors resolve the
    * scheme from their own Hadoop conf). Task memory holds ONE record at a
    * time — never a whole file blob — and nothing is collected to the
    * driver (the previous form drove every blob through a driver
    * `collect()`: an OOM at the ~1 GB-file × thousands-of-files scale WARC
    * exists for). A task that receives several buckets (hash collision at
    * small `numFiles`) rolls to a new file on the bucket boundary of the
    * (bucket, url)-sorted stream, so the file-per-bucket contract holds for
    * ANY hash→partition distribution. */
  def write(corpus: DataFrame, dir: String, numFiles: Int,
            gzip: Boolean = false): Unit = {
    val sess = corpus.sparkSession
    // the SESSION's Hadoop conf must reach the executors (spark.hadoop.*
    // credentials/endpoints are not in a bare `new Configuration()`)
    val confSer = new org.apache.spark.sql.GraftShim.SerializableHadoopConf(
      sess.sparkContext.hadoopConfiguration)
    // driver-side mkdir so an EMPTY corpus still yields the directory
    val base = new org.apache.hadoop.fs.Path(dir)
    base.getFileSystem(confSer.value).mkdirs(base)
    val ext = if (gzip) "warc.gz" else "warc"
    val rec = recordUdf(col("url"), col("warc_ts"),
      coalesce(col("html"), wrapHtml(col("text"))))
    corpus
      .select(pmod(xxhash64(col("url")), lit(numFiles.toLong)).as("bucket"),
        col("url"), rec.as("rec"))
      .repartition(numFiles, col("bucket"))
      // rec in the sort keys: duplicate urls (multiple captures) would
      // otherwise leave equal-url record order up to shuffle arrival —
      // syntheticBlobs' array_sort(struct(url, rec)) tie-breaks the same way
      .sortWithinPartitions(col("bucket"), col("url"), col("rec"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(confSer.value)
          val basePath = new org.apache.hadoop.fs.Path(dir)
          // write-to-temp + rename-on-close: concurrent/speculative attempts
          // of this partition each stream into their OWN attempt-suffixed
          // temp file; the rename is the atomic commit (the loser of a
          // rename race just deletes its temp) — no interleaved bytes, and
          // a failed attempt leaves only a .inprogress file readers skip
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          var cur = -1L
          var out: java.io.OutputStream = null
          var tmp: org.apache.hadoop.fs.Path = null
          var fin: org.apache.hadoop.fs.Path = null
          def commit(): Unit = if (out != null) {
            out.close(); out = null
            if (!fs.rename(tmp, fin)) { // another attempt already committed
              fs.delete(tmp, false)
            }
          }
          try {
            it.foreach { r =>
              val b = r.getLong(0)
              if (b != cur) { // roll on bucket boundary
                commit()
                fin = new org.apache.hadoop.fs.Path(basePath, f"part-$b%05d.$ext")
                tmp = new org.apache.hadoop.fs.Path(basePath,
                  f".part-$b%05d.$ext.inprogress-$attempt")
                val raw = fs.create(tmp, true)
                out = if (gzip)
                  new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
                else raw
                cur = b
              }
              out.write(r.getAs[Array[Byte]](2))
            }
            commit()
          } finally if (out != null) { // failed attempt: close + drop temp
            out.close()
            fs.delete(tmp, false)
          }
        }
      }
  }
}
