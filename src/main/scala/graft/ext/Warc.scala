package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] WARC ingestion — the container web crawls actually ship in
  * (ISO 28500; Common Crawl's native format). A crawl-scale training
  * pipeline starts HERE: WARC files in, (url, payload) out, composing
  * with [[HtmlText]] (markup -> prose), [[UrlOps]] (canonical dedup
  * key), and the rest of the curation surface.
  *
  * Format notes (all public spec):
  *  - a WARC file is a sequence of records: `WARC/1.0` version line,
  *    `Name: value` headers (case-insensitive), CRLF CRLF, exactly
  *    `Content-Length` payload bytes, CRLF CRLF;
  *  - crawl archives gzip EACH RECORD as its own member and concatenate
  *    (so HTTP-range readers can seek); `java.util.zip.GZIPInputStream`
  *    reads concatenated members natively, so one stream decodes the
  *    whole file;
  *  - a `response` record's payload is the captured HTTP response —
  *    status line + headers + body; chunked transfer encoding is
  *    decoded here (hex sizes, optional `;ext`), anything else rides
  *    raw.
  *
  * Loud contract (the [[FlacCodec]]/[[TelephonyAudio]] idiom): a blob
  * that declares itself WARC and fails structurally (no version line,
  * missing/oversized Content-Length, torn record, malformed chunking)
  * REFUSES with IllegalArgumentException — a half-parsed crawl shard
  * silently shipping fewer documents is the worst failure mode a corpus
  * build has.
  *
  * Scale story (r19): one task per WARC file (the natural unit; crawl
  * shards are sized ~1 GB precisely so that a file is a work unit) —
  * but tasks receive PATHS and stream each shard through
  * `FileSystem.open`, so per-task memory is one 64 KB buffer + one
  * in-flight record, never the compressed shard and never its
  * inflation. flatMap to records, zero shuffle; parallelism == file
  * count, so shard the crawl into enough files upstream.
  */
object Warc {

  /** One parsed record. `headers` carries EVERY `Name: value` header
    * (names lowercased, first occurrence wins) — `warcType`/
    * `targetUri`/`contentType` are the hot three lifted out; consumers
    * checking ISO 28500 mandatories (`warc-date`, `warc-record-id`)
    * read the map.
    */
  final case class WarcRecord(warcType: String, targetUri: String,
                              contentType: String, body: Array[Byte],
                              headers: Map[String, String] = Map.empty)

  // ---------------------------------------------------------------------
  // Byte-level parse
  // ---------------------------------------------------------------------

  /** STREAMING record iterator over a WARC stream (gzipped — single or
    * concatenated members — or plain): memory is one record at a time,
    * never the decompressed shard (a 1 GB .warc.gz inflates several-fold
    * — materializing it per task is the difference between "one task
    * per shard" scaling and an executor OOM). Loud on structural
    * damage, including EOF inside a record. The caller's iteration
    * drives the read; exhaust or abandon the iterator freely (byte
    * array sources hold no OS resources).
    */
  def records(input: java.io.InputStream): Iterator[WarcRecord] =
    recordsOver(wrapStream(input))

  /** The decode chain [[records]] reads through: gzip sniff (single or
    * concatenated members) + buffering. Exposed separately so the
    * task-side readers can register the WHOLE chain — the gzip
    * member's native Inflater included — on task completion; closing
    * only the raw file stream would leave an abandoned iterator's
    * Inflater to the GC.
    */
  private def wrapStream(input: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(input, 2)
    val h0 = pb.read()
    val h1 = if (h0 < 0) -1 else pb.read()
    if (h1 >= 0) pb.unread(h1)
    if (h0 >= 0) pb.unread(h0)
    val base: java.io.InputStream =
      if (h0 == 0x1F && h1 == 0x8B)
        try new java.util.zip.GZIPInputStream(pb, 64 * 1024)
        catch {
          case e: java.io.IOException => throw new IllegalArgumentException(
            s"WARC: gzip stream is damaged (${e.getMessage})")
        }
      else pb
    new java.io.BufferedInputStream(base, 64 * 1024)
  }

  private def recordsOver(in: java.io.InputStream): Iterator[WarcRecord] = {
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false
      private var offset = 0L // bytes of DECOMPRESSED stream consumed

      private def readByte(): Int = {
        val b = try in.read()
        catch {
          case e: java.io.IOException => throw new IllegalArgumentException(
            s"WARC: gzip stream is damaged near offset $offset (${e.getMessage})")
        }
        if (b >= 0) offset += 1
        b
      }

      private def closeQuietly(): Unit =
        try in.close() catch { case _: java.io.IOException => () }

      private def advance(): Unit =
        try advanceInner()
        catch { case t: Throwable => done = true; closeQuietly(); throw t }

      // the gzip member holds a native Inflater: release it at EOF (and
      // on failure above) rather than waiting on GC — 100k shards per
      // executor would otherwise pool native memory
      private def advanceInner(): Unit = {
        if (done || nextRec != null) return
        // skip inter-record CRLFs
        var b = readByte()
        while (b == '\r' || b == '\n') b = readByte()
        if (b < 0) { done = true; closeQuietly(); return }
        val at = offset - 1
        // header block: everything up to CRLFCRLF (version line first)
        val head = new java.io.ByteArrayOutputStream(256)
        head.write(b)
        var tail = 0 // how much of \r\n\r\n is matched
        while (tail < 4) {
          val c = readByte()
          require(c >= 0, s"WARC: record at offset $at has no header " +
            "terminator (CRLFCRLF) — torn shard")
          require(head.size < (1 << 20),
            s"WARC: record at offset $at has a >1 MiB header block")
          head.write(c)
          tail =
            if (c == '\r') { if (tail == 0 || tail == 2) tail + 1 else 1 }
            else if (c == '\n') { if (tail == 1 || tail == 3) tail + 1 else 0 }
            else 0
        }
        val headBytes = head.toByteArray
        require(headBytes.length >= 5 && headBytes(0) == 'W' &&
          headBytes(1) == 'A' && headBytes(2) == 'R' && headBytes(3) == 'C' &&
          headBytes(4) == '/',
          s"WARC: record at offset $at does not start with a WARC/ version line")
        val headers = parseHeaders(headBytes, 0, headBytes.length - 4)
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"WARC: record at offset $at has no Content-Length"))
        val bodyLen =
          try java.lang.Long.parseLong(len.trim)
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"WARC: record at offset $at has non-numeric Content-Length '$len'")
          }
        require(bodyLen >= 0 && bodyLen <= Int.MaxValue - 8,
          s"WARC: record at offset $at declares $bodyLen payload bytes — " +
            "outside the per-record bound")
        val body = try in.readNBytes(bodyLen.toInt)
        catch {
          case e: java.io.IOException => throw new IllegalArgumentException(
            s"WARC: gzip stream is damaged near offset $offset (${e.getMessage})")
        }
        offset += body.length
        require(body.length == bodyLen,
          s"WARC: record at offset $at declares $bodyLen payload bytes but " +
            s"only ${body.length} remain — torn shard")
        nextRec = WarcRecord(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("content-type", ""),
          body,
          headers)
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("WARC iterator")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Parse a whole WARC blob into records — the small-blob convenience
    * over [[records]]; same loud contract.
    */
  def parseAll(bytes: Array[Byte]): Vector[WarcRecord] =
    records(new java.io.ByteArrayInputStream(bytes)).toVector

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** `Name: value` lines between `from` and `to` (exclusive), names
    * lowercased; the version line is skipped.
    */
  private def parseHeaders(b: Array[Byte], from: Int, to: Int): Map[String, String] = {
    val block = new String(b, from, to - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    var m = Map.empty[String, String]
    for (line <- block.split("\r\n").iterator.drop(1)) { // drop WARC/1.x
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        if (name.nonEmpty && !m.contains(name))
          m += name -> line.substring(colon + 1).trim
      }
    }
    m
  }

  /** The HTTP response payload of a `response` record: status line and
    * headers stripped, chunked transfer encoding decoded. Loud on a
    * payload that has no header terminator or malformed chunking.
    */
  def httpBody(raw: Array[Byte]): Array[Byte] = httpBodyAndCharset(raw)._1

  /** [[httpBody]] plus the `charset=` parameter of the Content-Type
    * header (null when undeclared) — the transport hint
    * [[HtmlText.decodeBytes]] consumes.
    */
  def httpBodyAndCharset(raw: Array[Byte]): (Array[Byte], String) = {
    val sep = indexOfCrlfCrlf(raw, 0)
    require(sep >= 0,
      "WARC http payload: no header/body separator (CRLFCRLF)")
    val head = new String(raw, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    val body = java.util.Arrays.copyOfRange(raw, sep + 4, raw.length)
    var chunked = false
    var charset: String = null
    head.split("\r\n").foreach { l =>
      val c = l.indexOf(':')
      if (c > 0) {
        val name = l.substring(0, c).trim
        val value = l.substring(c + 1)
        if (name == "transfer-encoding" && value.contains("chunked"))
          chunked = true
        else if (name == "content-type") {
          // ONE charset= scanner, shared with the meta sniff
          val cs = HtmlText.charsetParam(value)
          if (cs != null) charset = cs
        }
      }
    }
    (if (chunked) decodeChunked(body) else body, charset)
  }

  /** The HTTP status code of a captured response payload (the first
    * line's second token), or -1 when the payload carries no parsable
    * status line — total, for index enrichment over arbitrary crawl
    * records.
    */
  def httpStatus(raw: Array[Byte]): Int = {
    if (raw == null) return -1
    var end = 0
    val n = math.min(raw.length, 256)
    while (end < n && raw(end) != '\r' && raw(end) != '\n') end += 1
    val line = new String(raw, 0, end,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!line.regionMatches(true, 0, "HTTP/", 0, 5)) return -1
    // whitespace-run tokenization: real crawls carry sloppy-server
    // status lines ("HTTP/1.1  200 OK", tab-separated) that a single-
    // space split would turn into a null status
    val parts = line.trim.split("\\s+")
    if (parts.length < 2) return -1
    try {
      val s = Integer.parseInt(parts(1))
      if (s >= 100 && s <= 599) s else -1
    } catch { case _: NumberFormatException => -1 }
  }

  /** The first `name:` header value of a captured HTTP response payload
    * (case-insensitive), or null when the payload has no parsable header
    * block or the header is absent — total, for index enrichment (the
    * `Location` column the redirect resolver keys on). Only the header
    * BLOCK is touched; the body never materializes.
    */
  def httpHeaderOf(raw: Array[Byte], name: String): String = {
    if (raw == null) return null
    val sep = indexOfCrlfCrlf(raw, 0)
    if (sep < 0) return null
    val head = new String(raw, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val want = name.toLowerCase
    head.split("\r\n").iterator.drop(1).foreach { l =>
      val c = l.indexOf(':')
      if (c > 0 && l.substring(0, c).trim.toLowerCase == want)
        return l.substring(c + 1).trim
    }
    null
  }

  private def decodeChunked(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (true) {
      // chunk-size line: hex digits, optional ";ext", CRLF
      val lineEnd = {
        var j = i
        while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
        require(j + 1 < b.length, "chunked body: unterminated size line")
        j
      }
      val line = new String(b, i, lineEnd - i,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val hex = { val semi = line.indexOf(';')
        (if (semi >= 0) line.substring(0, semi) else line).trim }
      val size =
        try java.lang.Long.parseLong(hex, 16)
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"chunked body: bad chunk size '$hex'")
        }
      require(size >= 0, s"chunked body: negative chunk size $size")
      val dataStart = lineEnd + 2
      if (size == 0) return out.toByteArray // trailers ignored
      require(dataStart + size + 2 <= b.length,
        s"chunked body: chunk of $size bytes exceeds the payload")
      out.write(b, dataStart, size.toInt)
      require(b(dataStart + size.toInt) == '\r' &&
        b(dataStart + size.toInt + 1) == '\n',
        "chunked body: chunk data not CRLF-terminated")
      i = dataStart + size.toInt + 2
    }
    out.toByteArray // unreachable
  }

  // ---------------------------------------------------------------------
  // Writing (fixture + export primitive)
  // ---------------------------------------------------------------------

  /** The fixed instant the no-date [[writeRecord]] overload stamps —
    * byte-determinism demands SOME constant; exporters that ship to
    * external WET consumers pass the real capture/export instant
    * explicitly (ISO 28500 §5.4: WARC-Date is the record's
    * "creation... or capture" time, which only the caller knows).
    */
  val DefaultExportInstant: java.time.Instant =
    java.time.Instant.parse("2000-01-01T00:00:00Z")

  private val warcDateFmt = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  /** The deterministic WARC-Record-ID of a record's identity bytes:
    * content-derived (`urn:sha256:<hex over targetUri NUL body>`), so a
    * re-export of the same frame writes the same ids — the
    * content-addressable delivery contract ([[graft.ops.WarcExport]]).
    */
  def recordIdFor(targetUri: String, body: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(targetUri.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(body)
    "urn:sha256:" + md.digest().map("%02x".format(_)).mkString
  }

  /** Serialize one record: WARC/1.0 with the ISO 28500 §5.2-5.4
    * MANDATORY headers — WARC-Record-ID (content-derived, see
    * [[recordIdFor]], unless a caller-supplied `recordId` overrides)
    * and WARC-Date (from the caller-passed `date` instant, second
    * precision — never a wall clock, so identical inputs write
    * identical bytes) — plus exact Content-Length framing.
    */
  def writeRecord(warcType: String, targetUri: String, contentType: String,
                  body: Array[Byte], date: java.time.Instant,
                  recordId: String): Array[Byte] =
    writeRecord(warcType, targetUri, contentType, body, date, recordId, Nil)

  /** [[writeRecord]] with additional WARC named headers (e.g. the
    * `WARC-Payload-Digest` / `WARC-Refers-To` pair a `revisit` record
    * carries — ISO 28500 §6.7.2); emitted in the given order after the
    * mandatory block, before Content-Length.
    */
  def writeRecord(warcType: String, targetUri: String, contentType: String,
                  body: Array[Byte], date: java.time.Instant,
                  recordId: String,
                  extraHeaders: Seq[(String, String)]): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append("WARC-Type: ").append(warcType).append("\r\n")
    h.append("WARC-Record-ID: <")
      .append(if (recordId != null) recordId else recordIdFor(targetUri, body))
      .append(">\r\n")
    h.append("WARC-Date: ").append(warcDateFmt.format(date)).append("\r\n")
    if (targetUri.nonEmpty)
      h.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    if (contentType.nonEmpty)
      h.append("Content-Type: ").append(contentType).append("\r\n")
    extraHeaders.foreach { case (n, v) =>
      h.append(n).append(": ").append(v).append("\r\n")
    }
    h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
    val head = h.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** [[writeRecord]] at [[DefaultExportInstant]] with the derived
    * record id — the fixture-building convenience.
    */
  def writeRecord(warcType: String, targetUri: String, contentType: String,
                  body: Array[Byte]): Array[Byte] =
    writeRecord(warcType, targetUri, contentType, body,
      DefaultExportInstant, null)

  /** Serialize records to a WARC file blob. `gzipPerRecord` follows the
    * crawl-archive convention: each record its own gzip member,
    * concatenated (seekable by offset); false writes plain WARC.
    */
  def writeWarc(records: Seq[Array[Byte]], gzipPerRecord: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r)
        gz.close() // finishes the member AND frees the Deflater; closing
                   // the underlying ByteArrayOutputStream is a no-op
      } else out.write(r)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // Spark surface
  // ---------------------------------------------------------------------

  /** A Hadoop Configuration flattened to a plain serializable map (the
    * executor-side rebuild idiom [[graft.ops.WarcExport]] uses).
    */
  private[graft] def hadoopConfMap(spark: SparkSession): Map[String, String] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  /** The LISTING side of the streaming readers: `binaryFile` rows
    * pruned to the path column only — the source's reader is
    * projection-aware, so no file CONTENT is ever materialized into the
    * scan (the plan's ReadSchema carries just `path`; `WarcSpec` pins
    * it). Listing parallelism is the file count, same as before.
    * Shared with [[WarcIndex]].
    */
  private[ext] def listPaths(spark: SparkSession, pathGlob: String)
      : org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path")).as[String]
  }

  /** Register `c` to close when the current task completes (no-op off
    * a task), so an abandoned iterator (limit, task kill) never waits
    * on GC to release its resources.
    */
  private def closeOnTaskCompletion(c: java.io.Closeable): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      try c.close() catch { case _: java.io.IOException => () }
    }
  }

  /** Open `path` for streaming read on the executor with a
    * task-completion close of the raw handle. Seek-capable — the
    * [[WarcIndex]] fetch path shares it. Callers layering a decode
    * chain on top register THAT separately ([[openRecords]]).
    */
  private[ext] def openStream(path: String, confMap: Map[String, String])
      : org.apache.hadoop.fs.FSDataInputStream = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    closeOnTaskCompletion(in)
    in
  }

  /** The task-side record iterator: opens `path`, layers the decode
    * chain, and registers the WHOLE chain for task-completion close —
    * so an abandoned iterator frees the gzip member's native Inflater
    * deterministically, not at GC ([[records]] itself still closes at
    * EOF/failure; the listener is a harmless double-close then).
    */
  private def openRecords(path: String, confMap: Map[String, String])
      : Iterator[WarcRecord] = {
    val wrapped = wrapStream(openStream(path, confMap))
    closeOnTaskCompletion(wrapped)
    recordsOver(wrapped)
  }

  /** All records of every WARC file under `pathGlob`:
    * (file, record_idx, warc_type, url, content_type, body). One task
    * per file; a structurally damaged shard fails ITS task loudly.
    *
    * Streaming read (r19): tasks receive PATHS, open each shard
    * through `FileSystem.open`, and feed the stream straight to
    * [[records]] — per-task memory is one 64 KB buffer + one record,
    * never the compressed shard (a `binaryFile` content column would
    * land the whole blob in executor heap; at 1-10 GB crawl shards ×
    * many concurrent tasks that is the difference between "one task
    * per shard" scaling and an OOM).
    */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val confMap = hadoopConfMap(spark)
    listPaths(spark, pathGlob)
      .flatMap { path =>
        openRecords(path, confMap).zipWithIndex.map { case (r, idx) =>
          (path, idx.toLong, r.warcType, r.targetUri, r.contentType, r.body)
        }
      }
      .toDF("file", "record_idx", "warc_type", "url", "content_type", "body")
  }

  /** The crawl-ingestion shape: `response` records only, HTTP framing
    * stripped (chunked decoding included) — (file, url, charset, body)
    * ready for [[HtmlText]] + [[UrlOps]]; `charset` is the Content-Type
    * header's declared charset (null when absent), the transport hint
    * for [[HtmlText.decodeBytes]]. Same streaming read as [[readWarc]]:
    * paths in, one record in memory at a time.
    */
  def readResponses(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val confMap = hadoopConfMap(spark)
    listPaths(spark, pathGlob)
      .flatMap { path =>
        openRecords(path, confMap)
          .filter(_.warcType.equalsIgnoreCase("response"))
          .map { r =>
            val (body, charset) = httpBodyAndCharset(r.body)
            (path, r.targetUri, charset, body)
          }
      }
      .toDF("file", "url", "charset", "body")
  }

  /** Structured Streaming form of [[readResponses]] for a crawl
    * LANDING directory: shards stream in as they arrive (the
    * `binaryFile` file source tracks seen files in the checkpoint; the
    * scan prunes to the path column, so no shard blob rides the
    * source), each opened and record-streamed executor-side exactly
    * like the batch path. Composes with the curation surface
    * downstream — e.g. [[StreamingDedup]] for continuous near-dup
    * screening of a live crawl. `maxFilesPerTrigger` bounds a
    * micro-batch to that many shards (0 = leave the source default).
    */
  def readResponsesStream(spark: SparkSession, pathGlob: String,
                          maxFilesPerTrigger: Int = 0): DataFrame = {
    import spark.implicits._
    val confMap = hadoopConfMap(spark)
    var reader = spark.readStream.format("binaryFile")
      // the binaryFile source's FIXED schema (streaming file sources
      // require it explicitly); the projection below prunes to path
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, " +
          "content BINARY"))
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    reader.load(pathGlob)
      .select(col("path")).as[String]
      .flatMap { path =>
        openRecords(path, confMap)
          .filter(_.warcType.equalsIgnoreCase("response"))
          .map { r =>
            val (body, charset) = httpBodyAndCharset(r.body)
            (path, r.targetUri, charset, body)
          }
      }
      .toDF("file", "url", "charset", "body")
  }
}
