package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] WARC record INDEX + seek-fetch — the random-access layer the
  * crawl-archive convention exists for. Shards gzip EACH RECORD as its
  * own member precisely so a consumer holding `(file, offset, length)`
  * can range-read one record from a multi-GB shard; Common Crawl ships
  * exactly such an index (the CDX(J) files) next to every crawl. At
  * 100 TB this is the difference between "scan every shard to hydrate
  * 10k sampled documents" and "issue 10k range reads".
  *
  * Three surfaces:
  *  - [[indexWarc]]: one streaming pass over each shard producing the
  *    per-record `(file, offset, length, ...)` table — member
  *    boundaries come from a gzip-member walk that verifies each
  *    member's CRC32 + ISIZE trailer (a torn member refuses; the loud
  *    [[Warc]] contract);
  *  - [[writeCdxj]]/[[readCdxj]]: the index serialized as CDXJ-style
  *    lines (`<SURT key> <timestamp> <JSON>` — the pywb/Common Crawl
  *    layout), sorted by the SURT key so external consumers can
  *    binary-search it;
  *  - [[fetchRecords]]/[[fetchResponses]]: hydrate an index subset —
  *    rows group by file, offsets sort ascending, ONE open + forward
  *    seeks per (file, task) — reading exactly `length` bytes per
  *    record, never the shard.
  *
  * Scale story: indexing is the same one-task-per-shard streaming pass
  * as [[Warc.readWarc]] (one member in memory at a time); fetch moves
  * `Σ length` bytes for the selected rows only, with seek locality from
  * the per-file ascending-offset sort; the CDXJ sort is one range
  * exchange over index rows (~100 bytes each — 100 TB of WARC indexes
  * to ~100 GB of CDXJ, a small frame by corpus standards).
  */
object WarcIndex {

  /** One indexed member: `offset`/`length` bound the COMPRESSED gzip
    * member inside the shard; `record` is its decoded WARC record.
    */
  final case class IndexedRecord(offset: Long, length: Long,
                                 record: Warc.WarcRecord)

  // ---------------------------------------------------------------------
  // Gzip member walk (RFC 1952) with exact byte accounting
  // ---------------------------------------------------------------------

  /** Iterate the gzip members of `in` as (memberOffset, memberLength,
    * decompressedBytes). Byte-exact: offsets come from counting every
    * consumed input byte through the member header, deflate stream, and
    * 8-byte trailer; each member's CRC32 and ISIZE verify (RFC 1952 —
    * a flipped bit refuses, never yields a wrong slice). Loud on
    * truncation and non-gzip input.
    */
  def gzipMembers(in: java.io.InputStream)
      : Iterator[(Long, Long, Array[Byte])] =
    new Iterator[(Long, Long, Array[Byte])] {
      private val inBuf = new Array[Byte](1 << 16)
      private var inPos = 0
      private var inLim = 0
      private var streamOff = 0L // stream offset of inBuf(inPos)
      private var nextMember: (Long, Long, Array[Byte]) = null
      private var done = false

      private def refill(): Boolean = {
        if (inPos == inLim) { inPos = 0; inLim = 0 }
        val n = in.read(inBuf, inLim, inBuf.length - inLim)
        if (n <= 0) false else { inLim += n; true }
      }

      private def readByte(): Int =
        if (inPos == inLim && !refill()) -1
        else { val b = inBuf(inPos) & 0xFF; inPos += 1; streamOff += 1; b }

      private def need(what: String): Int = {
        val b = readByte()
        require(b >= 0, s"gzip member: truncated in $what at offset $streamOff")
        b
      }

      private def skipHeader(): Unit = {
        val m1 = need("magic"); val m2 = need("magic")
        require(m1 == 0x1F && m2 == 0x8B,
          f"gzip member: bad magic $m1%02x$m2%02x at offset ${streamOff - 2}")
        require(need("method") == 8, "gzip member: not DEFLATE")
        val flg = need("flags")
        var k = 0
        while (k < 6) { need("mtime/xfl/os"); k += 1 }
        if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
          val xlen = need("extra") | (need("extra") << 8)
          var i = 0
          while (i < xlen) { need("extra"); i += 1 }
        }
        if ((flg & 8) != 0) while (need("name") != 0) () // FNAME
        if ((flg & 16) != 0) while (need("comment") != 0) () // FCOMMENT
        if ((flg & 2) != 0) { need("hcrc"); need("hcrc"): Unit } // FHCRC
      }

      private def advance(): Unit = {
        if (done || nextMember != null) return
        if (inPos == inLim && !refill()) { done = true; return }
        val start = streamOff
        skipHeader()
        val inf = new java.util.zip.Inflater(true)
        val crc = new java.util.zip.CRC32
        val out = new java.io.ByteArrayOutputStream(64 * 1024)
        val outBuf = new Array[Byte](64 * 1024)
        try {
          while (!inf.finished()) {
            if (inf.needsInput()) {
              require(inPos < inLim || refill(),
                s"gzip member at offset $start: truncated deflate stream")
              inf.setInput(inBuf, inPos, inLim - inPos)
            }
            val before = inf.getRemaining
            val n = inf.inflate(outBuf)
            val used = before - inf.getRemaining
            inPos += used
            streamOff += used
            if (n > 0) { out.write(outBuf, 0, n); crc.update(outBuf, 0, n) }
            else require(n > 0 || inf.finished() || inf.needsInput(),
              s"gzip member at offset $start: inflater stalled")
          }
        } catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"gzip member at offset $start is damaged (${e.getMessage})")
        } finally inf.end()
        // 8-byte trailer: CRC32 LE + ISIZE LE — both VERIFY
        var trailer = 0L
        var i = 0
        while (i < 8) { trailer |= need("trailer").toLong << (8 * i); i += 1 }
        val wantCrc = trailer & 0xFFFFFFFFL
        val wantIsize = (trailer >>> 32) & 0xFFFFFFFFL
        require(crc.getValue == wantCrc,
          f"gzip member at offset $start: CRC32 mismatch " +
            f"(stored $wantCrc%08x, computed ${crc.getValue}%08x)")
        require((out.size().toLong & 0xFFFFFFFFL) == wantIsize,
          s"gzip member at offset $start: ISIZE mismatch " +
            s"(stored $wantIsize, inflated ${out.size()})")
        nextMember = (start, streamOff - start, out.toByteArray)
      }

      override def hasNext: Boolean = { advance(); nextMember != null }
      override def next(): (Long, Long, Array[Byte]) = {
        advance()
        if (nextMember == null) throw new NoSuchElementException("gzipMembers")
        val r = nextMember; nextMember = null; r
      }
    }

  /** The indexable records of one per-record-gzipped shard stream:
    * each gzip member must decode to exactly ONE WARC record (the
    * crawl-archive layout [[Warc.writeWarc]] writes; a member holding
    * several records has no per-record offsets and REFUSES — index a
    * re-packed shard instead of silently indexing only member heads).
    */
  def indexShard(in: java.io.InputStream): Iterator[IndexedRecord] =
    gzipMembers(in).map { case (off, len, bytes) =>
      val recs = Warc.parseAll(bytes)
      require(recs.length == 1,
        s"WARC member at offset $off holds ${recs.length} records — " +
          "per-record gzip layout required for offset indexing")
      IndexedRecord(off, len, recs.head)
    }

  /** Wrap `it` so `closeable` closes as soon as `hasNext` first turns
    * false (and stays closed) — eager per-group resource release inside
    * `flatMapGroups`, where the task-completion listener alone would
    * accumulate one open handle per visited file for the task lifetime.
    */
  private def closeOnExhaust[A](it: Iterator[A],
                                closeable: java.io.Closeable): Iterator[A] =
    new Iterator[A] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) {
          closed = true
          try closeable.close() catch { case _: java.io.IOException => () }
        }
        h
      }
      override def next(): A = it.next()
    }

  // ---------------------------------------------------------------------
  // Spark surfaces
  // ---------------------------------------------------------------------

  /** Index every per-record-gzipped WARC shard under `pathGlob`: one
    * row per record — (file, offset, length, warc_type, url,
    * content_type, warc_date, payload_bytes). Same streaming shape as
    * [[Warc.readWarc]]: paths in, one member in memory at a time.
    */
  def indexWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val confMap = Warc.hadoopConfMap(spark)
    Warc.listPaths(spark, pathGlob)
      .flatMap { path =>
        indexShard(Warc.openStream(path, confMap)).map { ir =>
          // status + digest are the CDX enrichment fields external
          // consumers key on: status screens error captures WITHOUT a
          // fetch; digest is the dedup-by-content key Common Crawl's
          // own index carries — and like CC's WARC-Payload-Digest it
          // hashes the PAYLOAD (HTTP framing stripped) for response
          // records, so two captures of one page differing only in
          // Date/Set-Cookie response headers still collapse; records
          // whose framing fails to parse (and non-response records)
          // hash the whole body
          val isResponse = ir.record.warcType.equalsIgnoreCase("response")
          val status = if (isResponse) Warc.httpStatus(ir.record.body) else -1
          val digestBytes =
            if (isResponse)
              try Warc.httpBody(ir.record.body)
              catch { case _: IllegalArgumentException => ir.record.body }
            else ir.record.body
          val digest = java.security.MessageDigest.getInstance("SHA-256")
            .digest(digestBytes).map("%02x".format(_)).mkString
          (path, ir.offset, ir.length, ir.record.warcType,
            ir.record.targetUri, ir.record.contentType,
            ir.record.headers.getOrElse("warc-date", null),
            ir.record.body.length.toLong,
            if (status > 0) Some(status) else None,
            digest)
        }
      }
      .toDF("file", "offset", "length", "warc_type", "url",
        "content_type", "warc_date", "payload_bytes", "status", "digest")
  }

  /** Hydrate an index subset: `index` needs (`file`, `offset`,
    * `length`) columns; returns (file, offset, warc_type, url,
    * content_type, body). Rows group BY FILE, offsets sort ascending,
    * ONE open + forward seeks per (file, task) — exactly `length`
    * bytes read per record, each member's CRC verifying on decode. A
    * stale index (offset not at a gzip member, length torn) refuses
    * loudly rather than yielding a wrong record.
    *
    * `splitBytes` (0 = off) sub-splits a FILE's rows into
    * offset-range groups of that many bytes, so a fetch concentrated
    * in a few huge shards still fans across the cluster (the
    * one-task-per-file default is right when selected rows spread over
    * many shards; a 100 GB shard holding most of the hits wants
    * ~`splitBytes`-sized work units — seek locality within each range
    * is preserved by the ascending sort).
    */
  def fetchRecords(index: DataFrame, splitBytes: Long = 0L): DataFrame = {
    require(splitBytes >= 0L, s"splitBytes must be >= 0 (got $splitBytes)")
    val spark = index.sparkSession
    import spark.implicits._
    val confMap = Warc.hadoopConfMap(spark)
    index.select(col("file").cast("string"), col("offset").cast("long"),
        col("length").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(r => (r._1, if (splitBytes > 0L) r._2 / splitBytes else 0L))
      .flatMapGroups { (key: (String, Long),
                        rows: Iterator[(String, Long, Long)]) =>
        val file = key._1
        val sorted = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        if (sorted.isEmpty) Iterator.empty
        else {
          val in = Warc.openStream(file, confMap)
          val base = sorted.iterator.map { case (off, len) =>
            require(len > 0 && len <= Int.MaxValue - 8,
              s"fetchRecords: bad member length $len at $file:$off")
            in.seek(off)
            val bytes = in.readNBytes(len.toInt)
            require(bytes.length == len,
              s"fetchRecords: $file truncated at offset $off " +
                s"(wanted $len bytes, got ${bytes.length}) — stale index?")
            val members = gzipMembers(
              new java.io.ByteArrayInputStream(bytes)).toList
            require(members.length == 1 && members.head._2 == len,
              s"fetchRecords: $file:$off is not one whole gzip member — " +
                "stale index?")
            val recs = Warc.parseAll(members.head._3)
            require(recs.length == 1,
              s"fetchRecords: member at $file:$off decodes to " +
                s"${recs.length} WARC records — stale index?")
            val r = recs.head
            (file, off, r.warcType, r.targetUri, r.contentType, r.body)
          }
          // close the handle when THIS group's iterator drains — a task
          // hydrating rows from many files would otherwise hold every
          // file's handle open until task completion (fd / connection-
          // pool exhaustion on HDFS/S3 at sampled-fetch scale); the
          // task-completion listener registered by openStream stays as
          // the abandoned-iterator backstop (double-close is harmless)
          closeOnExhaust(base, in)
        }
      }
      .toDF("file", "offset", "warc_type", "url", "content_type", "body")
  }

  /** [[fetchRecords]] for `response` rows with the HTTP framing
    * stripped — (file, offset, url, charset, body), the
    * [[Warc.readResponses]] shape hydrated by range read.
    */
  def fetchResponses(index: DataFrame, splitBytes: Long = 0L): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    fetchRecords(index, splitBytes)
      .filter(lower(col("warc_type")) === "response")
      .as[(String, Long, String, String, String, Array[Byte])]
      .map { case (file, off, _, url, _, raw) =>
        val (body, charset) = Warc.httpBodyAndCharset(raw)
        (file, off, url, charset, body)
      }
      .toDF("file", "offset", "url", "charset", "body")
  }

  /** Exact dedup-by-content over the INDEX — one surviving row per
    * `digest`, the earliest capture winning ((file, offset)
    * lexicographic, deterministic). This is the Common Crawl idiom:
    * identical payloads collapse BEFORE any shard byte is fetched, so
    * the subsequent [[fetchRecords]] moves each distinct document's
    * bytes exactly once. One hash groupBy (~150-byte rows), map-side
    * partial — the exact-dedup shape everywhere in this library.
    */
  def dedupByDigest(index: DataFrame): DataFrame =
    index
      .groupBy(col("digest"))
      .agg(min_by(struct(index.columns.map(col).toIndexedSeq: _*),
        struct(col("file"), col("offset"))).as("__row"))
      .select(col("__row.*"))

  // ---------------------------------------------------------------------
  // CDXJ serialization (pywb / Common Crawl layout)
  // ---------------------------------------------------------------------

  /** The SURT (Sort-friendly URI Reordering Transform) key CDX files
    * sort by: host labels reversed and comma-joined (canonicalized via
    * [[UrlOps.normalizeHost]]), `)/` separator, then path+query —
    * `https://www.Example.com/a/b?x=1` -> `com,example)/a/b?x=1`.
    * Scheme and port drop (the public CDX convention). Null/opaque
    * URLs key as themselves.
    */
  def surtKey(url: String): String = {
    if (url == null) return ""
    val parts = UrlOps.parse(url)
    if (parts.host == null || parts.host.isEmpty)
      return escapeKey(url.trim)
    val host = parts.host.split('.').reverse.mkString(",")
    val canon = parts.canonical
    val sep = canon.indexOf("://")
    val afterHost = {
      var i = sep + 3
      while (i < canon.length && canon.charAt(i) != '/' &&
        canon.charAt(i) != '?') i += 1
      canon.substring(i)
    }
    escapeKey(host + ")" + (if (afterHost.isEmpty) "/" else afterHost))
  }

  /** The CDXJ line format is space-delimited: a literal space (or
    * newline) inside a key — crawls DO carry invalid URLs with raw
    * spaces — would break the `<surt> <ts> <json>` split on read-back,
    * so key whitespace percent-encodes (the pywb convention).
    */
  private def escapeKey(s: String): String =
    if (s.indexOf(' ') < 0 && s.indexOf('\t') < 0 && s.indexOf('\n') < 0 &&
        s.indexOf('\r') < 0) s
    else s.replace(" ", "%20").replace("\t", "%09")
      .replace("\n", "%0A").replace("\r", "%0D")

  private val surtUdf = udf { url: String => surtKey(url) }

  /** Serialize an [[indexWarc]] frame as CDXJ-style text lines —
    * `<surt> <timestamp> <json>` with the pywb field names (url, mime,
    * status, digest, filename, offset, length) — globally sorted by
    * (surt, timestamp) so consumers binary-search. `nShards` bounds
    * output files (one range exchange).
    */
  def writeCdxj(index: DataFrame, path: String, nShards: Int = 16): Unit = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val ts = coalesce(
      regexp_replace(col("warc_date"), "[^0-9]", ""), lit("0"))
    val line = concat_ws(" ",
      surtUdf(col("url")),
      ts,
      to_json(struct(
        col("url"), col("content_type").as("mime"),
        col("status"), col("digest"),
        element_at(split(col("file"), "/"), -1).as("filename"),
        col("offset"), col("length"))))
    index
      .select(line.as("value"))
      .repartitionByRange(nShards, col("value"))
      .sortWithinPartitions("value")
      .write.mode("overwrite").text(path)
  }

  /** Read CDXJ lines back to the (surt, timestamp, url, mime, status,
    * digest, filename, offset, length) frame — joins back to shard
    * DIRECTORIES via `withFileDir` for [[fetchRecords]] (CDXJ carries
    * filenames, not absolute paths, per the public convention).
    */
  def readCdxj(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = spark.read.text(pathGlob)
    val sp = split(col("value"), " ", 3)
    val json = element_at(sp, 3)
    val schema = "url STRING, mime STRING, status INT, digest STRING, " +
      "filename STRING, offset BIGINT, length BIGINT"
    raw.select(element_at(sp, 1).as("surt"),
        element_at(sp, 2).as("timestamp"),
        from_json(json, org.apache.spark.sql.types.StructType.fromDDL(schema))
          .as("j"))
      .select(col("surt"), col("timestamp"), col("j.*"))
  }

  /** Resolve a [[readCdxj]] frame's filenames against the shard
    * directory, yielding the (file, offset, length, url) shape
    * [[fetchRecords]] consumes.
    */
  def withFileDir(cdxj: DataFrame, shardDir: String): DataFrame =
    cdxj.withColumn("file",
      concat(lit(shardDir.stripSuffix("/") + "/"), col("filename")))
}
