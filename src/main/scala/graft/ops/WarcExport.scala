package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Warc

/** WET-style corpus export: curated (id, url, text) rows shipped back
  * out as WARC `conversion` records — the interchange shape the crawl
  * ecosystem's extracted-text archives use (Common Crawl WET), so a
  * downstream consumer needs no engine-specific reader at all.
  *
  * Layout: `shard-NNNNN.warc.gz`, each record its own gzip member
  * (the seekable crawl-archive convention [[graft.ext.Warc]] reads
  * back), records ordered by id within a shard — BYTE-DETERMINISTIC
  * (the JDK gzip header carries no timestamp), so a re-export of the
  * same frame writes identical shards and the delivery is
  * content-addressable; [[ExportIntegrity]]'s format-agnostic manifest
  * + verify compose directly.
  *
  * Write discipline = the tar exporter's ([[TarExport]]): one task per
  * shard (hash exchange on the shard id), executor-side streaming
  * write to a temp name, ATOMIC rename-over commit per finished shard
  * ([[TarExport.commitShard]] — the same local/HDFS/fallback ladder),
  * abort deletes the in-flight temp. No partial shard is ever visible.
  *
  * Scale story: ONE shuffle (by shard id), O(record) writer memory —
  * rows stream through a per-member gzip straight to the store; the
  * driver sees only the per-shard report rows.
  */
object WarcExport {

  /** Export `df`'s (`idCol`, `urlCol`, `textCol`) as WET shards under
    * `path`. `nShards` fixes the layout (shard = id % nShards — stable
    * across runs and engines); returns the per-shard report
    * (shard, n_records, payload_bytes, sha256 of the shard file).
    *
    * Every record carries the ISO 28500 §5.2-5.4 mandatory headers
    * (r19): WARC-Record-ID is content-derived ([[Warc.recordIdFor]])
    * and WARC-Date comes from `asOf` — the caller-declared export
    * instant, NOT a wall clock — so a re-export of the same frame at
    * the same `asOf` writes byte-identical shards (the
    * content-addressable delivery contract external WET consumers
    * verify).
    */
  def writeWetShards(df: DataFrame, idCol: String, urlCol: String,
                     textCol: String, path: String,
                     nShards: Int,
                     asOf: java.time.Instant = Warc.DefaultExportInstant)
      : DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val spark = df.sparkSession
    import spark.implicits._
    val confMap = Warc.hadoopConfMap(spark)
    val asOfMs = asOf.toEpochMilli
    val prepared = df
      .filter(col(idCol).isNotNull && col(urlCol).isNotNull &&
        col(textCol).isNotNull)
      .select(pmod(col(idCol).cast("long"), lit(nShards.toLong)).as("__shard"),
        col(idCol).cast("long").as("__id"),
        col(urlCol).cast("string").as("__url"),
        col(textCol).cast("string").as("__text"))
      .repartition(col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .as[(Long, Long, String, String)]
    prepared
      .mapPartitions(rows => writeShardPartition(rows, path, confMap, asOfMs))
      .toDF("shard", "n_records", "payload_bytes", "sha256")
      // not `.orderBy`: a range exchange samples its child for boundaries,
      // re-running the shard-writing mapPartitions — every WET shard would
      // be written twice (see TarExport.writeSharded); the report is one
      // row per shard, so a single-partition sort is bounded
      .repartition(1).sortWithinPartitions("shard")
  }

  /** Executor-side shard writer: contiguous (shard, id)-sorted runs
    * stream to `shard-NNNNN.warc.gz`; a task may own several shards.
    * Failures close and delete the in-flight temp before propagating.
    */
  private def writeShardPartition(rows: Iterator[(Long, Long, String, String)],
                                  path: String, confMap: Map[String, String],
                                  asOfMs: Long)
      : Iterator[(Long, Long, Long, String)] = {
    val asOf = java.time.Instant.ofEpochMilli(asOfMs)
    val conf = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val attempt = java.util.UUID.randomUUID().toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    var cur = -1L
    var tmp: org.apache.hadoop.fs.Path = null
    var stream: java.io.OutputStream = null
    var digest: java.security.MessageDigest = null
    var nRecords = 0L
    var payloadBytes = 0L
    def finishShard(): Unit = if (stream != null) {
      stream.close(); stream = null
      val dest = new org.apache.hadoop.fs.Path(dir, f"shard-$cur%05d.warc.gz")
      TarExport.commitShard(fs, conf, tmp, dest)
      tmp = null
      out += ((cur, nRecords, payloadBytes,
        digest.digest().map("%02x".format(_)).mkString))
    }
    def abort(): Unit = {
      if (stream != null) {
        try stream.close() catch { case _: java.io.IOException => () }
      }
      if (tmp != null) {
        try { fs.delete(tmp, false); () }
        catch { case _: java.io.IOException => () }
      }
    }
    try {
      rows.foreach { case (shard, id, url, text) =>
        if (shard != cur) {
          finishShard()
          cur = shard
          nRecords = 0L; payloadBytes = 0L
          digest = java.security.MessageDigest.getInstance("SHA-256")
          tmp = new org.apache.hadoop.fs.Path(dir,
            f".shard-$cur%05d.warc.gz.$attempt.tmp")
          stream = fs.create(tmp, true)
        }
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val record = Warc.writeRecord("conversion", url, "text/plain", body,
          asOf, null)
        val member = Warc.writeWarc(Seq(record), gzipPerRecord = true)
        stream.write(member)
        digest.update(member)
        nRecords += 1
        payloadBytes += body.length.toLong // text bytes, not WARC framing
      }
      finishShard()
    } catch {
      case t: Throwable => abort(); throw t
    }
    out.iterator
  }

  /** Read WET shards back: `conversion` records as (file, url, text) —
    * text decoded UTF-8 with U+FFFD REPLACEMENT on malformed sequences
    * (the `new String` contract): [[writeWetShards]] only ever writes
    * valid UTF-8, but foreign WET shards do ship damage, and a
    * bytes-as-UTF8String cast would leak the raw malformed bytes into
    * the text column instead. Rides [[Warc.readWarc]]'s streaming path
    * (r19): tasks open shard PATHS and hold one record at a time,
    * never the compressed blob.
    */
  def readWet(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    Warc.readWarc(spark, pathGlob)
      .filter(lower(col("warc_type")) === "conversion")
      .select(col("file"), col("url"), col("body"))
      .as[(String, String, Array[Byte])]
      .map { case (file, url, body) =>
        (file, url,
          new String(body, java.nio.charset.StandardCharsets.UTF_8))
      }
      .toDF("file", "url", "text")
  }
}
