package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Sample-sharded TAR export — the WebDataset convention most
  * multimodal training loaders consume: each shard is one POSIX ustar
  * file, each sample's entries sit CONTIGUOUSLY inside it under names
  * `<key>.<ext>` (e.g. `000017.txt` + `000017.json`), and a loader
  * streams a shard sequentially with zero seeks. The JSONL export
  * ([[Export.writeJsonlShards]]) is the text-corpus handoff; this is the
  * binary-sample one — images, audio, arbitrary payload columns — in a
  * container any tar reader on any stack can open.
  *
  * Scale shape (same as the JSONL export): shard assignment is a
  * funnel-free dense ordinal ([[GlobalOrder.denseIds]]) divided by
  * `samplesPerShard`; rows then exchange ON the shard id, each shard is
  * STREAMED entry-by-entry to its own `shard-NNNNN.tar` by the one task
  * that owns it (no whole-shard buffering in memory), and the job's
  * result is the bounded per-shard accounting frame. One corpus exchange
  * total. Output is byte-deterministic: fixed mtime/uid/gid, ordinal
  * entry order — two exports of the same frame are identical files, so
  * shard bytes can be content-addressed and diffed.
  *
  * Writer-side ustar subset (ISO/IEC 9945 / pax "ustar\0" + "00"): plain
  * regular-file entries, names ≤ 100 bytes (enforced — training keys
  * are short ids; long-name extensions are out of scope), sizes ≤ 8 GiB
  * (the 11-octal-digit header limit, far above any sane sample).
  */
object TarExport {

  /** Write `df` as tar shards of `samplesPerShard` samples under
    * `path/shard-NNNNN.tar`. Each row is one SAMPLE: `keyCol` (rendered
    * as a string) names it, and each `(extension, column)` of `entries`
    * becomes the tar entry `<key>.<extension>` with the column's bytes
    * (BINARY as-is; anything else is cast to STRING and UTF-8 encoded;
    * a NULL entry column is skipped for that sample — the WebDataset
    * "missing modality" convention). Samples are ordered by `orderCols`
    * (a total order ⇒ a deterministic export; the denseIds
    * nondeterministic-input caveat applies, see [[Export]]).
    *
    * Returns the per-shard accounting frame `(shard, n_samples,
    * n_entries, payload_bytes)` — bounded at one row per shard. Task
    * retries converge: a shard's bytes are a pure function of its rows,
    * and the file is created with overwrite.
    */
  def writeTarShards(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                     entries: Seq[(String, Column)],
                     samplesPerShard: Long, path: String): DataFrame = {
    require(samplesPerShard > 0,
      s"samplesPerShard must be positive, got $samplesPerShard")
    require(entries.nonEmpty, "at least one (extension, column) entry")
    val spark = df.sparkSession
    val hconf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val confMap = {
      val it = hconf.iterator(); val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val entryCols = entries.map { case (ext, c) =>
      // resolve the entry column's type against df (Column.expr is
      // unresolved here); tuple-shaped struct fields so the typed
      // Dataset below decodes without a bespoke encoder
      val dt = df.select(c).schema.head.dataType
      struct(lit(ext).as("_1"),
        (dt match {
          case org.apache.spark.sql.types.BinaryType => c
          case _ => encode(c.cast("string"), "UTF-8")
        }).as("_2"))
    }
    // derived columns ride NEXT TO df's own (orderCols must still
    // resolve); fresh names so no user column is shadowed
    val kKey = Cols.fresh(df, "_tar_key")
    val kEntries = Cols.fresh(df, "_tar_entries")
    val kOrd = Cols.fresh(df, "_tar_ord")
    val base = df
      .withColumn(kKey, keyCol.cast("string"))
      .withColumn(kEntries, array(entryCols: _*))
    val kShard = Cols.fresh(base, "_tar_shard")
    val sharded = GlobalOrder.denseIds(base, orderCols, kOrd, 0L)
      .withColumn(kShard, expr(s"(`$kOrd` - 1) div ${samplesPerShard}L"))
    import spark.implicits._
    val stats = sharded
      .repartition(col(kShard))
      .sortWithinPartitions(kShard, kOrd)
      .select(col(kShard), col(kKey), col(kEntries))
      .as[(Long, String, Seq[(String, Array[Byte])])]
      .mapPartitions { rows =>
        TarExport.writePartition(rows, path, confMap)
      }
      .toDF("shard", "n_samples", "n_entries", "payload_bytes")
      // the accounting frame is the ACTION that runs the export; bounded
      // at one row per shard, so persisting it driver-side is safe
      .orderBy("shard")
    stats
  }

  /** Executor-side shard writer: rows arrive sorted by (shard, ordinal);
    * contiguous runs of one shard stream to `shard-NNNNN.tar`. A task
    * may own several shards (hash exchange), each becomes its own file.
    */
  private def writePartition(
      rows: Iterator[(Long, String, Seq[(String, Array[Byte])])],
      path: String, confMap: Map[String, String])
      : Iterator[(Long, Long, Long, Long)] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var cur = -1L
    var stream: org.apache.hadoop.fs.FSDataOutputStream = null
    var nSamples = 0L; var nEntries = 0L; var nBytes = 0L
    def close(): Unit = if (stream != null) {
      stream.write(new Array[Byte](1024)) // two zero end-of-archive blocks
      stream.close(); stream = null
      out += ((cur, nSamples, nEntries, nBytes))
    }
    for ((shard, key, entries) <- rows) {
      if (shard != cur) {
        close()
        cur = shard; nSamples = 0L; nEntries = 0L; nBytes = 0L
        stream = fs.create(
          new org.apache.hadoop.fs.Path(dir, f"shard-$shard%05d.tar"), true)
      }
      nSamples += 1
      for ((ext, bytes) <- entries if bytes != null) {
        val name = s"$key.$ext"
        stream.write(ustarHeader(name, bytes.length.toLong))
        stream.write(bytes)
        val pad = ((512 - bytes.length % 512) % 512)
        if (pad > 0) stream.write(new Array[Byte](pad))
        nEntries += 1; nBytes += bytes.length
      }
    }
    close()
    out.iterator
  }

  /** One 512-byte POSIX ustar header for a regular file. Deterministic:
    * mode 0644, uid/gid 0, mtime 0 — export bytes depend only on the
    * data.
    */
  private[ops] def ustarHeader(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameB.length <= 100, s"tar entry name exceeds 100 bytes: $name")
    require(size >= 0 && size <= 0x1FFFFFFFFL, s"entry too large: $size")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, b.length)
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    put(100, "0000644")       // mode (NUL-terminated by the zero fill)
    put(108, "0000000")       // uid
    put(116, "0000000")       // gid
    put(124, f"$size%011o")   // size, 11 octal digits
    put(136, "00000000000")   // mtime 0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'              // typeflag: regular file
    put(257, "ustar")         // magic + NUL (zero fill) ...
    put(263, "00")            // ... + version
    var sum = 0
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o")
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  /** Read tar shards back as one row per ENTRY: `(shard, name, content)`
    * — the Spark-side loader (and the round-trip verifier). Each task
    * parses whole shard files from the binaryFile source; headers are
    * walked sequentially, exactly as a training loader would.
    */
  def readTarShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/shard-*.tar")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(p)
          .map(_.group(1).toLong).getOrElse(-1L)
        parseTar(bytes).map { case (name, content) => (shard, name, content) }
      }
      .toDF("shard", "name", "content")
  }

  /** Walk a ustar archive's headers; returns (name, content) per entry.
    * Refuses (throws) on a malformed header rather than returning a
    * silently-partial archive.
    */
  private[ops] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length) {
      if (bytes.slice(off, off + 512).forall(_ == 0)) {
        off = bytes.length // end-of-archive zero block
      } else {
        val nameEnd = {
          var i = off
          while (i < off + 100 && bytes(i) != 0) i += 1
          i
        }
        val name = new String(bytes, off, nameEnd - off,
          java.nio.charset.StandardCharsets.UTF_8)
        val sizeStr = new String(bytes, off + 124, 12,
          java.nio.charset.StandardCharsets.US_ASCII)
          .takeWhile(c => c >= '0' && c <= '7')
        require(sizeStr.nonEmpty, s"malformed tar header at offset $off")
        val size = java.lang.Long.parseLong(sizeStr, 8)
        val dataOff = off + 512
        require(dataOff + size <= bytes.length,
          s"truncated tar entry '$name' at offset $off")
        out += ((name, java.util.Arrays.copyOfRange(
          bytes, dataOff, (dataOff + size).toInt)))
        off = dataOff + ((size + 511) / 512 * 512).toInt
      }
    }
    out.result()
  }
}
