package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Sample-sharded TAR export — the WebDataset convention most
  * multimodal training loaders consume: each shard is one POSIX tar
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
  * total. Output is byte-deterministic — fixed mtime/uid/gid/mode,
  * ordinal entry order — so two exports of the same frame are identical
  * files and shard bytes can be content-addressed and diffed.
  *
  * Tar framing is commons-compress (`TarArchiveOutputStream` /
  * `TarArchiveInputStream`, already on every Spark classpath): checksums
  * are verified on read, truncated archives fail loudly, and names
  * longer than the 100-byte ustar field carry via POSIX pax extension
  * headers instead of refusing.
  *
  * Commit protocol: a shard streams to a hidden attempt-unique temp
  * name and RENAMES into place only when complete, so a reader's
  * `shard-*.tar` glob never sees a half-written file and two racing
  * task attempts (speculation, a zombie surviving a stage retry) cannot
  * interleave bytes in one file — each renames its own complete,
  * deterministic (hence identical) copy, and either winner is correct.
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
    * n_entries, payload_bytes, sha256)` — bounded at one row per shard.
    * `sha256` is the hash of the COMMITTED tar bytes, computed while
    * streaming (no re-read): with deterministic output it is the
    * shard's content address, so a downloader can verify its copy and a
    * cache can key on it. `payload_bytes` is the operator's sizing
    * signal: most whole-file-at-once consumers cap a shard around 2 GB,
    * so pick `samplesPerShard` to keep shards well under that (the
    * usual WebDataset practice is ~100 MB-1 GB).
    */
  def writeTarShards(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                     entries: Seq[(String, Column)],
                     samplesPerShard: Long, path: String,
                     index: Boolean = false): DataFrame = {
    require(entries.nonEmpty, "at least one (extension, column) entry")
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
    writePrepared(df, keyCol, array(entryCols: _*), orderCols,
      Left(samplesPerShard), path, index)
  }

  /** As [[writeTarShards]], but each row's entries come as ONE
    * `map<string,binary>` column — exactly the shape [[readTarSamples]]
    * returns, making "read a delivery back at the sample grain and
    * re-export it" a two-call pipeline (see [[compactTarShards]]).
    * Entries are written in EXTENSION order (a map carries no reliable
    * order; sorting makes the re-export byte-deterministic), and a key
    * absent from a sample's map is simply not written — the same
    * missing-modality convention as a NULL entry column.
    */
  def writeTarSamples(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
                      entriesMap: Column, samplesPerShard: Long,
                      path: String, index: Boolean = false): DataFrame =
    writePrepared(df, keyCol, mapAsEntries(entriesMap), orderCols,
      Left(samplesPerShard), path, index)

  /** [[writeTarShardsByBytes]] over a `map<string,binary>` entries
    * column — the byte-budget twin of [[writeTarSamples]].
    */
  def writeTarSamplesByBytes(df: DataFrame, keyCol: Column,
                             orderCols: Seq[Column], entriesMap: Column,
                             maxShardBytes: Long, path: String,
                             index: Boolean = false): DataFrame =
    writePrepared(df, keyCol, mapAsEntries(entriesMap), orderCols,
      Right(maxShardBytes), path, index)

  /** Re-shard a committed delivery into size-targeted shards: read the
    * samples back (optionally enforcing the source manifest while
    * streaming), re-export them under `destPath` at `maxShardBytes`
    * next-fit, ordered by (key, source shard). The shape a long-running
    * [[graft.streaming.StreamingExport]] needs once its history is many
    * small batch-<id>/ shard sets: one compaction pass turns them into
    * a clean epoch snapshot a loader mounts with far fewer opens —
    * publish a fresh manifest on the new root to hand it off. Cost is
    * one streaming read + ONE corpus exchange (the re-shard), same as
    * any export.
    */
  def compactTarShards(spark: SparkSession, srcPath: String,
                       destPath: String, maxShardBytes: Long,
                       glob: String = "shard-*.tar",
                       verifyManifest: Boolean = false,
                       index: Boolean = false): DataFrame = {
    val samples = readTarSamples(spark, srcPath,
      verifyManifest = verifyManifest, glob = glob)
    writeTarSamplesByBytes(samples, col("key"),
      Seq(col("key"), col("shard")), col("entries"), maxShardBytes, destPath,
      index)
  }

  /** `map<string,binary>` → the writer's sorted entry array (see
    * [[writeTarSamples]] for why the sort).
    */
  private def mapAsEntries(entriesMap: Column): Column =
    array_sort(transform(map_entries(entriesMap), e =>
      struct(e.getField("key").cast("string").as("_1"),
        e.getField("value").as("_2"))))

  /** Common writer pipeline: stamp key + entry array, assign shards by
    * sample count (`Left`) or byte budget (`Right`), stream-write.
    */
  private def writePrepared(df: DataFrame, keyCol: Column,
                            entriesCol: Column, orderCols: Seq[Column],
                            sizing: Either[Long, Long],
                            path: String, index: Boolean = false): DataFrame = {
    sizing.fold(
      n => require(n > 0, s"samplesPerShard must be positive, got $n"),
      b => require(b > 0, s"maxShardBytes must be positive, got $b"))
    val spark = df.sparkSession
    val confMap = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    // derived columns ride NEXT TO df's own (orderCols must still
    // resolve); fresh names so no user column is shadowed
    val kKey = Cols.fresh(df, "_tar_key")
    val kEntries = Cols.fresh(df, "_tar_entries")
    val base = df
      .withColumn(kKey, keyCol.cast("string"))
      .withColumn(kEntries, entriesCol)
    val kShard = Cols.fresh(base, "_tar_shard")
    val sharded = sizing match {
      case Left(samplesPerShard) =>
        val kOrd = Cols.fresh(base, "_tar_ord")
        (GlobalOrder.denseIds(base, orderCols, kOrd, 0L)
          .withColumn(kShard, expr(s"(`$kOrd` - 1) div ${samplesPerShard}L")),
          kOrd)
      case Right(maxShardBytes) =>
        val kSize = Cols.fresh(base, "_tar_size")
        val kPre = Cols.fresh(base, "_tar_prefix")
        val withSize = base
          // framed sample size: Σ over present entries of header +
          // padded payload — 512 * (1 + ceil(len/512)); the shift keeps
          // the arithmetic integral (Column./ is double division)
          .withColumn(kSize,
            aggregate(col(kEntries), lit(0L), (acc, e) =>
              acc + when(e.getField("_2").isNull, 0L)
                .otherwise(lit(512L) * (lit(1L) +
                  shiftright(length(e.getField("_2")) + 511, 9).cast("long")))))
        (GlobalOrder.prefixSums(withSize, orderCols, col(kSize), kPre)
          .withColumn(kShard, expr(s"`$kPre` div ${maxShardBytes}L")),
          kPre)
    }
    writeSharded(spark, sharded._1, kShard, sharded._2, kKey, kEntries,
      path, confMap, index)
  }

  /** As [[writeTarShards]], but shards are sized by BYTES, not sample
    * count — the sizing contract operators actually state ("keep shards
    * under 1 GB"): with skewed document lengths a fixed sample count
    * yields wildly uneven shards, while a byte budget keeps every shard
    * near the loader-friendly target regardless of the length
    * distribution.
    *
    * Assignment is next-fit by running total: each sample's FRAMED size
    * (per present entry: one 512-byte ustar header + payload rounded up
    * to the 512-byte record; keys longer than the 100-byte ustar name
    * field add pax overhead the budget does not count) accumulates in
    * `orderCols` order, and a sample lands in shard
    * `floor(exclusivePrefix / maxShardBytes)` — the shard where it
    * STARTS. So a shard's bytes stay under `maxShardBytes` plus its
    * last sample's size, samples stay whole and contiguous, and an
    * oversized single sample takes a shard alone (skipping the shard
    * numbers its bytes span — numbering is monotone, not necessarily
    * dense). The per-shard end-of-archive blocks (two zero records plus
    * block padding) are a constant per shard outside the budget.
    *
    * Scale shape: the running total is [[GlobalOrder.prefixSums]] —
    * boundary-sampled buckets, one tiny per-bucket aggregate, ONE
    * corpus exchange — and the prefix itself (strictly increasing:
    * framed sizes are ≥512) orders samples within their shard, so the
    * write tail is identical to [[writeTarShards]]. Same accounting
    * frame, same commit protocol, same determinism.
    */
  def writeTarShardsByBytes(df: DataFrame, keyCol: Column,
                            orderCols: Seq[Column],
                            entries: Seq[(String, Column)],
                            maxShardBytes: Long, path: String,
                            index: Boolean = false): DataFrame = {
    require(entries.nonEmpty, "at least one (extension, column) entry")
    val entryCols = entries.map { case (ext, c) =>
      val dt = df.select(c).schema.head.dataType
      struct(lit(ext).as("_1"),
        (dt match {
          case org.apache.spark.sql.types.BinaryType => c
          case _ => encode(c.cast("string"), "UTF-8")
        }).as("_2"))
    }
    writePrepared(df, keyCol, array(entryCols: _*), orderCols,
      Right(maxShardBytes), path, index)
  }

  /** Shared write tail: exchange ON the shard id, stream each shard's
    * contiguous run to its file, return the bounded accounting frame
    * (the ACTION that runs the export; one row per shard, so collecting
    * it driver-side is safe).
    */
  private def writeSharded(spark: SparkSession, sharded: DataFrame,
                           kShard: String, kOrder: String, kKey: String,
                           kEntries: String, path: String,
                           confMap: Map[String, String],
                           index: Boolean = false): DataFrame = {
    import spark.implicits._
    sharded
      .repartition(col(kShard))
      .sortWithinPartitions(kShard, kOrder)
      .select(col(kShard), col(kKey), col(kEntries))
      .as[(Long, String, Seq[(String, Array[Byte])])]
      .mapPartitions { rows =>
        TarExport.writePartition(rows, path, confMap, index)
      }
      .toDF("shard", "n_samples", "n_entries", "payload_bytes", "sha256")
      // NOT `.orderBy("shard")`: a global sort is a RANGE exchange, and
      // range partitioning SAMPLES its child RDD for boundaries — which
      // re-executes the narrow child, i.e. re-runs the tar-writing
      // mapPartitions and writes every shard TWICE (idempotent but twice
      // the I/O; at corpus scale, twice the export). One round-robin
      // exchange materializes the writer exactly once
      // (`TarExportWriteOnceSpec` pins it), and the bounded accounting
      // frame (one row per shard) sorts in a single partition.
      .repartition(1).sortWithinPartitions("shard")
  }

  /** Executor-side shard writer: rows arrive sorted by (shard, ordinal);
    * contiguous runs of one shard stream to `shard-NNNNN.tar`. A task
    * may own several shards (hash exchange), each becomes its own file.
    * Failures close and delete the in-flight temp before propagating —
    * no leaked stream, no visible partial shard.
    */
  private def writePartition(
      rows: Iterator[(Long, String, Seq[(String, Array[Byte])])],
      path: String, confMap: Map[String, String],
      index: Boolean = false)
      : Iterator[(Long, Long, Long, Long, String)] = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val conf = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val attempt = java.util.UUID.randomUUID().toString
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, String)]
    var cur = -1L
    var tmp: org.apache.hadoop.fs.Path = null
    var tar: TarArchiveOutputStream = null
    var digest: java.security.MessageDigest = null
    var idxTmp: org.apache.hadoop.fs.Path = null
    var idx: java.io.OutputStream = null
    var nSamples = 0L; var nEntries = 0L; var nBytes = 0L
    def finishShard(): Unit = if (tar != null) {
      tar.finish(); tar.close(); tar = null
      val dest = new org.apache.hadoop.fs.Path(dir, f"shard-$cur%05d.tar")
      commitShard(fs, conf, tmp, dest)
      tmp = null
      // the index commits AFTER its tar: a reader that finds the index
      // can trust the shard is already visible
      if (idx != null) {
        idx.close(); idx = null
        commitShard(fs, conf, idxTmp,
          new org.apache.hadoop.fs.Path(dir, f"shard-$cur%05d.tar.idx.jsonl"))
        idxTmp = null
      }
      out += ((cur, nSamples, nEntries, nBytes,
        digest.digest().map("%02x".format(_)).mkString))
      committedShardCount.incrementAndGet()
    }
    def abort(): Unit = {
      if (tar != null) { try tar.close() catch { case _: java.io.IOException => () } }
      if (tmp != null) { try fs.delete(tmp, false) catch { case _: java.io.IOException => () } }
      if (idx != null) { try idx.close() catch { case _: java.io.IOException => () } }
      if (idxTmp != null) { try fs.delete(idxTmp, false) catch { case _: java.io.IOException => () } }
    }
    try {
      for ((shard, key, entries) <- rows) {
        if (shard != cur) {
          finishShard()
          cur = shard; nSamples = 0L; nEntries = 0L; nBytes = 0L
          tmp = new org.apache.hadoop.fs.Path(dir,
            f".shard-$shard%05d.tar.$attempt")
          // hash the exact committed bytes while streaming — the shard's
          // content address rides the accounting frame with no re-read
          digest = java.security.MessageDigest.getInstance("SHA-256")
          tar = new TarArchiveOutputStream(
            new java.security.DigestOutputStream(fs.create(tmp, true), digest))
          // names past the 100-byte ustar field travel as pax headers
          tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          tar.setAddPaxHeadersForNonAsciiNames(true)
          if (index) {
            idxTmp = new org.apache.hadoop.fs.Path(dir,
              f".shard-$shard%05d.tar.idx.jsonl.$attempt")
            idx = fs.create(idxTmp, true)
          }
        }
        nSamples += 1
        // the sample's byte offset inside its shard — recorded BEFORE
        // its first header, straight off the tar stream's own counter,
        // so pax extensions and padding are always accounted exactly
        val sampleOffset = tar.getBytesWritten
        var sEntries = 0L; var sBytes = 0L
        for ((ext, bytes) <- entries if bytes != null) {
          val e = new TarArchiveEntry(s"$key.$ext")
          // deterministic metadata: bytes depend only on the data
          e.setSize(bytes.length.toLong)
          e.setModTime(0L)
          e.setIds(0, 0)
          e.setMode(TarArchiveEntry.DEFAULT_FILE_MODE)
          tar.putArchiveEntry(e)
          tar.write(bytes)
          tar.closeArchiveEntry()
          sEntries += 1; sBytes += bytes.length
        }
        nEntries += sEntries; nBytes += sBytes
        if (idx != null) {
          val line = s"""{"key":"${Cols.jsonEscape(key)}",""" +
            s""""offset":$sampleOffset,"entries":$sEntries,"bytes":$sBytes}""" + "\n"
          idx.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      finishShard()
    } catch { case t: Throwable => abort(); throw t }
    out.iterator
  }

  /** Commit a complete temp shard over its destination with NO window
    * where the destination is absent: a concurrently-reading
    * `shard-*.tar` glob (a loader starting mid-re-export) must see the
    * old copy or the new copy, never a gap — and both copies are
    * byte-identical (deterministic output), so either is correct.
    * Local filesystems get nio's ATOMIC_MOVE rename-over; HDFS-likes
    * the namenode-atomic `FileContext.rename(OVERWRITE)`. A store with
    * neither falls back to rename-if-absent + accept-existing (the
    * pre-existing copy IS this attempt's bytes), which still never
    * deletes a visible shard.
    */
  private[ops] def commitShard(fs: org.apache.hadoop.fs.FileSystem,
                               conf: org.apache.hadoop.conf.Configuration,
                               tmp: org.apache.hadoop.fs.Path,
                               dest: org.apache.hadoop.fs.Path): Unit =
    try commitShardInner(fs, conf, tmp, dest)
    finally {
      // ChecksumFileSystem (local) keeps a `.<name>.crc` sidecar for the
      // TEMP name; the NIO move below bypasses Hadoop, so the sidecar
      // would survive as debris — best-effort removal either way
      try {
        fs.delete(new org.apache.hadoop.fs.Path(
          tmp.getParent, "." + tmp.getName + ".crc"), false); ()
      } catch { case _: java.io.IOException => () }
    }

  private def commitShardInner(fs: org.apache.hadoop.fs.FileSystem,
                               conf: org.apache.hadoop.conf.Configuration,
                               tmp: org.apache.hadoop.fs.Path,
                               dest: org.apache.hadoop.fs.Path): Unit = {
    val replaced =
      try {
        fs match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            val s = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
            val d = java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath)
            java.nio.file.Files.move(s, d,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          case f =>
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, conf)
            fc.rename(f.makeQualified(tmp), f.makeQualified(dest),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            true
        }
      } catch {
        // IOException subsumes AtomicMoveNotSupportedException (a
        // FileSystemException): any store refusing the atomic path drops
        // to the vacancy protocol below
        case _: java.io.IOException => false
        case _: UnsupportedOperationException => false
      }
    if (replaced) return
    // no atomic replace on this store: never delete-then-rename (that
    // opens the absence window) — take the path if vacant, else accept
    // the existing identical copy
    if (!fs.exists(dest) && fs.rename(tmp, dest)) return
    if (fs.exists(dest)) { fs.delete(tmp, false); () }
    else throw new java.io.IOException(s"could not commit $tmp -> $dest")
  }

  /** Test-visible count of tar shard streams currently open in this JVM
    * — [[readTarShards]] increments on open and decrements exactly once
    * on close (eager end-of-archive close, failure close, or the task
    * completion listener), so a spec can assert a partially-consumed
    * read leaks nothing.
    */
  private[ops] val openTarStreams = new java.util.concurrent.atomic.AtomicLong

  /** Test-visible count of shard files COMMITTED by this JVM's writers —
    * one increment per finished shard. The write-once contract's probe:
    * an export of N shards must raise it by exactly N (the pre-r21
    * terminal `orderBy` re-ran the writing mapPartitions through the
    * range exchange's boundary sampling and raised it by 2N). JVM-local
    * (per-executor on a cluster); consumed by `TarExportWriteOnceSpec`.
    */
  private[ops] val committedShardCount = new java.util.concurrent.atomic.AtomicLong

  /** Read tar shards back as one row per ENTRY: `(shard, name, content)`
    * — the Spark-side loader (and the round-trip verifier). Shards are
    * STREAMED entry-by-entry straight off the filesystem (never one
    * whole shard as a single byte array), with commons-compress
    * verifying each header checksum and failing loudly on a truncated
    * archive; only a single ENTRY must fit in memory. One task per
    * shard file.
    *
    * Two defenses against hostile/corrupt shards and early-exiting
    * consumers:
    *  - an entry whose HEADER claims more than `maxEntryBytes` (default
    *    `spark.graft.tarMaxEntryBytes`, 1 GiB) is REFUSED loudly before
    *    any allocation — one flipped size field must fail the task, not
    *    OOM the executor;
    *  - the stream closes on EVERY task exit path: eagerly at
    *    end-of-archive, on a read failure, and via a
    *    `TaskContext.addTaskCompletionListener` when the downstream
    *    query stops mid-shard (`limit`/`take`, a cancelled stage) — a
    *    partially-consumed iterator cannot strand an open filesystem
    *    handle for the executor's lifetime.
    *
    * With `verifyManifest=true` the read also ENFORCES the published
    * [[ExportIntegrity]] manifest at zero extra passes: the same bytes
    * the tar parse consumes stream through a SHA-256 digest, and a
    * fully-read shard that does not hash to its manifest entry (or is
    * absent from the manifest) fails the task loudly — the loader-side
    * delivery check, without the separate [[ExportIntegrity.verify]]
    * sweep. Only a fully-consumed shard verifies; an early-exiting
    * `limit()` neither checks nor spuriously fails.
    */
  def readTarShards(spark: SparkSession, path: String,
                    maxEntryBytes: Option[Long] = None,
                    verifyManifest: Boolean = false,
                    glob: String = "shard-*.tar"): DataFrame = {
    import spark.implicits._
    val entryCap = maxEntryBytes.getOrElse(
      spark.conf.get("spark.graft.tarMaxEntryBytes", (1L << 30).toString).toLong)
    require(entryCap > 0, s"maxEntryBytes must be positive, got $entryCap")
    val confMap = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(dir).toUri
    val shards = Option(fs.globStatus(new org.apache.hadoop.fs.Path(dir, glob)))
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile).map(_.getPath.toString).sorted
    // verify-on-read: the loader-side enforcement of the published
    // manifest, at zero extra passes — the SAME bytes the tar parse
    // consumes stream through a digest, and a FULLY-read shard that
    // does not hash to its manifest entry fails the task loudly.
    // O(files)-small map, broadcast once; missing manifest entries for
    // a read shard also refuse (an unlisted shard is not a delivery).
    val expectedShas: Option[org.apache.spark.broadcast.Broadcast[Map[String, String]]] =
      if (!verifyManifest) None
      else Some(spark.sparkContext.broadcast(
        ExportIntegrity.readManifest(spark, path).collect()
          .map(r => r.getString(0) -> r.getString(2)).toMap))
    spark.createDataset(shards)
      .repartition(math.max(1, math.min(shards.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { p =>
        import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
        val conf = new org.apache.hadoop.conf.Configuration()
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val hp = new org.apache.hadoop.fs.Path(p)
        val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(hp.getName)
          .map(_.group(1).toLong).getOrElse(-1L)
        // manifest keys are paths RELATIVE to the export root — the
        // same id [[ExportIntegrity.fingerprintFiles]] writes — so
        // nested layouts (batch-*/shard-*.tar) verify too
        val relName = rootUri.relativize(hp.toUri).getPath
        val digest = expectedShas.map(_ =>
          java.security.MessageDigest.getInstance("SHA-256"))
        val raw: java.io.InputStream = digest match {
          case Some(d) => new java.security.DigestInputStream(
            hp.getFileSystem(conf).open(hp), d)
          case None => hp.getFileSystem(conf).open(hp)
        }
        val in = new TarArchiveInputStream(raw)
        TarExport.openTarStreams.incrementAndGet()
        val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeOnce(): Unit =
          if (closed.compareAndSet(false, true)) {
            TarExport.openTarStreams.decrementAndGet()
            try in.close() catch { case _: java.io.IOException => () }
          }
        // the task completion listener is the backstop for every exit
        // the iterator cannot see: a downstream limit() that stops
        // pulling mid-shard, a sibling task's failure cancelling the
        // stage — without it the open handle would live until executor
        // GC. closeOnce is idempotent, so the eager closes below and
        // the listener compose safely.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        // iterator wrapper keeps the streaming shape (flatMap pulls
        // lazily); the stream also closes EAGERLY when the last entry
        // is consumed or the walk fails — not only at task end, so a
        // task that owns several shards holds one handle at a time
        new Iterator[(Long, String, Array[Byte])] {
          private var nextEntry = advance()
          // only a FULLY-consumed shard verifies (an early-exiting
          // limit() never reaches end-of-archive, so it neither checks
          // nor spuriously fails); the tar parse stops before the
          // trailing padding, so drain the raw stream to EOF first —
          // the manifest sha covers the whole file
          private def verifyAtEof(): Unit =
            for (d <- digest; bc <- expectedShas) {
              val buf = new Array[Byte](8192)
              while (raw.read(buf) >= 0) ()
              val actual = d.digest().map("%02x".format(_)).mkString
              val expected = bc.value.get(relName)
              if (!expected.contains(actual)) {
                closeOnce()
                throw new java.io.IOException(expected match {
                  case Some(sha) => s"shard $p read fully but hashes to " +
                    s"$actual, not the published manifest sha $sha — " +
                    "refusing a corrupt delivery"
                  case None => s"shard $p is not in ${ExportIntegrity.ManifestName}" +
                    " — refusing an unlisted file under verifyManifest"
                })
              }
            }
          private def advance() = {
            val e = in.getNextEntry
            if (e == null) { verifyAtEof(); closeOnce(); null } else e
          }
          def hasNext: Boolean = nextEntry != null
          def next(): (Long, String, Array[Byte]) = {
            val e = nextEntry
            // refuse the allocation BEFORE making it: the header size is
            // untrusted input, and readAllBytes would grow a buffer
            // toward whatever it claims
            if (e.getSize > entryCap) {
              closeOnce()
              throw new java.io.IOException(
                s"tar entry '${e.getName}' in $p claims ${e.getSize} bytes " +
                  s"— over the $entryCap-byte cap " +
                  "(spark.graft.tarMaxEntryBytes / maxEntryBytes); " +
                  "refusing the allocation on a corrupt or hostile header")
            }
            val bytes = try in.readAllBytes()
            catch { case t: Throwable => closeOnce(); throw t }
            val row = (shard, e.getName, bytes)
            nextEntry = advance()
            row
          }
        }
      }
      .toDF("shard", "name", "content")
  }

  /** Read tar shards back at the SAMPLE grain: one row per training
    * sample, `(shard, key, entries)` with `entries` the
    * extension→bytes map — exactly what a WebDataset loader hands the
    * collate step after grouping a sample's files. `123.txt` +
    * `123.json` become one row keyed `"123"` with entries
    * `{"txt": …, "json": …}`; a modality skipped at write time (NULL
    * column) is simply absent from the map.
    *
    * Scale shape: NO shuffle. [[writeTarShards]] guarantees a sample's
    * entries are CONTIGUOUS inside their shard and shards are read one
    * task per file, so the regrouping is a per-partition fold over
    * adjacent entries — `mapPartitions` state of ONE sample, never a
    * `groupBy(key)` exchange of the corpus. The extension is taken
    * after the LAST '.' (entry extensions never contain dots — the
    * writer's `<key>.<ext>` naming; keys themselves may contain dots
    * and survive whole). Adjacent entries sharing a key coalesce into
    * one sample — the WebDataset grouping rule; feed the writer unique
    * keys (duplicate keys with the same extension keep the LAST bytes,
    * like any loader's dict-build would). Inherits [[readTarShards]]'s
    * defenses: checksum-verified framing, loud truncation, the
    * entry-size cap, close-on-every-task-exit, and (opt-in)
    * manifest-enforced shard hashes.
    */
  def readTarSamples(spark: SparkSession, path: String,
                     maxEntryBytes: Option[Long] = None,
                     verifyManifest: Boolean = false,
                     glob: String = "shard-*.tar"): DataFrame = {
    import spark.implicits._
    readTarShards(spark, path, maxEntryBytes, verifyManifest, glob)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { entries =>
        // contiguity makes this a streaming fold: buffer ONE sample,
        // emit it when the key (or shard) changes
        new Iterator[(Long, String, Map[String, Array[Byte]])] {
          private var pending: Option[(Long, String)] = None
          private val buf = scala.collection.mutable.LinkedHashMap
            .empty[String, Array[Byte]]
          private var out: (Long, String, Map[String, Array[Byte]]) = null
          private def splitName(name: String): (String, String) = {
            val dot = name.lastIndexOf('.')
            if (dot <= 0) (name, "") else (name.take(dot), name.drop(dot + 1))
          }
          private def flush(): Unit = pending match {
            case Some((sh, k)) => out = (sh, k, buf.toMap); buf.clear()
            case None          => ()
          }
          @annotation.tailrec
          private def advance(): Boolean =
            if (out != null) true
            else if (!entries.hasNext) { flush(); pending = None; out != null }
            else {
              val (sh, name, bytes) = entries.next()
              val (k, ext) = splitName(name)
              if (!pending.contains((sh, k))) { flush(); pending = Some((sh, k)) }
              buf.put(ext, bytes)
              advance()
            }
          def hasNext: Boolean = advance()
          def next(): (Long, String, Map[String, Array[Byte]]) = {
            if (!advance()) throw new NoSuchElementException
            val r = out; out = null; r
          }
        }
      }
      .toDF("shard", "key", "entries")
  }

  /** The per-sample index of an `index = true` export:
    * `(shard, key, offset, entries, bytes)` — one row per SAMPLE, with
    * `offset` the sample's first header byte inside its shard. This is
    * the wids-style random-access companion the WebDataset ecosystem
    * publishes next to sequential tar shards: sequential training reads
    * stream the tars; evaluation, debugging, and per-sample serving
    * seek straight to a sample instead of scanning its shard. The index
    * is sample-grain DATA (a 10⁹-sample corpus has 10⁹ rows), so it is
    * read DISTRIBUTED — one jsonl sidecar per shard, scanned in
    * parallel like any data source, never collected.
    */
  def readTarIndex(spark: SparkSession, path: String,
                   glob: String = "shard-*.tar"): DataFrame = {
    spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "key STRING, offset BIGINT, entries BIGINT, bytes BIGINT"))
      .json(new org.apache.hadoop.fs.Path(path, glob + ".idx.jsonl").toString)
      .withColumn("shard",
        regexp_extract(input_file_name(), "shard-(\\d+)\\.tar\\.idx\\.jsonl", 1)
          .cast("long"))
      .withColumn("file",
        regexp_replace(input_file_name(), "\\.idx\\.jsonl$", ""))
      .select("shard", "key", "offset", "entries", "bytes", "file")
  }

  /** Random-access point lookup into an indexed tar delivery: join the
    * requested `keys` frame (a `key` string column) against the
    * [[readTarIndex]] sidecars, then SEEK straight to each hit — one
    * open per (task, shard file), offsets read in ascending order, only
    * the matched samples' bytes ever leave the disk. Returns the
    * [[readTarSamples]] shape `(shard, key, entries)`. The scale story
    * of the serving point-lookup applied to deliveries: cost is
    * O(index scan) + O(matched samples), never O(corpus bytes) — the
    * shard tars themselves are touched only at the matched offsets.
    * Absent keys return no row. Inherits the entry-size cap.
    */
  def lookupTarSamples(spark: SparkSession, path: String, keys: DataFrame,
                       glob: String = "shard-*.tar",
                       maxEntryBytes: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val entryCap = maxEntryBytes.getOrElse(
      spark.conf.get("spark.graft.tarMaxEntryBytes", (1L << 30).toString).toLong)
    val confMap = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    val hits = readTarIndex(spark, path, glob)
      .join(keys.select(col("key").cast("string").as("key")).distinct(), "key")
    hits
      .repartition(col("file"))
      .sortWithinPartitions("file", "offset")
      .select(col("file"), col("shard"), col("key"), col("offset"))
      .as[(String, Long, String, Long)]
      .mapPartitions { rows =>
        import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
        val conf = new org.apache.hadoop.conf.Configuration()
        confMap.foreach { case (k, v) => conf.set(k, v) }
        var curFile: String = null
        var raw: org.apache.hadoop.fs.FSDataInputStream = null
        def closeRaw(): Unit = if (raw != null) {
          try raw.close() catch { case _: java.io.IOException => () }
          raw = null; curFile = null
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeRaw()))
        val it = rows.map { case (file, shard, key, offset) =>
          if (file != curFile) {
            closeRaw()
            val hp = new org.apache.hadoop.fs.Path(file)
            raw = hp.getFileSystem(conf).open(hp)
            curFile = file
          }
          raw.seek(offset)
          // a fresh tar decoder per seek (tar framing is stateful); it
          // must NOT close the underlying file stream — more offsets of
          // the same shard may follow
          val tin = new TarArchiveInputStream(
            new java.io.FilterInputStream(raw) { override def close(): Unit = () })
          val buf = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
          var e = tin.getNextEntry
          while (e != null && {
            val dot = e.getName.lastIndexOf('.')
            (if (dot <= 0) e.getName else e.getName.take(dot)) == key
          }) {
            if (e.getSize > entryCap)
              throw new java.io.IOException(
                s"tar entry '${e.getName}' in $file claims ${e.getSize} bytes " +
                  s"— over the $entryCap-byte cap " +
                  "(spark.graft.tarMaxEntryBytes / maxEntryBytes)")
            val dot = e.getName.lastIndexOf('.')
            buf.put(if (dot <= 0) "" else e.getName.drop(dot + 1),
              tin.readAllBytes())
            e = tin.getNextEntry
          }
          (shard, key, buf.toMap)
        }
        // eager close when the last hit is consumed (the listener is the
        // backstop for early exits)
        new Iterator[(Long, String, Map[String, Array[Byte]])] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) closeRaw(); h }
          def next(): (Long, String, Map[String, Array[Byte]]) = it.next()
        }
      }
      .toDF("shard", "key", "entries")
  }
}
