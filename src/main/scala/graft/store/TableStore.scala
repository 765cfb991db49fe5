package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed relational table store with CRUD semantics over immutable
  * files (SURVEY §7.4.1). Reads/appends are plain Spark jobs; UPDATE and
  * DELETE are copy-on-write rewrites committed with an atomic directory
  * swap, replicating the reference's single-row mutations (base.py:38-66)
  * under a single-writer contract (the reference, too, has exactly one
  * writer — its lone watchdog handler, main.py:154-159).
  *
  * Scale note: the rewrite touches the whole table, which is correct but
  * heavy; at cluster scale tables are partitioned (`partitionBy`) so the
  * rewrite can be limited to affected partitions, and appends never rewrite.
  */
final class TableStore(spark: SparkSession, root: String) {

  private def tablePath(table: String) = s"$root/$table"

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(table: String): Boolean = fs.exists(new Path(tablePath(table)))

  def read(table: String): DataFrame = spark.read.parquet(tablePath(table))

  /** S9 — append-only insert (base.py:13-22). */
  def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(tablePath(table))

  /** Append with hive-style partitioning. At 100 TB, child tables are
    * partitioned by a bounded hash bucket of the parent key (SURVEY
    * §7.4.7) so point lookups become partition-pruned scans instead of
    * full-table reads.
    */
  def appendPartitioned(table: String, df: DataFrame,
                        partitionCols: Seq[String]): Unit = {
    // appending nothing is a no-op — and an empty partitioned write would
    // create a file-less directory that poisons schema inference
    if (df.isEmpty) return
    // clear an empty-table schema marker (see overwriteAtomic) so the
    // layout stays uniformly partitioned; an unreadable (file-less) dir
    // counts as empty
    if (exists(table)) {
      val dir = new Path(tablePath(table))
      // only ever delete a table that is VERIFIABLY empty: either the
      // directory holds no data files at all, or it reads as zero rows
      // (the empty-table schema marker). A read failure on a table that
      // does have data files is a real error and must propagate — treating
      // it as "empty" would destroy a healthy table on a transient fault.
      val f = fs
      // a file only counts as data if NO path component below the table
      // root is hidden — a crashed write's `_temporary/.../part-*.parquet`
      // must read as "no data" (the leaf name alone looks like data), or
      // the table wedges permanently: read() throws on a dir whose only
      // files are under _temporary, and nothing would ever clean it
      val rootPath = f.makeQualified(dir).toUri.getPath
      def hasDataFiles: Boolean = {
        val it = f.listFiles(dir, true)
        var found = false
        while (!found && it.hasNext) {
          val rel = it.next().getPath.toUri.getPath
            .stripPrefix(rootPath).stripPrefix("/")
          if (!rel.split("/").exists(seg =>
            seg.startsWith("_") || seg.startsWith("."))) found = true
        }
        found
      }
      // sidecar props must survive the empty-marker clearing — wiping
      // them with the marker would strip layout metadata (the exact
      // mismatch the props exist to prevent); captured before the delete,
      // re-written after the append recreates the directory
      val props = allTableProps(table)
      if (!hasDataFiles || read(table).isEmpty) {
        f.delete(dir, true)
        df.write.mode("append").partitionBy(partitionCols: _*)
          .parquet(tablePath(table))
        props.foreach { case (k, v) => setTableProp(table, k, v) }
        return
      }
    }
    df.write.mode("append").partitionBy(partitionCols: _*)
      .parquet(tablePath(table))
  }

  /** Replace a table's contents atomically: materialize to a temp dir
    * next to the table, then swap via rename (close to atomic on HDFS-like
    * filesystems; on object stores, swap the pointer in a manifest
    * instead — same discipline, different primitive).
    *
    * Crash-safety contract (verified by the StoresSpec crash-point
    * property test via [[failpoint]]): a crash at ANY point leaves the
    * table readable as fully-old or fully-new rows — never a mixture,
    * never a half-written file set — because the only path readers see
    * changes solely via whole-directory renames. `_graft_*` sidecar
    * props are copied INTO the temp dir before the swap, so they travel
    * with the data rename — old table ⇒ props intact, new table ⇒ props
    * intact, never a table stripped of its layout metadata. The swap
    * itself is two renames, so there is an instant where the table path
    * does not exist; under the single-writer contract a concurrent
    * reader can transiently fail there (retryable), and a crash INSIDE
    * the window leaves the data recoverable in the `.old-*` sibling.
    * Stranded `.tmp-*` / `.old-*` siblings are invisible to `read`
    * (distinct directory names) and are garbage, not corruption.
    */
  def overwriteAtomic(table: String, df: DataFrame,
                      partitionCols: Seq[String] = Nil): Unit = {
    val dest = new Path(tablePath(table))
    val tmp = new Path(tablePath(table) + s".tmp-${System.nanoTime()}")
    val old = new Path(tablePath(table) + s".old-${System.nanoTime()}")
    // an empty partitioned write produces no files at all (schema lost);
    // fall back to one empty unpartitioned file, which preserves schema —
    // appendPartitioned clears it before the next partitioned append
    val effectiveParts = if (partitionCols.nonEmpty && df.isEmpty) Nil else partitionCols
    val props = allTableProps(table) // survive the swap
    df.write.mode("overwrite").partitionBy(effectiveParts: _*)
      .parquet(tmp.toString) // forces execution first
    props.foreach { case (k, v) => writePropFile(new Path(tmp, s"_graft_$k"), v) }
    failpoint("tmp-written")
    val f = fs
    if (f.exists(dest) && !f.rename(dest, old))
      throw new java.io.IOException(s"swap failed for $table")
    failpoint("old-aside")
    if (!f.rename(tmp, dest)) {
      f.rename(old, dest) // roll back
      throw new java.io.IOException(s"swap failed for $table")
    }
    failpoint("swapped")
    f.delete(old, true)
  }

  /** Crash-injection seam for the swap's property test: called at the
    * named points of the two-rename commit; a production store never
    * assigns it, so it stays a no-op. Deterministic injection is the only
    * way to pin the fully-old-or-fully-new contract — real filesystem
    * fault timing isn't reproducible in CI.
    */
  private[store] var failpoint: String => Unit = _ => ()

  /** M1 — partial update by predicate (base.py:38-52): copy-on-write
    * column rewrite. `assignments` are applied only where `cond` holds;
    * pass an `updated_at` assignment to mirror the onupdate trigger
    * (schema.py:33-37).
    */
  def updateWhere(table: String, cond: Column,
                  assignments: Map[String, Column],
                  partitionCols: Seq[String] = Nil): Unit = {
    val updated = assignments.foldLeft(read(table)) { case (df, (name, value)) =>
      df.withColumn(name, when(cond, value).otherwise(col(name)))
    }
    overwriteAtomic(table, updated, partitionCols)
  }

  /** M2/J4 — delete by predicate as a keep-the-rest rewrite. NULL-valued
    * predicates keep the row (NOT NULL is NULL and would silently delete
    * otherwise).
    */
  def deleteWhere(table: String, cond: Column,
                  partitionCols: Seq[String] = Nil): Unit =
    overwriteAtomic(table, read(table).filter(!coalesce(cond, lit(false))), partitionCols)

  /** Max value of an id column, or 0 on empty/missing table (the SERIAL
    * replacement — SURVEY §7.4.2).
    *
    * Answered from parquet FOOTER STATISTICS — O(#files) metadata reads
    * instead of an O(rows) column scan. Streaming ingest calls this once
    * per table per micro-batch, so at corpus scale the scan version
    * would re-read billions of id values every trigger; footers are a
    * few KB each and [[compact]] keeps the file count bounded. Falls
    * back to the exact scan whenever any footer lacks usable statistics
    * (foreign writers, type mismatch) — never trusts a partial answer,
    * because an under-reported max would mint colliding SERIAL ids.
    */
  def maxId(table: String, idCol: String): Long =
    if (!exists(table)) 0L
    else footerMaxId(table, idCol).getOrElse(
      read(table).agg(coalesce(max(col(idCol)), lit(0L))).head().getLong(0))

  /** Max of `idCol` across every data file's row-group statistics, 0 when
    * the table has no non-null values (the empty-table marker included).
    * None = statistics unusable somewhere → caller must scan.
    */
  private[store] def footerMaxId(table: String, idCol: String): Option[Long] = try {
    import scala.jdk.CollectionConverters._
    val f = fs
    val dir = new Path(tablePath(table))
    val rootPath = f.makeQualified(dir).toUri.getPath
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = f.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
      // same hidden-path rule as appendPartitioned: _temporary/.old-*
      // debris is not data
      val hidden = rel.split("/").exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && st.getLen > 0 && rel.endsWith(".parquet")) files += st.getPath
    }
    val conf = spark.sparkContext.hadoopConfiguration
    var acc = 0L
    for (p <- files) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        for (bg <- reader.getFooter.getBlocks.asScala) {
          // a column absent from the footer (e.g. a hive PARTITION column)
          // or missing/untyped stats means footers cannot answer — bail
          val cc = bg.getColumns.asScala
            .find(_.getPath.toDotString == idCol)
            .getOrElse(return None)
          val stats = cc.getStatistics
          if (stats == null || stats.isEmpty) return None
          if (stats.hasNonNullValue) stats.genericGetMax match {
            case l: java.lang.Long    => acc = math.max(acc, l.longValue())
            case i: java.lang.Integer => acc = math.max(acc, i.longValue())
            case _                    => return None
          }
        }
      } finally reader.close()
    }
    Some(acc)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Total bytes of the table's DATA files (hidden `_temporary`/`.old-*`
    * debris excluded — the same visibility rule reads use). 0 for a
    * missing table. Callers size compaction targets from this.
    */
  def sizeInBytes(table: String): Long = {
    if (!exists(table)) return 0L
    val f = fs
    val dir = new Path(tablePath(table))
    val rootPath = f.makeQualified(dir).toUri.getPath
    var bytes = 0L
    val it = f.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPath).stripPrefix("/")
      val hidden = rel.split("/").exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && rel.endsWith(".parquet")) bytes += st.getLen
    }
    bytes
  }

  /** Compact a table's files: rewrite into ~`targetFiles` parquet files
    * (per partition directory when `partitionCols` is set). Streaming
    * ingest appends one-file-per-batch; without periodic compaction a
    * long-running stream degrades every scan with file-listing and
    * per-file open overhead. Uses the same atomic swap as the CRUD
    * rewrites, so readers never see a half-compacted table.
    */
  def compact(table: String, targetFiles: Int = 1,
              partitionCols: Seq[String] = Nil): Unit = {
    val df = read(table)
    val compacted =
      if (partitionCols.isEmpty) df.coalesce(targetFiles)
      else df.repartition(targetFiles, partitionCols.map(col): _*)
    overwriteAtomic(table, compacted, partitionCols)
  }

  // -------------------------------------------------------------------
  // Table properties: tiny `_graft_<key>` sidecar files inside the table
  // directory (underscore-prefixed, so parquet readers ignore them).
  // Used for layout metadata that must travel WITH the data — e.g. the
  // chunk bucket count, where a reader assuming the wrong value would
  // silently filter out rows.
  // -------------------------------------------------------------------

  private def propPath(table: String, key: String) =
    new Path(tablePath(table) + s"/_graft_$key")

  def setTableProp(table: String, key: String, value: String): Unit =
    writePropFile(propPath(table, key), value)

  private def writePropFile(at: Path, value: String): Unit = {
    val out = fs.create(at, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  def getTableProp(table: String, key: String): Option[String] =
    Sidecar.read(propPath(table, key), spark.sparkContext.hadoopConfiguration)

  private def allTableProps(table: String): Seq[(String, String)] =
    if (!exists(table)) Nil
    else fs.listStatus(new Path(tablePath(table))).toSeq
      .map(_.getPath.getName).filter(_.startsWith("_graft_"))
      .flatMap(n => getTableProp(table, n.stripPrefix("_graft_"))
        .map(v => n.stripPrefix("_graft_") -> v))
}
