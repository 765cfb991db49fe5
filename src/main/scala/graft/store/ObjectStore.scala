package graft.store

import java.io.{ByteArrayOutputStream, InputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object store for chart PNGs, keyed by the reference's path convention
  * `documents/{document_id}/charts/{chart_id}.png` (minio.py:46,67,88).
  * Backed by any Hadoop FileSystem — local paths in tests, `s3a://` in
  * production (the Hadoop S3A connector replaces the MinIO SDK).
  *
  * Bulk writes go through `putAll` (executor-side foreachPartition) so
  * image upload parallelizes with the rest of the job instead of
  * serializing through the driver.
  */
final class ObjectStore(spark: SparkSession, bucketRoot: String) {

  /** Composite cross-store key (minio.py:46). */
  def chartKey(documentId: Long, chartId: Long): String =
    s"documents/$documentId/charts/$chartId.png"

  private def fullPath(key: String) = new Path(s"$bucketRoot/$key")

  private def fs: FileSystem =
    new Path(bucketRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All stored object keys (relative to the bucket root) as a single
    * `key` column. Uses the binaryFile source with only the path column
    * projected, so no object CONTENT is read — listing scales with file
    * count, not byte volume. Empty/missing bucket → empty frame.
    */
  def listKeys(): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    if (!fs.exists(new Path(bucketRoot)))
      return Seq.empty[String].toDF("key")
    val rootUri = fs.makeQualified(new Path(bucketRoot)).toString
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(bucketRoot)
      .select(col("path"))
      .withColumn("key",
        regexp_replace(col("path"), java.util.regex.Pattern.quote(rootUri + "/"), ""))
      .select("key")
  }

  /** S11 — single put (minio.py:38-59). Returns the key. */
  def put(key: String, data: Array[Byte]): String = {
    ObjectStore.requireListableKey(key)
    val out = fs.create(fullPath(key), true)
    try out.write(data) finally out.close()
    key
  }

  /** S8 — get bytes + content type (minio.py:61-80). */
  def get(key: String): Option[(Array[Byte], String)] = {
    val p = fullPath(key)
    val f = fs
    if (!f.exists(p)) None
    else {
      val in: InputStream = f.open(p)
      try {
        val buf = new ByteArrayOutputStream()
        val tmp = new Array[Byte](64 * 1024)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        val ct = if (key.endsWith(".png")) "image/png" else "application/octet-stream"
        Some((buf.toByteArray, ct))
      } finally in.close()
    }
  }

  /** M3 — delete one object (minio.py:82-96). */
  def delete(key: String): Boolean = fs.delete(fullPath(key), false)

  /** Distributed bulk put: df must carry (`key` string, `content` binary).
    * Runs on executors; one FileSystem per partition (init-once, like the
    * reference's per-process client — minio.py:17-28).
    */
  /** Hadoop Configuration is not serializable; ship its entries as a map
    * and rebuild per partition (init-once, like the reference's
    * per-process client — minio.py:17-28). Shared by the executor-side
    * bulk operations.
    */
  private def serializableHadoopConf: Map[String, String] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  def putAll(df: DataFrame): Unit = {
    val rootStr = bucketRoot
    val confMap = serializableHadoopConf
    df.select("key", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val f = new Path(rootStr).getFileSystem(conf)
        rows.foreach { r =>
          val key = r.getString(0)
          ObjectStore.requireListableKey(key)
          val out = f.create(new Path(s"$rootStr/$key"), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
    }
  }

  /** Distributed bulk delete: `keysDf` must carry a `key` string column.
    * Executor-side, one FileSystem per partition like [[putAll]]. Returns
    * a BEST-EFFORT removed count: the tally runs inside tasks, so a task
    * retry that re-deletes already-absent keys undercounts — callers
    * needing an exact number must count the key set before deleting
    * (deletion itself stays idempotent and correct under retries).
    */
  def deleteAll(keysDf: DataFrame): Long = {
    val rootStr = bucketRoot
    val confMap = serializableHadoopConf
    val sess = keysDf.sparkSession
    import sess.implicits._
    keysDf.select("key").as[String].mapPartitions { keys =>
      val conf = new Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val f = new Path(rootStr).getFileSystem(conf)
      var n = 0L
      keys.foreach { key =>
        ObjectStore.requireListableKey(key)
        if (f.delete(new Path(s"$rootStr/$key"), false)) n += 1
      }
      Iterator.single(n)
    }.collect().sum // collect, not reduce: an empty listing has no partitions to reduce
  }
}

object ObjectStore {
  /** Object keys must have no hidden ('_'/'.'-prefixed) path segment:
    * Spark's file index skips hidden paths, so such a blob would be
    * stored-but-unlistable — invisible to listKeys()/the consistency
    * audit. The chart key convention never produces one; rejecting them
    * at put time keeps `listKeys` an exhaustive listing. Lives on the
    * companion so the executor-side putAll closure shares the SAME rule
    * as driver-side put (two copies would drift).
    */
  private[store] def requireListableKey(key: String): Unit =
    require(!key.split("/").exists(s => s.startsWith("_") || s.startsWith(".")),
      s"object key '$key' has a hidden path segment — it would be stored " +
        "but invisible to listKeys()/Audit")
}
