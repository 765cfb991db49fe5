package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** r21 write-once contract: producing (and collecting) the export's
  * accounting frame must run the shard writer EXACTLY once per shard.
  * Before r21 the frame's terminal `orderBy` planned a range exchange
  * whose boundary sampling re-executed the narrow child — the tar
  * writer itself — committing every shard twice (idempotent bytes,
  * doubled I/O). The JVM-local commit counter pins the fix.
  */
class TarExportWriteOnceSpec extends AnyFunSuite with SharedSpark {

  test("writeTarShards commits each shard exactly once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tar-write-once").toString
    val df = (0L until 500L).map(i => (i, s"text-$i")).toDF("id", "text")
    val before = TarExport.committedShardCount.get()
    val acct = TarExport.writeTarShards(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("text")), 100L, s"$root/out").collect()
    val committed = TarExport.committedShardCount.get() - before
    assert(acct.length == 5)
    assert(acct.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L),
      "accounting frame stays shard-sorted")
    assert(committed == 5L,
      s"each shard must be committed exactly once (got $committed commits for 5 shards)")
  }

  test("writeTarShardsByBytes commits each shard exactly once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tar-write-once-b").toString
    val df = (0L until 500L).map(i => (i, s"text-$i")).toDF("id", "text")
    val before = TarExport.committedShardCount.get()
    val acct = TarExport.writeTarShardsByBytes(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("text")), 64 * 1024L, s"$root/out").collect()
    val committed = TarExport.committedShardCount.get() - before
    assert(acct.nonEmpty)
    assert(committed == acct.length.toLong,
      s"each shard must be committed exactly once (got $committed commits " +
        s"for ${acct.length} shards)")
  }
}
