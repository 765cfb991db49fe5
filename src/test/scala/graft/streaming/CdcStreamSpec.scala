package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.store.TableStore

/** Pins the continuous CDC apply (round 12): a streaming changefeed of
  * upserts + tombstones maintained into a TableStore table with
  * exactly-once STATE across restarts, and the writer lease held for
  * the stream's lifetime.
  */
class CdcStreamSpec extends AnyFunSuite with SharedSpark {

  test("a file changefeed applies across triggers; restart re-converges") {
    import spark.implicits._
    val root = tmpDir("cdc-stream")
    val feedDir = s"$root/feed"
    val ckpt = s"$root/ckpt"
    val ts = new TableStore(spark, s"$root/tables")
    ts.append("t", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))

    val schema = "id BIGINT, v STRING, _deleted BOOLEAN"
    def runOnce(): Unit = {
      val feed = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
        .parquet(feedDir)
      val q = CdcStream(ts, "t", feed, Seq("id"), ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    // batch 1: upsert id 5, delete id 42, insert id 200
    Seq((5L, "updated", false), (42L, null.asInstanceOf[String], true),
      (200L, "inserted", false))
      .toDF("id", "v", "_deleted").coalesce(1)
      .write.mode("append").parquet(feedDir)
    runOnce()
    assert(ts.read("t").count() == 100)
    assert(ts.read("t").filter(col("id") === 5L).head().getString(1) == "updated")
    assert(ts.read("t").filter(col("id") === 42L).count() == 0)

    // batch 2 arrives later: delete the inserted row, upsert another
    Seq((200L, null.asInstanceOf[String], true), (7L, "seven", false))
      .toDF("id", "v", "_deleted").coalesce(1)
      .write.mode("append").parquet(feedDir)
    runOnce()
    assert(ts.read("t").count() == 99)
    assert(ts.read("t").filter(col("id") === 7L).head().getString(1) == "seven")

    // restart on the same checkpoint with nothing new: state unchanged
    runOnce()
    assert(ts.read("t").count() == 99)
    // the lease released on termination — a successor acquires at once
    assert(new TableStore(spark, s"$root/tables").acquireWriterLease("t"))
  }

  test("a live foreign lease refuses the stream before it starts") {
    import spark.implicits._
    val root = tmpDir("cdc-stream-lease")
    val ts = new TableStore(spark, s"$root/tables")
    ts.append("t", Seq((1L, "a")).toDF("id", "v"))
    val foreign = new TableStore(spark, s"$root/tables")
    assert(foreign.acquireWriterLease("t"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/feed"))
    val feed = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING, _deleted BOOLEAN"))
      .parquet(s"$root/feed")
    val e = intercept[IllegalStateException] {
      CdcStream(ts, "t", feed, Seq("id"), s"$root/ckpt")
    }
    assert(e.getMessage.contains("lease"))
    foreign.releaseWriterLease("t")
  }

  test("two streams on a NOT-YET-EXISTING table: the second refuses at startup") {
    // round-12 hole: acquire on a missing table was vacuous, so two
    // streams racing to CREATE the same table both passed the gate; the
    // pre-table lease now fences from the first call
    import spark.implicits._
    val root = tmpDir("cdc-stream-fresh")
    val ts = new TableStore(spark, s"$root/tables")
    val other = new TableStore(spark, s"$root/tables")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/feed"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, _deleted BOOLEAN")
    Seq((1L, "a", false)).toDF("id", "v", "_deleted").coalesce(1)
      .write.mode("append").parquet(s"$root/feed")
    val q = CdcStream(ts, "fresh_t",
      spark.readStream.schema(schema).parquet(s"$root/feed"),
      Seq("id"), s"$root/ckpt1",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      val e = intercept[IllegalStateException] {
        CdcStream(other, "fresh_t",
          spark.readStream.schema(schema).parquet(s"$root/feed"),
          Seq("id"), s"$root/ckpt2")
      }
      assert(e.getMessage.contains("lease"))
    } finally q.awaitTermination()
    assert(ts.read("fresh_t").count() == 1,
      "the fenced winner's creating swap must complete normally")
    // termination released the lease; a successor may start now
    assert(other.acquireWriterLease("fresh_t"))
  }
}
