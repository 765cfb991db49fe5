package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the JSONL shard export (round 12): deterministic sharding, one
  * gzipped file per shard, ordinal order inside each file, and a lossless
  * round trip through `spark.read.json`.
  */
class ExportSpec extends AnyFunSuite with SharedSpark {

  test("export shards deterministically and round-trips losslessly") {
    import spark.implicits._
    val root = tmpDir("jsonl-export")
    val df = (1L to 1000L).map(i => (i, s"text $i", i % 7)).toDF("id", "text", "grp")
    val shards = Export.writeJsonlShards(df, Seq(col("id")), 100L, s"$root/out")
    assert(shards == 10)
    // one gzipped file per shard dir
    val dirs = new java.io.File(s"$root/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_shard="))
    assert(dirs.length == 10)
    for (d <- dirs) {
      val files = d.listFiles().filter(_.getName.endsWith(".txt.gz"))
      assert(files.length == 1, s"${d.getName} must hold exactly one file")
    }
    // round trip: every row and value returns
    val back = Export.readJsonlShards(spark, s"$root/out")
    assert(back.count() == 1000)
    assert(back.select("id", "text", "grp").as[(Long, String, Long)]
      .collect().toSet == df.as[(Long, String, Long)].collect().toSet)
    // shard 0 holds exactly ids 1..100 in order (deterministic export)
    val s0 = spark.read.textFile(s"$root/out/_shard=0").collect()
    assert(s0.length == 100)
    assert(s0.head.contains("\"id\":1,") || s0.head.contains("\"id\":1}"))
    assert(s0.zipWithIndex.forall { case (line, i) =>
      line.contains(s""""id":${i + 1},""") || line.contains(s""""id":${i + 1}}""")
    }, "lines inside a shard must follow the export order")
    // explicit schema skips inference and types identically
    val typed = Export.readJsonlShards(spark, s"$root/out",
      Some("id BIGINT, text STRING, grp BIGINT"))
    assert(typed.select(sum("id")).head().getLong(0) == (1L to 1000L).sum)
  }

  test("empty frame exports zero shards; uneven tail shard is smaller") {
    import spark.implicits._
    val root = tmpDir("jsonl-edge")
    assert(Export.writeJsonlShards(
      Seq.empty[(Long, String)].toDF("id", "t"), Seq(col("id")),
      10L, s"$root/none") == 0L)
    assert(!new java.io.File(s"$root/none").exists())
    val n = Export.writeJsonlShards(
      (1L to 25L).map(i => (i, s"t$i")).toDF("id", "t"),
      Seq(col("id")), 10L, s"$root/tail")
    assert(n == 3)
    assert(spark.read.textFile(s"$root/tail/_shard=2").count() == 5)
  }
}
