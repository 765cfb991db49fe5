package graft.store

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins `footerMaxId`'s never-guess contract against foreign writers and
  * the pre-compaction many-files worst case (VERDICT r9 #5). The footer
  * pass is a driver-side O(#files) metadata walk — correct only because
  * it DECLINES whenever footers cannot prove the answer; an
  * under-reported max would mint colliding SERIAL ids.
  */
class FooterMaxIdSpec extends AnyFunSuite with SharedSpark {

  test("hundreds of small files: footers answer without a scan") {
    import spark.implicits._
    val ts = new TableStore(spark, tmpDir("tables"))
    // the pre-compaction worst case — one file per streamed batch
    ts.append("t", (1L to 5000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(300))
    assert(ts.footerMaxId("t", "id") == Some(5000L))
    assert(ts.maxId("t", "id") == 5000L)
  }

  test("a visible extension-less foreign data file forces the exact scan") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // a foreign writer drops a data file WITHOUT the .parquet extension:
    // spark.read.parquet still reads it, so footers must decline or the
    // two paths diverge on the max (the colliding-id hazard)
    val scratch = tmpDir("scratch")
    Seq((999999L, "foreign")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$scratch/one")
    val part = new java.io.File(s"$scratch/one").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$root/t/foreign-data"))
    assert(ts.footerMaxId("t", "id").isEmpty,
      "footers must decline when a visible non-parquet file exists")
    assert(ts.maxId("t", "id") == 999999L, "the scan sees the foreign file")
  }

  test("a foreign file written without statistics forces the exact scan") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val schema = MessageTypeParser.parseMessageType(
      "message t { required int64 id; optional binary v (UTF8); }")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(s"$root/t/foreign.parquet"))
      .withConf(conf).withStatisticsEnabled(false).build()
    try w.write(new SimpleGroupFactory(schema).newGroup()
      .append("id", 999999L).append("v", "z"))
    finally w.close()
    assert(ts.footerMaxId("t", "id").isEmpty,
      "min/max absent without an all-null proof must decline")
    assert(ts.maxId("t", "id") == 999999L)
  }

  test("past the file-count threshold, the executor tier answers identically") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    // > threshold files: footerMaxId switches from the driver pool to the
    // executor-side job — answers must be exactly the driver tier's / the
    // scan's
    val n = TableStore.ExecutorFooterThreshold + 76
    ts.append("t", (1L to n.toLong).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(n))
    assert(ts.footerMaxId("t", "id") == Some(n.toLong))
    assert(ts.maxId("t", "id") == n.toLong)
    // the never-guess rules hold on the executor tier too: ONE stats-less
    // foreign file among the >1k must force the exact scan
    val schema = MessageTypeParser.parseMessageType(
      "message t { required int64 id; optional binary v (UTF8); }")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(s"$root/t/foreign.parquet"))
      .withConf(conf).withStatisticsEnabled(false).build()
    try w.write(new SimpleGroupFactory(schema).newGroup()
      .append("id", 999999L).append("v", "z"))
    finally w.close()
    assert(ts.footerMaxId("t", "id").isEmpty,
      "executor tier must decline on an unusable footer, never guess")
    assert(ts.maxId("t", "id") == 999999L, "the scan sees the foreign file")
  }

  test("all-negative ids: footer path matches the scan exactly") {
    import spark.implicits._
    val ts = new TableStore(spark, tmpDir("tables"))
    ts.append("t", Seq((-5L, "a"), (-3L, "b")).toDF("id", "v"))
    assert(ts.footerMaxId("t", "id") == Some(-3L),
      "a zero-seeded accumulator would silently report 0 here")
    assert(ts.maxId("t", "id") == -3L)
  }
}
