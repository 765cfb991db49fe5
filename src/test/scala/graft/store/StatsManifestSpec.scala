package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the stats manifest — the sidecar cache that turns the pruned
  * reads' per-query O(#files) footer pass into O(new tail):
  *  - a fully-covered read answers with ZERO live footer opens and the
  *    exact same rows and pruning as the uncached path;
  *  - fresh appends are manifest MISSES read live (never wrong, just
  *    uncached) until the next refresh;
  *  - the manifest is advisory: deleting or corrupting it only costs
  *    footer reads, and an entry whose (len, mtime) no longer matches is
  *    ignored;
  *  - `compactIncremental` rebuilds it (the swap drops it by design).
  */
class StatsManifestSpec extends AnyFunSuite with SharedSpark {

  private def opens[T](body: => T): (T, Long) = {
    val before = TableStore.footerOpens.get()
    val r = body
    (r, TableStore.footerOpens.get() - before)
  }

  /** Three single-file appends with disjoint id ranges and string keys. */
  private def threeBatches(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, f"k$i%09d", s"v$i")).toDF("id", "key", "v").coalesce(1))
    ts
  }

  test("a fully-covered read performs zero live footer opens, same answer") {
    import spark.implicits._
    val root = tmpDir("manifest-basic")
    val ts = threeBatches(root)
    val (uncached, nLive) = opens {
      ts.readRange("t", "id", 120L, 180L).as[(Long, String, String)]
        .collect().toSet
    }
    assert(nLive == 3, s"uncached read must open all 3 footers, opened $nLive")

    // TWO declared columns still cost ONE footer open per file
    val (_, nDecl) = opens { ts.declareStatsColumns("t", Seq("id", "key")) }
    assert(nDecl == 3, s"multi-column refresh must open each footer once, opened $nDecl")
    val (cached, nCached) = opens {
      ts.readRange("t", "id", 120L, 180L).as[(Long, String, String)]
        .collect().toSet
    }
    assert(nCached == 0, s"covered read must open zero footers, opened $nCached")
    assert(cached == uncached && cached.size == 61)

    // the string column is covered by the same manifest
    val (pref, nPref) = opens { ts.readPrefix("t", "key", "k00000015").count() }
    assert(nPref == 0, s"prefix read must be covered too, opened $nPref")
    assert(pref == 10)
  }

  test("fresh appends are manifest misses: read live, still exact") {
    import spark.implicits._
    val root = tmpDir("manifest-append")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("id"))
    ts.append("t", Seq((1000L, "k1000", "x")).toDF("id", "key", "v").coalesce(1))
    val (got, nLive) = opens { ts.readRange("t", "id", 900L, 1100L).count() }
    assert(got == 1)
    assert(nLive == 1, s"exactly the ONE uncovered file reads live, opened $nLive")
    // refresh covers the tail again
    ts.refreshStatsManifest("t")
    val (_, nAfter) = opens { ts.readRange("t", "id", 900L, 1100L).count() }
    assert(nAfter == 0)
  }

  test("the manifest is advisory: deletion and corruption only cost footer reads") {
    val root = tmpDir("manifest-advisory")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("id"))
    val manifest = new java.io.File(s"$root/t/_stats_manifest")
    assert(manifest.exists())

    java.nio.file.Files.write(manifest.toPath, "garbage\nnot\tvalid".getBytes)
    val (got, nLive) = opens { ts.readRange("t", "id", 120L, 180L).count() }
    assert(got == 61, "corrupt manifest must not change results")
    assert(nLive == 3, "corrupt manifest → all footers read live")

    assert(manifest.delete())
    assert(ts.readRange("t", "id", 120L, 180L).count() == 61)
  }

  test("a stale entry (same rel, changed bytes) is ignored, not trusted") {
    import spark.implicits._
    val root = tmpDir("manifest-stale")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("id"))
    // overwrite one data file IN PLACE with different content (a foreign
    // writer's doing — this store never mutates files): its (len, mtime)
    // no longer matches, so the manifest entry must not answer for it
    val dataFile = new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    Seq((5000L, "k5000", "z")).toDF("id", "key", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/t.replacement")
    val repl = new java.io.File(s"$root/t.replacement").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(repl.toPath, dataFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the checksummed local FS keeps a .crc sidecar for the ORIGINAL
    // bytes; a real foreign overwrite replaces both — drop it here too
    new java.io.File(dataFile.getParent,
      "." + dataFile.getName + ".crc").delete()
    dataFile.setLastModified(System.currentTimeMillis() + 5000)

    val (got, nLive) = opens { ts.readRange("t", "id", 4000L, 6000L).count() }
    assert(got == 1, "the replaced file's row must be found via a live read")
    assert(nLive >= 1, "the stale file must be re-read live")
  }

  test("compactIncremental rebuilds the manifest across the swap") {
    import spark.implicits._
    val root = tmpDir("manifest-compact")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("id"))
    ts.compactIncremental("t", smallThreshold = 1L << 20)
    // post-compaction: one packed file, manifest rebuilt over it
    val (got, nLive) = opens { ts.readRange("t", "id", 120L, 180L).count() }
    assert(got == 61)
    assert(nLive == 0,
      s"compaction must leave a fresh manifest covering the packed file ($nLive live)")
    // declaration survives the swap (it is a _graft_ prop)
    assert(ts.getTableProp("t", "stats_cols").exists(_.contains("id:int")))
  }

  test("maxId answers from the manifest: zero live opens on a covered table") {
    import spark.implicits._
    val root = tmpDir("manifest-maxid")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("id"))
    val (m1, n1) = opens { ts.maxId("t", "id") }
    assert(m1 == 300L && n1 == 0,
      s"covered maxId must not open footers (opened $n1)")
    // an append is a miss until refresh — and the answer stays exact
    ts.append("t", Seq((9999L, "k9999", "x")).toDF("id", "key", "v").coalesce(1))
    val (m2, n2) = opens { ts.maxId("t", "id") }
    assert(m2 == 9999L && n2 == 1, s"one fresh file reads live (opened $n2)")
    // the never-guess rule survives caching: ONE stats-less foreign file
    // among covered ones forces the exact scan
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      "message t { required int64 id; optional binary key (UTF8); optional binary v (UTF8); }")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(
      new org.apache.hadoop.fs.Path(s"$root/t/foreign.parquet"))
      .withConf(conf).withStatisticsEnabled(false).build()
    try w.write(new SimpleGroupFactory(schema).newGroup()
      .append("id", 777777L).append("key", "k").append("v", "z"))
    finally w.close()
    assert(ts.footerMaxId("t", "id").isEmpty,
      "an unusable footer must decline even when other files are cached")
    assert(ts.maxId("t", "id") == 777777L, "the scan sees the foreign file")
  }

  test("a trailing-slash store root still prunes (path-normalization keying)") {
    import spark.implicits._
    val dir = tmpDir("manifest-slash")
    val ts = new TableStore(spark, dir + "/") // non-canonical root
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val pruned = ts.readRange("t", "id", 120L, 180L)
    assert(pruned.select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count() == 1,
      "pruning must survive a non-canonical root")
    assert(pruned.count() == 61)
    // and the manifest round-trips under the same root
    ts.declareStatsColumns("t", Seq("id"))
    val (got, n) = opens { ts.readRange("t", "id", 120L, 180L).count() }
    assert(got == 61 && n == 0, s"manifest must cover under a slash root ($n live)")
  }

  test("a mis-cased declaration records the schema's exact column name") {
    import spark.implicits._
    val root = tmpDir("manifest-case")
    val ts = threeBatches(root)
    ts.declareStatsColumns("t", Seq("ID")) // schema column is "id"
    assert(ts.getTableProp("t", "stats_cols").contains("id:int"),
      "the prop must carry the footer-exact name, not the caller's casing")
    val (got, n) = opens { ts.readRange("t", "id", 120L, 180L).count() }
    assert(got == 61 && n == 0,
      s"the manifest built from a mis-cased declare must still cover ($n live)")
  }

  test("a no-op compaction cadence still builds a fresh declaration's manifest") {
    import spark.implicits._
    val root = tmpDir("manifest-noop")
    val ts = new TableStore(spark, root)
    // one compacted-size file: every cadence no-ops (nothing to pack)
    ts.append("t", (1L to 300L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ts.declareStatsColumns("t", Seq("id"), refresh = false)
    assert(!new java.io.File(s"$root/t/_stats_manifest").exists())
    ts.compactIncremental("t") // small.size < 2 → no-op pack
    assert(new java.io.File(s"$root/t/_stats_manifest").exists(),
      "the no-op cadence must still publish the manifest")
    val (m, n) = opens { ts.maxId("t", "id") }
    assert(m == 300L && n == 0, s"maxId must be covered after the no-op cadence ($n live)")
    // and a SECOND no-op cadence carries entries instead of re-reading
    val (_, nAgain) = opens { ts.compactIncremental("t") }
    assert(nAgain == 0, s"incremental refresh must not reopen covered footers ($nAgain)")
  }

  test("declareStatsColumns validates columns and types loud") {
    val root = tmpDir("manifest-validate")
    val ts = threeBatches(root)
    intercept[IllegalArgumentException] {
      ts.declareStatsColumns("t", Seq("nope"))
    }
    import spark.implicits._
    val ts2 = new TableStore(spark, tmpDir("manifest-validate2"))
    ts2.append("d", Seq((1L, BigDecimal("1.50"))).toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(9,2)").as("price")))
    intercept[IllegalArgumentException] {
      ts2.declareStatsColumns("d", Seq("price"))
    }
  }
}
