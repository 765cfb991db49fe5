package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the operational storage report (round 12): the per-table numbers
  * an operator polls — file/byte/tail counts, manifest coverage, lease
  * state, debris — derived from metadata only (one listing + one
  * sidecar read, no Spark job).
  */
class TableReportSpec extends AnyFunSuite with SharedSpark {

  test("report tracks files, tail, manifest coverage, lease, and debris") {
    import spark.implicits._
    val root = tmpDir("report")
    val ts = new TableStore(spark, root)
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))

    val r0 = ts.tableReport("t")
    assert(r0.table == "t" && r0.files == 3 && r0.bytes > 0)
    assert(r0.smallFiles == 3, "tiny test files are all below the threshold")
    assert(r0.partitionDirs == 0 && r0.statsCols == "" && r0.manifestCovered == 0)
    assert(r0.leaseState == "none" && !r0.swapDebris)

    // declaration + refresh → full coverage; a fresh append uncovers one
    ts.declareStatsColumns("t", Seq("id", "v"))
    val r1 = ts.tableReport("t")
    assert(r1.statsCols == "id,v" && r1.manifestCovered == 3)
    ts.append("t", Seq((400L, "x")).toDF("id", "v").coalesce(1))
    val r2 = ts.tableReport("t")
    assert(r2.files == 4 && r2.manifestCovered == 3,
      "the fresh append must show as manifest-uncovered")

    // lease states from both sides
    assert(ts.acquireWriterLease("t"))
    assert(ts.tableReport("t").leaseState == "live-own")
    assert(new TableStore(spark, root).tableReport("t").leaseState == "live-foreign")
    ts.releaseWriterLease("t")

    // debris flag
    assert(new java.io.File(s"$root/t.old-9").mkdirs())
    assert(ts.tableReport("t").swapDebris)
    assert(ts.recoverSwapDebris("t") == SwapRecovery.CleanedUp)
    assert(!ts.tableReport("t").swapDebris)

    // missing table: empty but well-formed
    val rm = ts.tableReport("nope")
    assert(rm.files == 0 && rm.leaseState == "none" && !rm.swapDebris)

    // the Audit frame shape
    val df = Audit.storageReport(spark, ts, Seq("t", "nope"))
    assert(df.count() == 2)
    assert(df.filter(col("table") === "t").head().getAs[Int]("files") == 4)
  }

  test("partitioned tables report their directory count") {
    import spark.implicits._
    val root = tmpDir("report-part")
    val ts = new TableStore(spark, root)
    ts.appendPartitioned("t",
      (1L to 60L).map(i => (i, (i % 3).toInt, s"v$i")).toDF("id", "p", "v"),
      Seq("p"))
    val r = ts.tableReport("t")
    assert(r.partitionDirs == 3)
    assert(r.files >= 3 && r.bytes > 0)
  }

  test("storageReportAll matches the per-table reports from ONE root walk (r14)") {
    import spark.implicits._
    val root = tmpDir("report-all")
    val ts = new TableStore(spark, root)
    assert(ts.storageReportAll().isEmpty, "empty store → empty index")
    // a mixed store: plain, partitioned+stats-declared, leased, and a
    // debris-only (mid-swap-absent) name — every row shape the index
    // must reproduce
    ts.append("a", (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.appendPartitioned("p",
      (1L to 60L).map(i => (i, (i % 3).toInt, s"v$i")).toDF("id", "p", "v"),
      Seq("p"))
    ts.declareStatsColumns("a", Seq("id"))
    assert(ts.acquireWriterLease("a"))
    assert(new java.io.File(s"$root/ghost.old-7").mkdirs())
    val all = ts.storageReportAll()
    val perTable = ts.listTables().map(t => ts.tableReport(t))
    assert(all == perTable,
      s"index rows must equal the per-table reports\nall:      $all\nperTable: $perTable")
    assert(all.map(_.table) == Seq("a", "ghost", "p"))
    assert(all.find(_.table == "ghost").get.swapDebris,
      "a debris-only name reports zero files with the debris flagged")
    assert(all.find(_.table == "a").get.leaseState == "live-own")
    // the whole index cost exactly ONE counted listing — the r13 form
    // paid one per table
    val before = ts.listingsPerformed.get()
    ts.storageReportAll()
    assert(ts.listingsPerformed.get() - before == 1,
      "the index must share a single root walk across every table")
    ts.releaseWriterLease("a")
  }
}
