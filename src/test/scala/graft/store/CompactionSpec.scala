package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the incremental bin-packing contract of
  * [[TableStore.compactIncremental]]: only the small-file tail is ever
  * rewritten, already-compacted files cross the swap by rename (same
  * name, same mtime, zero data I/O), and the crash discipline matches
  * [[TableStore.overwriteAtomic]]'s fully-old-or-fully-new contract.
  */
class CompactionSpec extends AnyFunSuite with SharedSpark {

  /** Visible data files of `table` as name → (relative path, mtime). */
  private def dataFiles(root: String, table: String): Map[String, (String, Long)] = {
    def walk(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    val base = new java.io.File(s"$root/$table")
    walk(base).filter { f =>
      val rel = f.getPath.stripPrefix(base.getPath).stripPrefix("/")
      f.isFile && !rel.split("/").exists(s => s.startsWith("_") || s.startsWith("."))
    }.map { f =>
      val rel = f.getPath.stripPrefix(base.getPath).stripPrefix("/")
      f.getName -> (rel, f.lastModified())
    }.toMap
  }

  test("packs only the small tail; compacted files are carried by rename") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    // one "compacted" file: large enough to clear the test threshold
    ts.append("t", (1L to 20000L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val bigBytes = ts.sizeInBytes("t")
    val threshold = bigBytes // strictly-less-than: the big file is kept
    // the streamed tail: three one-row appends
    (1 to 3).foreach(i => ts.append("t", Seq((100000L + i, "tail")).toDF("id", "v")))
    val before = dataFiles(root, "t")
    assert(before.size == 4)
    val bigName = before.keys.find(n => before(n)._2 >= 0 &&
      new java.io.File(s"$root/t/${before(n)._1}").length() >= threshold).get

    val s1 = ts.compactIncremental("t", smallThreshold = threshold)
    assert(s1 == CompactStats(3, s1.packedBytes, 1) && s1.packedBytes > 0)
    val after1 = dataFiles(root, "t")
    assert(after1.size == 2, s"big + one packed, got ${after1.keys}")
    // the compacted file crossed the swap untouched: same name, same mtime
    assert(after1.contains(bigName), "already-compacted file must keep its name")
    assert(after1(bigName)._2 == before(bigName)._2,
      "already-compacted file must keep its mtime (rename, not rewrite)")
    assert(ts.read("t").count() == 20003)
    assert(ts.maxId("t", "id") == 100003L)

    // a second pass with nothing new to pack is a no-op: zero bytes
    // rewritten, zero renames, every file byte-for-byte untouched
    val s2 = ts.compactIncremental("t", smallThreshold = threshold)
    assert(s2 == CompactStats(0, 0L, 0))
    assert(dataFiles(root, "t") == after1, "no-op pass must touch nothing")

    // new tail arrives: the next pass re-packs ONLY the sub-threshold
    // files (the old packed file plus the new rows), never the big one
    (1 to 2).foreach(i => ts.append("t", Seq((200000L + i, "tail2")).toDF("id", "v")))
    val s3 = ts.compactIncremental("t", smallThreshold = threshold)
    assert(s3.packedFiles == 3 && s3.keptFiles == 1)
    val after3 = dataFiles(root, "t")
    assert(after3(bigName)._2 == before(bigName)._2,
      "compacted bytes must never be rewritten by later cadences")
    assert(ts.read("t").count() == 20005)
  }

  test("sidecar props and the empty/missing edge survive incremental packs") {
    import spark.implicits._
    val ts = new TableStore(spark, tmpDir("tables"))
    assert(ts.compactIncremental("missing") == CompactStats(0, 0L, 0))
    ts.append("t", Seq((1L, "a")).toDF("id", "v"))
    ts.setTableProp("t", "buckets", "16")
    assert(ts.compactIncremental("t").packedFiles == 0) // one file: no-op
    ts.append("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ts.compactIncremental("t").packedFiles == 2)
    assert(ts.getTableProp("t", "buckets").contains("16"),
      "props must travel with the swap")
    assert(ts.read("t").count() == 2)
  }

  test("partitioned tables keep hive layout, partition values, and per-dir sizing") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    // five appends × three buckets = one small file per bucket per append
    (1 to 5).foreach { i =>
      ts.appendPartitioned("p",
        (0 until 3).map(b => (i * 10L + b, b.toLong, s"r$i$b")).toDF("id", "bucket", "v"),
        Seq("bucket"))
    }
    def bucketDirFiles(b: Long): Int =
      Option(new java.io.File(s"$root/p/bucket=$b").listFiles())
        .map(_.count(f => f.isFile && f.getName.endsWith(".parquet"))).getOrElse(0)
    assert((0L to 2L).forall(bucketDirFiles(_) == 5))
    // hive dir inference types the partition column as int — normalize
    def snap(): Set[(Long, Long, String)] = ts.read("p")
      .select(col("id").cast("long"), col("bucket").cast("long"), col("v"))
      .as[(Long, Long, String)].collect().toSet
    val before = snap()

    val s = ts.compactIncremental("p", partitionCols = Seq("bucket"))
    assert(s.packedFiles == 15)
    // hash distribution on the partition column → ≈1 file per directory,
    // and the hive layout itself must survive (per-directory sizing)
    (0L to 2L).foreach(b => assert(bucketDirFiles(b) == 1,
      s"bucket=$b should pack to one file"))
    // partition values read back intact (the basePath recovery)
    assert(snap() == before)
  }

  test("random append/pack interleavings preserve rows and never rewrite past-threshold files") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    val rnd = new scala.util.Random(7)
    val threshold = 4096L // bigger than any single-append file here
    var expected = Set.empty[Long]
    var nextId = 0L
    // invariants across a random workload: (1) every row survives every
    // pack, (2) a file that crossed the threshold is never touched again,
    // (3) the table stays readable throughout
    var crossed = Map.empty[String, Long] // name -> mtime of >=threshold files
    for (step <- 1 to 12) {
      if (rnd.nextInt(3) < 2) { // append 1-3 rows
        val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
          nextId += 1; nextId
        }
        ts.append("t", rows.map(i => (i, s"v$i")).toDF("id", "v"))
        expected ++= rows
      } else {
        ts.compactIncremental("t", smallThreshold = threshold,
          targetBytes = threshold * 4)
      }
      if (ts.exists("t")) {
        assert(ts.read("t").select("id").as[Long].collect().toSet == expected,
          s"step $step lost or duplicated rows")
        val files = dataFiles(root, "t")
        crossed.foreach { case (name, mtime) =>
          assert(files.get(name).exists(_._2 == mtime),
            s"step $step rewrote past-threshold file $name")
        }
        crossed = files.collect { case (n, (rel, m))
          if new java.io.File(s"$root/t/$rel").length() >= threshold => n -> m
        }
      }
    }
    assert(expected.nonEmpty)
  }

  test("a crash at any compaction point loses no data") {
    import spark.implicits._
    final class Boom extends RuntimeException("injected crash")
    val allRows = ((1L to 5000L) ++ Seq(90001L, 90002L, 90003L)).toSet

    for (crashAt <- Seq("tmp-written", "old-aside", "kept-moved", "swapped")) {
      val root = tmpDir(s"tables-cc-$crashAt")
      val ts = new TableStore(spark, root)
      ts.append("t", (1L to 5000L).map(i => (i, "x")).toDF("id", "v").coalesce(1))
      val threshold = ts.sizeInBytes("t")
      (1 to 3).foreach(i => ts.append("t", Seq((90000L + i, "t")).toDF("id", "v")))
      ts.failpoint = at => if (at == crashAt) throw new Boom
      intercept[Boom] { ts.compactIncremental("t", smallThreshold = threshold) }
      ts.failpoint = _ => ()

      def ids(path: String): Set[Long] =
        spark.read.parquet(path).select("id").as[Long].collect().toSet
      val siblings = new java.io.File(root).listFiles().map(_.getName).toSeq
      crashAt match {
        case "tmp-written" =>
          // nothing renamed yet: fully-old, staged pack is invisible debris
          assert(ts.read("t").select("id").as[Long].collect().toSet == allRows)
        case "old-aside" =>
          // inside the window: table path absent (retryable), every row
          // recoverable from the .old-* sibling alone
          assert(!ts.exists("t"))
          val old = siblings.find(_.startsWith("t.old-")).get
          assert(ids(s"$root/$old") == allRows)
        case "kept-moved" =>
          // kept files moved into the staged dir: .tmp-* is already the
          // complete fully-new table; nothing was destroyed
          assert(!ts.exists("t"))
          val tmp = siblings.find(_.startsWith("t.tmp-")).get
          assert(ids(s"$root/$tmp") == allRows)
        case "swapped" =>
          // commit point passed: fully-new and complete
          assert(ts.read("t").select("id").as[Long].collect().toSet == allRows)
      }
    }
  }

  test("sortCols re-clusters the packed tail so pruned reads keep skipping") {
    import spark.implicits._
    val root = tmpDir("compact-sorted")
    val ts = new TableStore(spark, root)
    // eight append batches, each spanning the WHOLE id range — exactly
    // the degradation mode: every tail file's [min, max] covers
    // everything, so a range read can prune nothing
    val rnd = new scala.util.Random(7)
    for (b <- 0 until 8)
      ts.append("t", rnd.shuffle((0 until 1000).toList)
        .map(i => (i.toLong * 8 + b, s"v$b-$i")).toDF("id", "v").coalesce(1))
    val before = ts.readRange("t", "id", 100L, 200L)
    assert(before.inputFiles.length == 8, "unsorted tail: nothing prunable")
    // materialize NOW — the compaction below swaps these files away
    val beforeRows = before.as[(Long, String)].collect().toSet
    // pack WITH the clustering key, small target to force several files
    val stats = ts.compactIncremental("t",
      smallThreshold = 10L * 1024 * 1024, targetBytes = 16L * 1024,
      sortCols = Seq("id"))
    assert(stats.packedFiles == 8)
    val total = ts.read("t").inputFiles.length
    assert(total >= 3, s"want several packed files, got $total")
    val after = ts.readRange("t", "id", 100L, 200L)
    assert(after.inputFiles.length < total,
      "sorted packing must restore file-level skipping")
    // rows are exactly the plain filter, before and after
    assert(after.as[(Long, String)].collect().toSet == beforeRows)
    assert(ts.read("t").count() == 8000)

    // partitioned form: sort within the per-directory packed output
    val root2 = tmpDir("compact-sorted-part")
    val ts2 = new TableStore(spark, root2)
    for (b <- 0 until 6)
      ts2.appendPartitioned("t", rnd.shuffle((0 until 500).toList)
        .map(i => (i.toLong * 6 + b, i % 2, s"v$b-$i")).toDF("id", "p", "v")
        .coalesce(1), Seq("p"))
    ts2.compactIncremental("t", smallThreshold = 10L * 1024 * 1024,
      targetBytes = 8L * 1024, partitionCols = Seq("p"), sortCols = Seq("id"))
    val t2 = ts2.read("t")
    assert(t2.count() == 3000)
    val conj = ts2.readRangeAll("t", Seq(("p", 1L, 1L), ("id", 0L, 300L)))
    assert(conj.count() ==
      t2.filter(col("p") === 1 && col("id").between(0L, 300L)).count())
    assert(conj.inputFiles.nonEmpty &&
      conj.inputFiles.forall(_.contains("p=1")),
      "partition dirs still prune after a sorted pack")
  }
}
