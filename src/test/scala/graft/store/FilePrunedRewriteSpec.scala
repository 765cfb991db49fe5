package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the file-pruned CRUD contract on UNPARTITIONED tables: an update
  * or delete rewrites only the data files holding matching rows (found by
  * one pushdown scan over `input_file_name()`); every other file crosses
  * the swap by rename — same name, same mtime, zero data I/O. This is
  * what makes a single-row metainfo patch affordable on a corpus-scale
  * documents table: one ~128 MB file rewritten, not the table.
  */
class FilePrunedRewriteSpec extends AnyFunSuite with SharedSpark {

  private def files(root: String, table: String): Map[String, Long] =
    Option(new java.io.File(s"$root/$table").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap

  /** Three single-file appends with disjoint id ranges. */
  private def threeBatches(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ts
  }

  test("deleteWhere rewrites only the file holding the matching row") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = threeBatches(root)
    val before = files(root, "t")
    assert(before.size == 3)

    ts.deleteWhere("t", col("id") === 150L) // lives in batch-2's file only
    val after = files(root, "t")
    assert(ts.read("t").count() == 299)
    assert(ts.read("t").filter(col("id") === 150L).isEmpty)
    val untouched = before.filter { case (n, m) => after.get(n).contains(m) }
    assert(untouched.size == 2,
      s"exactly two files must cross by rename; before=$before after=$after")
  }

  test("updateWhere patches one file and equals the whole-table semantics") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = threeBatches(root)
    val before = files(root, "t")
    ts.updateWhere("t", col("id") === 42L, Map("v" -> lit("patched")))
    val after = files(root, "t")
    assert(before.count { case (n, m) => after.get(n).contains(m) } == 2)
    val got = ts.read("t").as[(Long, String)].collect().toSet
    val want = (1L to 300L)
      .map(i => (i, if (i == 42L) "patched" else s"v$i")).toSet
    assert(got == want)
  }

  test("a predicate matching nothing writes nothing") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = threeBatches(root)
    val before = files(root, "t")
    ts.deleteWhere("t", col("id") === -1L)
    assert(files(root, "t") == before)
  }

  test("a broad predicate falls back to the whole-table rewrite, same answer") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = threeBatches(root)
    ts.deleteWhere("t", col("id") <= 250L) // spans all three files
    assert(ts.read("t").select("id").as[Long].collect().toSet ==
      (251L to 300L).toSet)
  }

  test("NULL-valued predicates keep rows on the pruned path") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((Some(1L), "a"), (None, "orphan")).toDF("id", "v").coalesce(1))
    ts.append("t", Seq((Some(2L), "b")).toDF("id", "v").coalesce(1))
    ts.deleteWhere("t", col("id") === 1L)
    assert(ts.read("t").select("v").collect().map(_.getString(0)).sorted.toSeq
      == Seq("b", "orphan"))
  }

  test("a partitioned-on-disk table without partitionCols degrades to the flat rewrite, readable") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = new TableStore(spark, root)
    ts.appendPartitioned("t",
      (1L to 100L).map(i => (i, i % 4, s"v$i")).toDF("id", "bucket", "v"),
      Seq("bucket"))
    // caller forgets partitionCols: the file-pruned path must NOT stage an
    // unpartitioned write next to kept hive directories (unreadable mixed
    // layout) — it degrades to the flattening whole-table rewrite
    ts.deleteWhere("t", col("id") === 7L)
    val back = ts.read("t")
    assert(back.count() == 99)
    assert(back.columns.contains("bucket"), "partition values survive as a column")
    assert(back.filter(col("id") === 7L).isEmpty)
  }

  test("the discovery predicate is pushed to the parquet scan") {
    import spark.implicits._
    val root = tmpDir("tables")
    val ts = threeBatches(root)
    // the affected-file discovery filters on the RAW cond so parquet can
    // skip row groups via stats; a coalesce wrapper would block pushdown
    // and turn single-row CRUD back into an O(table) read
    val scan = ts.read("t").filter(col("id") === 150L)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,150)]"),
      s"predicate not pushed:\n$scan")
  }

  test("a crash at any swap point leaves fully-old or fully-new, rows recoverable") {
    import spark.implicits._
    final class Boom extends RuntimeException("injected crash")
    for (crashAt <- Seq("tmp-written", "old-aside", "kept-moved", "swapped")) {
      val root = tmpDir(s"tables-fp-$crashAt")
      val ts = threeBatches(root)
      ts.failpoint = at => if (at == crashAt) throw new Boom
      intercept[Boom] { ts.deleteWhere("t", col("id") === 150L) }
      ts.failpoint = _ => ()
      def ids(path: String): Set[Long] =
        spark.read.parquet(path).select("id").as[Long].collect().toSet
      val siblings = new java.io.File(root).listFiles().map(_.getName).toSeq
      crashAt match {
        case "tmp-written" =>
          assert(ids(s"$root/t") == (1L to 300L).toSet, s"[$crashAt] fully-old")
        case "old-aside" =>
          assert(!ts.exists("t"))
          val old = siblings.find(_.startsWith("t.old-")).get
          assert(ids(s"$root/$old") == (1L to 300L).toSet)
        case "kept-moved" =>
          assert(!ts.exists("t"))
          val tmp = siblings.find(_.startsWith("t.tmp-")).get
          assert(ids(s"$root/$tmp") == (1L to 300L).toSet - 150L,
            s"[$crashAt] staged dir is the complete new table")
        case "swapped" =>
          assert(ids(s"$root/t") == (1L to 300L).toSet - 150L)
      }
    }
  }
}
