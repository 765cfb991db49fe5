package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins [[TableStore.merge]] — the keyed upsert (M4):
  *  - semantics: matched target rows replaced from the source, unmatched
  *    source rows inserted, unmatched target rows untouched;
  *  - the source contract (all target columns, unique non-null keys)
  *    fails loud BEFORE any write;
  *  - scale shape: only files/directories holding matched keys (plus
  *    insert-target directories) are rewritten — untouched data crosses
  *    the swap by rename (same name, same mtime), a pure insert appends
  *    with zero rewrite I/O;
  *  - crash safety: the shared swap failpoints leave the table fully-old
  *    or fully-new, recoverable by [[TableStore.recoverSwapDebris]].
  */
class MergeSpec extends AnyFunSuite with SharedSpark {

  private final class Boom extends RuntimeException("injected crash")

  private def files(root: String, table: String): Map[String, Long] = {
    def walk(f: java.io.File, prefix: String): Seq[(String, Long)] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.flatMap {
        case d if d.isDirectory && !d.getName.startsWith("_") && !d.getName.startsWith(".") =>
          walk(d, s"$prefix${d.getName}/")
        case p if p.isFile && p.getName.endsWith(".parquet") =>
          Seq(s"$prefix${p.getName}" -> p.lastModified())
        case _ => Seq.empty
      }
    }
    walk(new java.io.File(s"$root/$table"), "")
      .toMap
  }

  /** Three single-file appends with disjoint id ranges 1-100/101-200/201-300. */
  private def threeBatches(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ts
  }

  test("merge updates matched, inserts unmatched, rewrites one file") {
    import spark.implicits._
    val root = tmpDir("merge-basic")
    val ts = threeBatches(root)
    val before = files(root, "t")
    assert(before.size == 3)

    // key 150 lives in batch-2's file; 1000/1001 are inserts
    val src = Seq((150L, "patched"), (1000L, "new-a"), (1001L, "new-b"))
      .toDF("id", "v")
    ts.merge("t", src, Seq("id"))

    val got = ts.read("t").as[(Long, String)].collect().toSet
    val want = (1L to 300L).map(i => (i, if (i == 150L) "patched" else s"v$i"))
      .toSet ++ Set((1000L, "new-a"), (1001L, "new-b"))
    assert(got == want)
    val after = files(root, "t")
    val untouched = before.filter { case (n, m) => after.get(n).contains(m) }
    assert(untouched.size == 2,
      s"two files must cross by rename; before=$before after=$after")
  }

  test("pure insert (no key matches) appends — zero files rewritten") {
    import spark.implicits._
    val root = tmpDir("merge-insert")
    val ts = threeBatches(root)
    val before = files(root, "t")
    ts.merge("t", Seq((900L, "i1"), (901L, "i2")).toDF("id", "v"), Seq("id"))
    val after = files(root, "t")
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "all pre-existing files must be byte-identical (append path)")
    assert(ts.read("t").count() == 302)
  }

  test("merge into a missing table creates it") {
    import spark.implicits._
    val root = tmpDir("merge-create")
    val ts = new TableStore(spark, root)
    ts.merge("t", Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    assert(ts.read("t").as[(Long, String)].collect().toSet == Set((1L, "a")))
  }

  test("source contract fails loud before any write") {
    import spark.implicits._
    val root = tmpDir("merge-contract")
    val ts = threeBatches(root)
    val before = files(root, "t")

    val dup = Seq((5L, "x"), (5L, "y")).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] { ts.merge("t", dup, Seq("id")) }
    assert(e1.getMessage.contains("unique"))

    val withNull = Seq((Some(5L), "x"), (None, "y"))
      .toDF("id", "v")
    intercept[IllegalArgumentException] { ts.merge("t", withNull, Seq("id")) }

    val missingCol = Seq(Tuple1(5L)).toDF("id")
    val e3 = intercept[IllegalArgumentException] { ts.merge("t", missingCol, Seq("id")) }
    assert(e3.getMessage.contains("missing target columns"))

    intercept[IllegalArgumentException] {
      ts.merge("t", dup.withColumnRenamed("id", "k"), Seq("k"))
    }

    assert(files(root, "t") == before, "failed validation must not write")
    assert(ts.read("t").count() == 300)
  }

  test("null target keys survive any merge (they can match nothing)") {
    import spark.implicits._
    val root = tmpDir("merge-nulltarget")
    val ts = new TableStore(spark, root)
    ts.append("t", Seq((Some(1L), "a"), (None, "orphan")).toDF("id", "v"))
    ts.merge("t", Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), Seq("id"))
    val got = ts.read("t").as[(Option[Long], String)].collect().toSet
    assert(got == Set((Some(1L), "a2"), (Some(2L), "b"), (None, "orphan")))
  }

  test("merge ≡ whole-table upsert semantics when most files are affected") {
    import spark.implicits._
    val root = tmpDir("merge-full")
    val ts = threeBatches(root)
    // keys in every file → >half affected → whole-table fallback path
    val src = Seq((50L, "u1"), (150L, "u2"), (250L, "u3"), (400L, "i"))
      .toDF("id", "v")
    ts.merge("t", src, Seq("id"))
    val got = ts.read("t").as[(Long, String)].collect().toSet
    val want = (1L to 300L).map { i =>
      (i, Map(50L -> "u1", 150L -> "u2", 250L -> "u3").getOrElse(i, s"v$i"))
    }.toSet + ((400L, "i"))
    assert(got == want)
  }

  test("partitioned merge rewrites only affected directories") {
    import spark.implicits._
    val root = tmpDir("merge-part")
    val ts = new TableStore(spark, root)
    val base = (1L to 90L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("id", "v", "p")
    ts.appendPartitioned("t", base, Seq("p"))
    val before = files(root, "t")

    // update a row in p=1, insert into existing p=2 and brand-new p=7
    val src = Seq((4L, "patched", 1), (1000L, "new-2", 2), (2000L, "new-7", 7))
      .toDF("id", "v", "p")
    ts.merge("t", src, Seq("id"), Seq("p"))

    val got = ts.read("t").as[(Long, String, Int)].collect().toSet
    val want = (1L to 90L)
      .map(i => (i, if (i == 4L) "patched" else s"v$i", (i % 3).toInt)).toSet ++
      Set((1000L, "new-2", 2), (2000L, "new-7", 7))
    assert(got == want)
    val after = files(root, "t")
    // p=0 was neither matched nor an insert target: crossed by rename
    val p0Before = before.filter(_._1.startsWith("p=0/"))
    assert(p0Before.nonEmpty &&
      p0Before.forall { case (n, m) => after.get(n).contains(m) },
      s"p=0 must be untouched; before=$before after=$after")
    assert(after.keys.exists(_.startsWith("p=7/")), "new partition created")
  }

  test("partition-moving merge vacates the old directory and fills the new") {
    import spark.implicits._
    val root = tmpDir("merge-move")
    val ts = new TableStore(spark, root)
    ts.appendPartitioned("t",
      Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 3))
        .toDF("id", "v", "p"), Seq("p"))
    val before = files(root, "t")
    // key 1 moves from p=1 to p=2
    ts.merge("t", Seq((1L, "a-moved", 2)).toDF("id", "v", "p"), Seq("id"), Seq("p"))
    val got = ts.read("t").as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a-moved", 2), (2L, "b", 1), (3L, "c", 2), (4L, "d", 3)))
    // p=3 untouched by rename
    val p3 = before.filter(_._1.startsWith("p=3/"))
    val after = files(root, "t")
    assert(p3.nonEmpty && p3.forall { case (n, m) => after.get(n).contains(m) })
  }

  test("insert-only partitioned merge into a FLAT table converges, never wedges") {
    import spark.implicits._
    val root = tmpDir("merge-flat")
    val ts = new TableStore(spark, root)
    // table created FLAT (p is a data column, files at the root): a
    // partitioned append here would produce the mixed layout Spark
    // refuses to read — the merge must take the whole-table path instead
    ts.append("t", Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "v", "p"))
    ts.merge("t", Seq((9L, "i", 3)).toDF("id", "v", "p"), Seq("id"), Seq("p"))
    val got = ts.read("t").select("id", "v", "p").as[(Long, String, Int)]
      .collect().toSet
    assert(got == Set((1L, "a", 1), (2L, "b", 2), (9L, "i", 3)))
    // and the table is now genuinely hive-partitioned on p
    assert(new java.io.File(s"$root/t").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("p=")))
  }

  test("partitioned merge handles null partition values (DEFAULT dir)") {
    import spark.implicits._
    val root = tmpDir("merge-nullpart")
    val ts = new TableStore(spark, root)
    ts.appendPartitioned("t",
      Seq((1L, "a", Some(1)), (2L, "b", Option.empty[Int]), (3L, "c", Some(2)))
        .toDF("id", "v", "p"), Seq("p"))
    // update the null-partition row in place, insert another null-dir row
    ts.merge("t",
      Seq((2L, "b2", Option.empty[Int]), (9L, "i", Option.empty[Int]))
        .toDF("id", "v", "p"),
      Seq("id"), Seq("p"))
    val got = ts.read("t").as[(Long, String, Option[Int])].collect().toSet
    assert(got == Set((1L, "a", Some(1)), (2L, "b2", None),
      (3L, "c", Some(2)), (9L, "i", None)))
  }

  test("merge crash at every failpoint recovers to fully-old or fully-new") {
    import spark.implicits._
    val oldRows = (1L to 300L).map(i => (i, s"v$i")).toSet
    val newRows = (1L to 300L).map(i => (i, if (i == 150L) "patched" else s"v$i"))
      .toSet + ((1000L, "new"))
    for (crashAt <- Seq("tmp-written", "old-aside", "kept-moved", "swapped")) {
      val root = tmpDir(s"merge-crash-$crashAt")
      val ts = threeBatches(root)
      ts.failpoint = at => if (at == crashAt) throw new Boom
      intercept[Boom] {
        ts.merge("t", Seq((150L, "patched"), (1000L, "new")).toDF("id", "v"),
          Seq("id"))
      }
      ts.failpoint = _ => ()
      ts.recoverSwapDebris("t")
      val got = ts.read("t").as[(Long, String)].collect().toSet
      assert(got == oldRows || got == newRows,
        s"[$crashAt] must be fully-old or fully-new")
      assert(!ts.hasSwapDebris("t"), s"[$crashAt] debris must be gone")
    }
  }

  test("randomized merge rounds agree with an in-memory upsert model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val root = tmpDir("merge-prop")
    val ts = new TableStore(spark, root)
    var model = Map.empty[Long, String]
    val init = (1L to 200L).map(i => i -> s"v$i")
    model ++= init
    ts.append("t", init.toDF("id", "v").repartitionByRange(2, col("id")))
    for (round <- 1 to 8) {
      val updates = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(20))
        .map(k => k -> s"u$round-$k")
      val inserts = (1 to rnd.nextInt(10))
        .map(_ => 1000L * round + rnd.nextInt(500)).distinct
        .filterNot(model.contains).map(k => k -> s"i$round-$k")
      val src = updates ++ inserts // keys disjoint: updates ∈ model, inserts ∉
      if (src.nonEmpty) {
        model ++= src
        ts.merge("t", src.toDF("id", "v"), Seq("id"))
      }
      // interleave maintenance: a merge must survive compaction reshaping
      // the file layout under it (and vice versa)
      if (round % 3 == 0) ts.compactIncremental("t", smallThreshold = 1L << 20)
      val got = ts.read("t").as[(Long, String)].collect().toMap
      assert(got == model, s"round $round diverged (${got.size} vs ${model.size})")
    }
    assert(!ts.hasSwapDebris("t"))
  }

  test("scale smoke: a single-key patch on a 2M-row table rewrites one file") {
    import spark.implicits._
    val root = tmpDir("merge-scale")
    val ts = new TableStore(spark, root)
    ts.overwriteAtomic("t", spark.range(2000000L)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(32, col("id")).sortWithinPartitions("id"))
    val before = files(root, "t")
    assert(before.size == 32)

    ts.merge("t", Seq((1234567L, "patched")).toDF("id", "v"), Seq("id"))
    val after = files(root, "t")
    val untouched = before.count { case (n, m) => after.get(n).contains(m) }
    assert(untouched == 31,
      s"a one-row patch must rewrite exactly one of 32 files (renamed: $untouched)")
    assert(ts.read("t").count() == 2000000L)
    assert(ts.read("t").filter(col("id") === 1234567L)
      .head().getString(1) == "patched")
  }

  test("merged table stays readable and re-mergeable (idempotent upsert)") {
    import spark.implicits._
    val root = tmpDir("merge-idem")
    val ts = threeBatches(root)
    val src = Seq((150L, "patched"), (1000L, "new")).toDF("id", "v")
    ts.merge("t", src, Seq("id"))
    ts.merge("t", src, Seq("id")) // same statement again: no-op content-wise
    val got = ts.read("t").as[(Long, String)].collect().toSet
    val want = (1L to 300L).map(i => (i, if (i == 150L) "patched" else s"v$i"))
      .toSet + ((1000L, "new"))
    assert(got == want)
  }
}
