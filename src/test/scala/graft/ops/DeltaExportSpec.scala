package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class DeltaExportSpec extends AnyFunSuite with SharedSpark {

  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"doc $i " * (i % 5 + 1))).toDF("id", "txt")
  }

  private def export(df: org.apache.spark.sql.DataFrame, root: String,
                     name: String) =
    DeltaExport.exportDelta(df, col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 10L, root, name)

  private def keysIn(root: String, glob: String): Set[String] =
    TarExport.readTarSamples(spark, root, glob = glob)
      .select("key").collect().map(_.getString(0)).toSet

  test("bootstrap + increment ship disjoint key sets; manifest verifies") {
    val root = tmpDir("delta-basic") + "/delivery"
    val first = export(docs(0 until 25), root, "delta-000").collect()
    assert(first.map(_.getAs[Long]("n_samples")).sum == 25L)
    // second increment: 15 of 40 are new — exactly they ship
    val second = export(docs(0 until 40), root, "delta-001").collect()
    assert(second.map(_.getAs[Long]("n_samples")).sum == 15L)
    assert(keysIn(root, "delta-000/shard-*.tar") ==
      (0 until 25).map(_.toString).toSet)
    assert(keysIn(root, "delta-001/shard-*.tar") ==
      (25 until 40).map(_.toString).toSet)
    // the republished manifest covers the whole history, tars + sidecars
    val st = ExportIntegrity.verify(spark, root,
      DeltaExport.DeliveryGlob + "*").collect()
    assert(st.nonEmpty && st.forall(_.getAs[String]("status") == "ok"))
    assert(st.exists(_.getAs[String]("file").endsWith(".idx.jsonl")))
  }

  test("nothing new: no directory, no accounting, manifest untouched") {
    val root = tmpDir("delta-empty") + "/delivery"
    export(docs(0 until 12), root, "delta-000").collect()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new org.apache.hadoop.fs.Path(root, ExportIntegrity.ManifestName)
    val before = {
      val in = fs.open(manifest)
      try in.readAllBytes() finally in.close()
    }
    val acct = export(docs(0 until 12), root, "delta-001").collect()
    assert(acct.isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "delta-001")))
    val after = {
      val in = fs.open(manifest)
      try in.readAllBytes() finally in.close()
    }
    assert(java.util.Arrays.equals(before, after))
  }

  test("a published increment name refuses: history is append-only") {
    val root = tmpDir("delta-republish") + "/delivery"
    export(docs(0 until 5), root, "delta-000").collect()
    val e = intercept[IllegalStateException](
      export(docs(0 until 9), root, "delta-000"))
    assert(e.getMessage.contains("already published"))
  }

  test("unpublished crash debris is wiped before the retry") {
    val root = tmpDir("delta-debris") + "/delivery"
    export(docs(0 until 5), root, "delta-000").collect()
    // simulate a crashed increment: a directory with a stray committed
    // shard (no sidecar, and never published in the manifest)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val debris = new org.apache.hadoop.fs.Path(s"$root/delta-001/shard-99999.tar")
    fs.mkdirs(debris.getParent)
    val out = fs.create(debris, true)
    try out.write(new Array[Byte](1024)) finally out.close()
    // the retry succeeds (the debris would otherwise fail the
    // fully-indexed check) and the stray shard is gone
    val acct = export(docs(0 until 8), root, "delta-001").collect()
    assert(acct.map(_.getAs[Long]("n_samples")).sum == 3L)
    assert(!fs.exists(debris))
    assert(keysIn(root, "delta-001/shard-*.tar") == Set("5", "6", "7"))
  }

  test("a history without index sidecars refuses loudly") {
    val root = tmpDir("delta-noindex") + "/delivery"
    TarExport.writeTarShards(docs(0 until 7), col("id"), Seq(col("id")),
      Seq("txt" -> col("txt")), 10L, s"$root/batch-0").collect()
    val e = intercept[IllegalStateException](
      export(docs(0 until 9), root, "delta-001"))
    assert(e.getMessage.contains("fully indexed"))
  }

  test("deliveredKeys: empty for an absent root, distinct keys after") {
    val root = tmpDir("delta-keys") + "/delivery"
    assert(DeltaExport.deliveredKeys(spark, root).count() == 0L)
    export(docs(0 until 13), root, "delta-000").collect()
    assert(DeltaExport.deliveredKeys(spark, root)
      .collect().map(_.getString(0)).toSet ==
      (0 until 13).map(_.toString).toSet)
  }

  test("increments are byte-deterministic across deliveries") {
    def shas(root: String): Map[String, String] = {
      export(docs(0 until 25), root, "delta-000").collect()
      export(docs(0 until 40), root, "delta-001").collect()
      ExportIntegrity.readManifest(spark, root).collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
    }
    val a = shas(tmpDir("delta-det-a") + "/d")
    val b = shas(tmpDir("delta-det-b") + "/d")
    assert(a == b && a.nonEmpty)
  }

  test("increment names that could hide or escape are refused") {
    val root = tmpDir("delta-names") + "/delivery"
    for (bad <- Seq("", "_manifest", ".hidden", "a/b"))
      intercept[IllegalArgumentException](export(docs(0 until 3), root, bad))
  }
}
