package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins incremental IVF maintenance ([[Similarity.ivfAppend]] /
  * [[Similarity.ivfCompact]]): appending a batch must cost O(batch), land
  * in the existing cell convention (hash planes re-derived from the
  * marker; k-means cells assigned against the persisted centroids), and
  * leave queries over old + new rows exactly as if the index had been
  * built over the union (bit-exact for the hash layout, whose cells don't
  * depend on the build corpus). Compaction then bounds the per-cell file
  * tail without changing any answer, marker and centroids surviving.
  */
class IvfAppendSpec extends AnyFunSuite with SharedSpark {

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def queryVec(id: Long): Array[Double] =
    embs.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray

  test("hash-layout append ≡ one-shot build over the union") {
    val half = embs.filter(col("vec_id") % 2 === 0)
    val rest = embs.filter(col("vec_id") % 2 === 1)

    val pathInc = tmpDir("ivf-app") + "/inc"
    Similarity.ivfWrite(half, "vec_id", "embedding", pathInc, cellBits = 6)
    Similarity.ivfAppend(rest, "vec_id", "embedding", pathInc)

    val pathAll = tmpDir("ivf-app") + "/all"
    Similarity.ivfWrite(embs, "vec_id", "embedding", pathAll, cellBits = 6)

    val qv = queryVec(0L)
    def top(path: String) =
      Similarity.ivfTopK(spark, path, "vec_id", "embedding", qv,
        k = 10, cellBits = 6, maxHamming = 2, excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(pathInc) == top(pathAll),
      "hash cells don't depend on the build corpus — results must be bit-exact")
  }

  test("k-means append assigns against the persisted centroids") {
    val half = embs.filter(col("vec_id") % 2 === 0)
    val rest = embs.filter(col("vec_id") % 2 === 1)
    val path = tmpDir("ivfkm-app") + "/idx"
    val centroids = Similarity.ivfKmeansWrite(half, "vec_id", "embedding",
      path, k = 8, maxIters = 3)
    Similarity.ivfAppend(rest, "vec_id", "embedding", path)

    // every appended row landed in the cell its vector is nearest to
    // under the PERSISTED centroids (not some re-trained set)
    val stored = spark.read.parquet(path)
      .select(col("vec_id").cast("long"), col("ivf_cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Clustering.assign(embs, "vec_id", "embedding", centroids)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stored == want)

    // full-probe query over the appended index is exact vs brute force
    val qv = queryVec(2L)
    val got = Similarity.ivfKmeansTopK(spark, path, "vec_id", "embedding",
      qv, k = 5, nProbe = centroids.length, excludeId = Some(2L))
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 2L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute, "full probe over old+new must equal brute force")
  }

  test("append refuses an unversioned index") {
    val path = tmpDir("ivf-app-bad") + "/idx"
    Similarity.ivfWrite(embs, "vec_id", "embedding", path, cellBits = 6)
    new java.io.File(path, "_graft_ivf_meta").delete()
    intercept[IllegalArgumentException] {
      Similarity.ivfAppend(embs, "vec_id", "embedding", path)
    }
  }

  test("ivfCompact bounds the file tail; marker, centroids and answers survive") {
    val path = tmpDir("ivf-compact") + "/idx"
    val thirds = (0 until 3).map(i => embs.filter(col("vec_id") % 3 === i))
    Similarity.ivfWrite(thirds(0), "vec_id", "embedding", path, cellBits = 4)
    thirds.drop(1).foreach(b =>
      Similarity.ivfAppend(b, "vec_id", "embedding", path))

    def parquetFiles(): Int = {
      def walk(f: java.io.File): Int = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.map {
          case d if d.isDirectory => walk(d)
          case p if p.getName.endsWith(".parquet") => 1
          case _ => 0
        }.sum
      }
      walk(new java.io.File(path))
    }
    val qv = queryVec(0L)
    def answers() =
      Similarity.ivfTopK(spark, path, "vec_id", "embedding", qv,
        k = 10, cellBits = 4, maxHamming = 1, excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val before = answers()
    val filesBefore = parquetFiles()
    Similarity.ivfCompact(spark, path)
    val filesAfter = parquetFiles()
    assert(filesAfter < filesBefore,
      s"compaction must shrink the tail ($filesBefore -> $filesAfter)")
    assert(answers() == before, "compaction must not change any answer")
    // layout marker still verifies (requireLayout runs inside ivfTopK) and
    // a further append still lands
    Similarity.ivfAppend(
      embs.filter(col("vec_id") === 0L)
        .withColumn("vec_id", col("vec_id") + 1000000L),
      "vec_id", "embedding", path)
    assert(spark.read.parquet(path)
      .filter(col("vec_id") === 1000000L).count() == 1)
  }
}
