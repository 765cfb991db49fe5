package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The 100x-scale IVF claim as a CI invariant (VERDICT r5 #8): build the
  * hash-cell IVF index over a MILLION-vector corpus and prove the two
  * properties that make ANN viable at that scale — the probe reads a
  * small FRACTION of the index (partition pruning visible as actual
  * files-read, not just a plan string), and what it reads is the RIGHT
  * fraction (recall against exact brute force over the full corpus).
  *
  * The corpus is deterministic: 200 hash-derived anchor directions with
  * small per-vector noise, so near neighbours genuinely cluster in angle
  * (the workload IVF exists for) and every run sees the same data.
  */
class IvfScaleSpec extends AnyFunSuite with SharedSpark {

  private val N = 1000000L
  private val Dim = 16
  private val Anchors = 200

  // hash-derived uniform in [-1, 1], deterministic across runs/engines
  private def u(seedCols: org.apache.spark.sql.Column*) =
    pmod(xxhash64(seedCols: _*), lit(20001L)).cast("double") / 10000.0 - 1.0

  private lazy val corpus = spark.range(N).toDF("vec_id")
    .withColumn("anchor", pmod(col("vec_id"), lit(Anchors.toLong)))
    .withColumn("embedding", transform(sequence(lit(0), lit(Dim - 1)),
      j => u(col("anchor"), j) + lit(0.05) * u(col("vec_id"), j, lit(7L))))
    .drop("anchor")

  test("1M-vector IVF: pruned probe reads <30% of the index, recall holds") {
    val path = tmpDir("ivf-scale") + "/emb"
    Similarity.ivfWrite(corpus, "vec_id", "embedding", path, cellBits = 6)

    // parquet file count per cell directory, straight off the layout —
    // partition pruning IS directory selection, so this measures exactly
    // what a pruned scan reads (DataFrame.inputFiles is not pruning-aware)
    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).fold(0)(_.count(_.getName.endsWith(".parquet")))
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ivf_cell="))
    val allFiles = cellDirs.map(parquetFiles).sum
    assert(cellDirs.length >= 10, s"index has only ${cellDirs.length} cells")

    import spark.implicits._
    val qv = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Seq[Double]].head().toArray
    val probe = Similarity.ivfTopK(spark, path, "vec_id", "embedding", qv,
      k = 10, cellBits = 6, maxHamming = 1, excludeId = Some(0L))
    // the cell IN-filter must reach the scan as a partition filter...
    assert(probe.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [ivf_cell"), "cell filter did not prune")
    assert(probe.count() == 10)
    // ...and the probed directories are a small fraction of the index:
    // Hamming-1 around the query's cell is at most 7 of ~64 cells
    val qCell = spark.read.parquet(path).filter(col("vec_id") === 0L)
      .select(col("ivf_cell").cast("long")).head().getLong(0)
    val probed = Similarity.cellsWithinHamming(qCell, cellBits = 6, maxHamming = 1)
    val readFiles = cellDirs
      .filter(d => probed.contains(d.getName.stripPrefix("ivf_cell=").toLong))
      .map(parquetFiles).sum
    assert(readFiles > 0 && readFiles.toDouble / allFiles < 0.30,
      s"pruned probe reads $readFiles of $allFiles index files")

    // recall@10 vs exact brute force over the full 1M corpus, 3 queries
    val queries = corpus.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopKBatch(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    val approx = Similarity.ivfTopKBatch(spark, path, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, cellBits = 6, maxHamming = 1)
    val recalls = Similarity.recallAtK(approx, exact, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(recalls.size == 3)
    val avg = recalls.values.sum / recalls.size
    assert(avg >= 0.7, s"recall@10 collapsed at scale: $recalls")
  }
}
