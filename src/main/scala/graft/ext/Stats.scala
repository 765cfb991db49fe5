package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** [EXT] Embedding-corpus statistics: the covariance matrix (the PCA /
  * whitening building block) and a principal-component projection.
  *
  * Scale design: a covariance over n vectors of dimension d is a single
  * corpus pass producing d(d+1)/2 partial products — never an n×n
  * object. Two paths, same contract as Clustering.labelCentroidsExact vs
  * a plain avg:
  *
  *  - [[covarianceExact]]: per-(i,j) ordered folds (ascending id), bit-
  *    reproducible across runs and engines — the auditable path. Memory
  *    per group is the corpus column pair (n doubles), so it is for
  *    corpus SAMPLES (the standard PCA practice: fit on a sample,
  *    project everything), not the full 100 TB corpus.
  *  - [[covarianceFast]]: one-pass partial aggregation (d² accumulator
  *    per partition, map-side combined) — linear scan, constant memory,
  *    the full-corpus path; float addition order varies with
  *    partitioning, so results agree with exact to ~1e-9 relative, not
  *    bitwise.
  *
  * The eigen-solve itself is driver-side: a d×d matrix is KB-sized at
  * embedding dimensions; distributing it would be pure overhead.
  */
object Stats {

  // ~2 GiB of bucket partials: the ceiling for exactMoments' driver
  // collect (guarded below with an actionable error)
  private val MomentsDriverBudgetBytes = 2L << 30

  private def base(emb: DataFrame, idCol: String,
                   vecCol: String): Dataset[(Long, Seq[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
  }

  /** Upper-triangle covariance, bit-reproducible via a TWO-LEVEL
    * deterministic fold (the packSequences scheme): ids bucket by
    * `id div bucketWidth` (order-preserving arithmetic, no sampling),
    * each bucket's d²+d sums accumulate in ascending id order inside one
    * partition, and the driver folds bucket partials in ascending bucket
    * order. One corpus shuffle of n ROWS (never the n·d²/2 exploded
    * cells a per-cell groupBy would move); driver state is
    * buckets × d(d+1)/2 doubles.
    *
    * An external engine reproduces every bit with the same nested fold:
    * inner `list_reduce(list(x_i*x_j ORDER BY id))` per (cell, bucket),
    * outer `list_reduce(list(partial ORDER BY bucket))`.
    *
    * @return (i, j, n, cov) for 0 <= i <= j < d, cov rounded to 9 dp
    */
  def covarianceExact(emb: DataFrame, idCol: String, vecCol: String,
                      bucketWidth: Long = 1024L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    exactMoments(emb, idCol, vecCol, bucketWidth) match {
      case None =>
        spark.createDataset(Seq.empty[(Int, Int, Long, Double)])
          .toDF("i", "j", "n", "cov")
      case Some(total) =>
        val d = total.d
        val m = covMatrix(total)
        def r9(x: Double): Double =
          java.math.BigDecimal.valueOf(x)
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        val rows = for { i <- 0 until d; j <- i until d } yield
          (i, j, total.n, r9(m(i * d + j)))
        spark.createDataset(rows).toDF("i", "j", "n", "cov")
    }
  }

  /** The ONE definition of moments → covariance: cov_ij = E[x_i x_j] -
    * E[x_i]E[x_j], evaluated as sxy/n - (sx_i/n)(sx_j/n) in that operand
    * order (the order the oracles mirror). Full symmetric d×d, unrounded.
    */
  private def covMatrix(total: Acc): Array[Double] = {
    val d = total.d
    val m = new Array[Double](d * d)
    for { i <- 0 until d; j <- i until d } {
      val c = total.sxy(i * d + j) / total.n -
        (total.sx(i) / total.n) * (total.sx(j) / total.n)
      m(i * d + j) = c
      m(j * d + i) = c
    }
    m
  }

  /** The deterministic moment sums behind [[covarianceExact]] — also the
    * single corpus pass [[topPrincipalComponent]] and [[pcaProject]]
    * reuse (means = sx/n come for free; recomputing them separately
    * would cost a second scan). None on an empty corpus.
    */
  private def exactMoments(emb: DataFrame, idCol: String, vecCol: String,
                           bucketWidth: Long): Option[Acc] = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val spark = emb.sparkSession
    import spark.implicits._
    val withB = base(emb, idCol, vecCol).toDF("id", "v")
      .withColumn("b", expr(s"id div ${bucketWidth}L"))
      .repartition(col("b")).sortWithinPartitions("b", "id")
      .as[(Long, Seq[Double], Long)]
    // driver-budget guard: the collect below ships one (d²+d)-double
    // partial PER BUCKET. With dense ids that is rows/bucketWidth
    // partials; with SPARSE ids (md5-derived 60-bit) `id div width` can
    // put nearly every row in its own bucket and the collect becomes a
    // driver OOM. Fail with the remediation instead: widen bucketWidth
    // toward (max_id - min_id)/1e5, or use covarianceFast when
    // bit-auditable fold order isn't required.
    val firstV = withB.limit(1).collect()
    if (firstV.isEmpty) return None
    val d0 = firstV.head._2.length.toLong
    val nB = withB.agg(countDistinct(col("b"))).head().getLong(0)
    val bytes = nB * (d0 * d0 + d0 + 2L) * 8L
    require(bytes <= MomentsDriverBudgetBytes,
      s"exactMoments would collect $nB bucket partials of ${d0}x${d0} " +
        s"moment sums (~${bytes >> 20} MiB) to the driver — the ids are " +
        s"too sparse for bucketWidth=$bucketWidth. Pass a bucketWidth " +
        "near (max_id - min_id) / 100000, or use covarianceFast for the " +
        "non-bit-auditable estimate.")
    val partials = withB.mapPartitions { it =>
      // a hash partition holds whole buckets; rows arrive (b, id)-sorted,
      // so per-bucket accumulation IS the ascending-id fold
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Acc)]
      var curB = 0L
      var acc: Acc = null
      it.foreach { case (_, v, bk) =>
        if (acc == null || bk != curB) {
          if (acc != null) out += ((curB, acc))
          acc = Acc.empty(v.length)
          curB = bk
        }
        acc.add(v)
      }
      if (acc != null) out += ((curB, acc))
      out.iterator
    }.collect().sortBy(_._1)
    if (partials.isEmpty) return None
    // outer fold: bucket partials in ascending bucket order
    val total = Acc.empty(partials.head._2.d)
    partials.foreach { case (_, a) => total.merge(a) }
    Some(total)
  }

  /** One-pass covariance: each partition folds a d²+d+1 accumulator
    * (pair sums, column sums, count), partials merge associatively —
    * the map-side-combined full-corpus path. Not bit-deterministic
    * (double addition order follows partitioning).
    *
    * @return (i, j, n, cov) for 0 <= i <= j < d (unrounded)
    */
  def covarianceFast(emb: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val parts = base(emb, idCol, vecCol).mapPartitions { it =>
      var acc: Acc = null
      it.foreach { case (_, v) =>
        if (acc == null) acc = Acc.empty(v.length)
        acc.add(v)
      }
      if (acc == null) Iterator.empty else Iterator.single(acc)
    }.collect()
    if (parts.isEmpty)
      return spark.createDataset(Seq.empty[(Int, Int, Long, Double)])
        .toDF("i", "j", "n", "cov")
    val total = parts.reduce(_.merge(_))
    val d = total.d
    val m = covMatrix(total)
    val rows = for { i <- 0 until d; j <- i until d } yield
      (i, j, total.n, m(i * d + j))
    spark.createDataset(rows).toDF("i", "j", "n", "cov")
  }

  /** Mergeable covariance accumulator (d² pair sums + d column sums). */
  private[ext] final case class Acc(d: Int, var n: Long,
                                    sx: Array[Double], sxy: Array[Double]) {
    def add(v: Seq[Double]): Unit = {
      require(v.length == d, s"dimension mismatch: ${v.length} vs $d")
      val a = v.toArray
      var i = 0
      while (i < d) {
        sx(i) += a(i)
        var j = i
        while (j < d) { sxy(i * d + j) += a(i) * a(j); j += 1 }
        i += 1
      }
      n += 1
    }
    def merge(o: Acc): Acc = {
      require(o.d == d, s"dimension mismatch: ${o.d} vs $d")
      var k = 0
      while (k < d) { sx(k) += o.sx(k); k += 1 }
      k = 0
      while (k < d * d) { sxy(k) += o.sxy(k); k += 1 }
      n += o.n
      this
    }
  }
  private[ext] object Acc {
    def empty(d: Int): Acc =
      Acc(d, 0L, new Array[Double](d), new Array[Double](d * d))
  }

  /** Top principal component of the corpus: deterministic power iteration
    * on the driver over the unrounded exact moment sums (the same values
    * [[covarianceExact]] rounds to 9 dp for its published cells;
    * KB-sized at embedding dims). Sign-fixed so the first nonzero
    * coordinate is positive — reproducible across runs.
    *
    * Robustness: a single fixed start fails whenever it coincides with a
    * non-top eigenvector (in exact arithmetic the missing component
    * never appears — e.g. perfectly anti-correlated dims whose top PC is
    * orthogonal to all-ones). So EVERY deterministic start (all-ones and
    * each basis vector) is iterated, and the candidate with the largest
    * Rayleigh quotient vᵀMv wins; at least one basis vector overlaps the
    * top eigenvector, so the winner spans the top eigenspace. d+1 runs
    * of O(d² · iterations) driver flops — microseconds at embedding dims.
    */
  def topPrincipalComponent(emb: DataFrame, idCol: String, vecCol: String,
                            iterations: Int = 50): Array[Double] = {
    val total = exactMoments(emb, idCol, vecCol, 1024L)
      .getOrElse(throw new IllegalArgumentException(
        "empty corpus has no principal component"))
    powerIterate(covMatrix(total), total.d, iterations)
  }

  private def powerIterate(m: Array[Double], d: Int,
                           iterations: Int): Array[Double] = {
    def step(v: Array[Double]): Array[Double] = {
      val nv = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += m(i * d + j) * v(j); j += 1 }
        nv(i) = s
        i += 1
      }
      nv
    }
    // deterministic starts: all-ones, then each basis vector; the best
    // Rayleigh quotient across converged candidates wins (a start stuck
    // on a lesser eigenvector simply loses the comparison)
    val starts = Iterator.single(Array.fill(d)(1.0 / math.sqrt(d))) ++
      Iterator.tabulate(d)(k => Array.tabulate(d)(i => if (i == k) 1.0 else 0.0))
    var best: Array[Double] = null
    var bestLambda = Double.NegativeInfinity
    for (start <- starts) {
      var v = start
      var ok = true
      var it = 0
      while (it < iterations && ok) {
        val nv = step(v)
        val norm = math.sqrt(nv.map(x => x * x).sum)
        if (norm == 0.0) ok = false else v = nv.map(_ / norm)
        it += 1
      }
      if (ok) {
        val mv = step(v)
        var lambda = 0.0
        var i = 0
        while (i < d) { lambda += v(i) * mv(i); i += 1 }
        if (lambda > bestLambda) { bestLambda = lambda; best = v }
      }
    }
    if (best == null)
      // zero matrix: every direction is (vacuously) principal
      return Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    val firstNz = best.indexWhere(_ != 0.0)
    if (firstNz >= 0 && best(firstNz) < 0) best.map(-_) else best
  }

  /** Project every vector onto the top principal component (centered):
    * the 1-D PCA score, computed as one broadcast-vector expression pass.
    * The moment sums are computed ONCE — means fall out of the same
    * corpus pass that feeds the eigen-solve.
    *
    * @return input + (pca1)
    */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
                 iterations: Int = 50): DataFrame = {
    val total = exactMoments(emb, idCol, vecCol, 1024L)
      .getOrElse(throw new IllegalArgumentException(
        "empty corpus has no principal component"))
    val d = total.d
    val pc = powerIterate(covMatrix(total), d, iterations)
    val mean = Array.tabulate(d)(i => total.sx(i) / total.n)
    val pcLit = typedLit(pc.toSeq)
    val meanLit = typedLit(mean.toSeq)
    emb.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .withColumn("pca1",
        aggregate(
          zip_with(
            zip_with(col(vecCol).cast("array<double>"), meanLit,
              (x, m) => x - m),
            pcLit, (c, p) => c * p),
          lit(0.0), (acc, v) => acc + v))
  }

  /** Fixed-bin histogram of a numeric column — the corpus-distribution
    * diagnostic (document lengths, quality scores, token counts) that
    * every curation decision starts from. Bin -1 is underflow (< lo),
    * bin `nBins` overflow (>= hi); interior bin edges are emitted, empty
    * bins included, so the result plots directly.
    *
    * Scale shape: ONE aggregation whose map-side partials are already
    * ≤ nBins+2 rows — the corpus collapses before the shuffle; the dense
    * bin frame then broadcast-joins. Nothing downstream scales with
    * input size.
    *
    * @return (bin, bin_lo, bin_hi, cnt) — edges null on the two
    *         open-ended bins
    */
  def histogram(df: DataFrame, valueCol: Column, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val spark = df.sparkSession
    val w = (hi - lo) / nBins
    // least() clamp: when w is inexact, (v - lo)/w can reach nBins for a
    // v strictly below hi (e.g. lo=0, hi=1, nBins=3, v=1-1ulp) — such a
    // value must land in the top interior bin, not overflow.
    // NaN routes explicitly into the overflow bin (the convention Spark's
    // total ordering implies — NaN sorts above every real number); left
    // implicit it would fall through both range branches into a null bin
    // the dense-bin join silently drops, and the counts would no longer
    // sum to the non-null row count
    val bin = when(valueCol.cast("double").isNaN, nBins)
      .when(valueCol < lo, -1)
      .when(valueCol >= hi, nBins)
      .otherwise(least(
        floor((valueCol.cast("double") - lo) / w).cast("int"),
        lit(nBins - 1)))
    val counts = df.filter(valueCol.isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    val bins = spark.range(-1L, nBins + 1L)
      .select(col("id").cast("int").as("bin"))
    bins.join(counts, Seq("bin"), "left_outer")
      .select(col("bin"),
        when(col("bin").between(0, nBins - 1),
          lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        when(col("bin").between(0, nBins - 1),
          lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Z-score standardization of an INTEGRAL feature column (lengths,
    * token counts, ordinal scores) — the normalization step before
    * thresholding or combining quality features. Bit-reproducible by
    * construction: the moment sums are exact integer arithmetic (no
    * float fold-order sensitivity), and mean/std derive from them with a
    * fixed IEEE formula — so any engine computing the same sums produces
    * the same z to the 6-dp round. Long sums bound the domain: |value|
    * must stay below ~3e9·√(1/rows) of overflow, i.e. value² · rows <
    * 2^63 — lengths and counts, not raw ids.
    *
    * Scale shape: ONE aggregation to a single row, broadcast back over
    * the corpus as an expression pass; rows with a null value keep a
    * null z. Sample std (n−1); z is null when n < 2 or std = 0.
    *
    * @return input columns + z (rounded to 6 dp)
    */
  def zscore(df: DataFrame, valueCol: Column): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase("z")),
      "zscore adds a 'z' column; rename the existing one")
    // enforce the documented INTEGRAL domain: a silent cast('long') on a
    // double/decimal column would truncate toward zero and produce wrong
    // z-scores — same hazard class bloomSubtract guards against
    val vt = df.select(valueCol).schema.head.dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(vt),
      s"zscore needs an integral value column (exact moment sums); got $vt" +
        " — pre-bucket or scale-and-round real-valued features first")
    import graft.ops.Cols
    val (nC, sC, qC) = (Cols.fresh(df, "_zs_n"), Cols.fresh(df, "_zs_s"),
      Cols.fresh(df, "_zs_q"))
    val v = valueCol.cast("long")
    val stats = df.filter(valueCol.isNotNull)
      .agg(count(lit(1)).as(nC), sum(v).as(sC), sum(v * v).as(qC))
    val mean = col(sC).cast("double") / col(nC)
    val sd = sqrt((col(qC).cast("double") -
      col(sC).cast("double") * col(sC).cast("double") / col(nC)) /
      (col(nC) - lit(1L)))
    df.crossJoin(broadcast(stats))
      .withColumn("z",
        when(col(nC) >= 2L && sd > 0.0 && valueCol.isNotNull,
          round((v - mean) / sd, 6)))
      .drop(nC, sC, qC)
  }
}
