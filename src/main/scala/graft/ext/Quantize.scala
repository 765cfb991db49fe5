package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Symmetric int8 embedding quantization: per-vector scale =
  * max|x| / 127, q_i = round(x_i / scale) in [-127, 127] — the standard
  * storage/bandwidth reduction for embedding corpora (4x smaller than
  * float32, 8x smaller than float64; distance computations over int8 are
  * also SIMD-friendlier downstream).
  *
  * Pure per-row expression work: zero shuffle, and every step is plain
  * ANSI arithmetic, so stored quantized vectors can be re-derived and
  * audited by any SQL engine (same portability contract as the md5 token
  * hashes). Zero vectors quantize to all-zero with scale 0 — never a
  * division by zero.
  */
object Quantize {

  /** Per-vector quantization scale: max|x| / 127 (0.0 for zero/empty). */
  def int8Scale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0.0)) / 127.0

  /** Quantized int8 codes (as an int array; the parquet writer narrows). */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L), least(lit(127L),
          round(x / s, 0).cast("long")))).cast("int"))
  }

  /** One scalar pass computing (id, scale, q_sum, mse) per vector — the
    * performance path. The expression forms above re-evaluate the scale
    * subtree per element when interpreted (higher-order lambdas see no
    * common-subexpression elimination), turning O(d) into O(d²) per row;
    * this pass is O(d) and bit-identical: same max-fold, same
    * BigDecimal(HALF_UP) rounding as Spark's round(), same element-order
    * error fold (QuantizeParity in TrainingDataSpec pins it).
    */
  def quantizeStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                    vecCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      // engine null convention (same guard as pqAssign): a null id/vector
      // row is skipped, not an executor NPE — the expression twins
      // (int8Scale/int8Mse) null-propagate the same rows away
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        var mx = 0.0
        var i = 0
        while (i < v.length) { val a = math.abs(v(i)); if (a > mx) mx = a; i += 1 }
        val scale = mx / 127.0
        var qSum = 0L
        var sqErr = 0.0
        i = 0
        while (i < v.length) {
          val q =
            if (scale == 0.0) 0L
            else math.max(-127L, math.min(127L,
              java.math.BigDecimal.valueOf(v(i) / scale)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
          qSum += q
          val e = v(i) - q.toDouble * scale
          sqErr += e * e
          i += 1
        }
        val mse = if (v.length > 0) sqErr / v.length else 0.0
        (id, scale, qSum, mse)
      })
      .toDF(idCol, "scale", "q_sum", "mse")
  }

  /** Mean squared reconstruction error of the quantization, folded in
    * element order (deterministic, oracle-reproducible).
    */
  def int8Mse(vec: Column): Column = {
    val s = int8Scale(vec)
    val sqErr = aggregate(vec, lit(0.0), (acc, x) => {
      val q = when(s === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L), least(lit(127L),
          round(x / s, 0).cast("long"))))
      val e = x - q.cast("double") * s
      acc + e * e
    })
    when(size(vec) > 0, sqErr / size(vec).cast("double")).otherwise(lit(0.0))
  }

  /** Product-quantization assignment (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): dimensions split into `m`
    * equal subspaces; each subvector maps to its nearest per-subspace
    * centroid. A vector compresses to m small codes (8 bytes at m=8,
    * k=256 — a 32× cut on a 64-dim float vector), and ANN distances
    * become per-subspace table lookups.
    *
    * Codebooks are DETERMINISTIC (subvectors of the k smallest ids, the
    * Clustering.seedCentroids rule) with element-ordered distance folds
    * and lowest-index tie-breaks, so an external engine re-derives every
    * code — the same auditability contract as emb_kmeans_assign.
    *
    * Scale shape: the codebook is m×k×(d/m) = k×d doubles broadcast; the
    * assignment is ONE scalar pass over the corpus, zero shuffle, n·k·d
    * flops total.
    *
    * @return (idCol, subspace, code, dist2) — one row per (vector,
    *         subspace), dist2 the squared L2 to the chosen centroid
    */
  /** The deterministic PQ codebook: per-subspace centroids sliced from
    * the k smallest-id vectors. `codebook(s)(c)` is subspace s's centroid
    * c — k×d doubles total, the broadcast payload of every PQ operation.
    */
  def pqCodebook(emb: DataFrame, idCol: String, vecCol: String,
                 m: Int, k: Int): Array[Array[Array[Double]]] = {
    require(m > 0 && k > 0, s"need positive m/k, got $m/$k")
    val seeds = Clustering.seedCentroids(emb, idCol, vecCol, k)
    require(seeds.nonEmpty, "empty corpus has no codebook")
    val d = seeds.head.length
    require(d % m == 0, s"dimension $d not divisible into $m subspaces")
    val sd = d / m
    Array.tabulate(m)(s => seeds.map(_.slice(s * sd, (s + 1) * sd)))
  }

  def pqAssign(emb: DataFrame, idCol: String, vecCol: String,
               m: Int, k: Int): DataFrame =
    pqAssignWith(emb, idCol, vecCol, pqCodebook(emb, idCol, vecCol, m, k))

  /** As [[pqAssign]] against a PRECOMPUTED codebook — callers holding one
    * (pqTopK, persisted-index pipelines) skip the second seed-collect job
    * an (m, k) overload would re-run.
    */
  def pqAssignWith(emb: DataFrame, idCol: String, vecCol: String,
                   cents: Array[Array[Array[Double]]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        val mm = cs.length
        val ssd = cs(0)(0).length
        it.flatMap { case (id, v) =>
          (0 until mm).iterator.map { s =>
            val sv = v.slice(s * ssd, (s + 1) * ssd)
            val (best, bd) = Clustering.nearestCentroid(sv, cs(s))
            (id, s, best, bd)
          }
        }
      }
      .toDF(idCol, "subspace", "code", "dist2")
  }

  /** PQ codes in compact form: one row per vector, codes ordered by
    * subspace — the stored index payload.
    *
    * @return (idCol, codes array<int>)
    */
  def pqCodes(emb: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int): DataFrame =
    pqCodesWith(emb, idCol, vecCol, pqCodebook(emb, idCol, vecCol, m, k))

  /** As [[pqCodes]] against a precomputed codebook. */
  def pqCodesWith(emb: DataFrame, idCol: String, vecCol: String,
                  cents: Array[Array[Array[Double]]]): DataFrame =
    pqAssignWith(emb, idCol, vecCol, cents)
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("subspace"), col("code"))))
        .as("sc"))
      .select(col(idCol),
        transform(col("sc"), e => e.getField("code")).as("codes"))

  /** PQ asymmetric-distance top-k (ADC — Jégou et al. §IV): the query
    * stays unquantized; every stored vector's distance is approximated by
    * summing, per subspace, the PRECOMPUTED distance from the query's
    * subvector to the stored code's centroid. The scan reads m small ints
    * per row and does m table lookups — no float vectors move, which is
    * the entire point of a PQ index at corpus scale. The m×k lookup
    * table is driver-computed (k×d flops) and broadcast; the global
    * top-k is TakeOrderedAndProject, never a full sort.
    *
    * @param codes    a [[pqCodes]] frame (the stored index)
    * @param codebook the [[pqCodebook]] the codes were built with
    * @param query    the unquantized query vector (length d)
    * @return (idCol, adc) — topK rows ascending by approximate distance,
    *         ties broken by id
    */
  def pqTopKFromCodes(codes: DataFrame, idCol: String,
                      codebook: Array[Array[Array[Double]]],
                      query: Array[Double], topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val m = codebook.length
    val sd = codebook(0)(0).length
    require(query.length == m * sd,
      s"query dim ${query.length} != codebook dim ${m * sd}")
    val table: Array[Array[Double]] = Array.tabulate(m) { s =>
      val qs = query.slice(s * sd, (s + 1) * sd)
      codebook(s).map(c => Clustering.dist2(qs, c))
    }
    val spark = codes.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(table)
    codes.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Seq[Int])]
      .map { case (id, cs) =>
        val t = bc.value
        var adc = 0.0
        var s = 0
        while (s < t.length) { adc += t(s)(cs(s)); s += 1 }
        (id, adc)
      }
      .toDF(idCol, "adc")
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
  }

  /** Convenience ADC search against a raw embedding frame: builds the
    * codebook and codes, then scores every OTHER vector against the
    * stored vector `queryId`. Production callers persist [[pqCodes]]
    * once and use [[pqTopKFromCodes]] per query.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
             queryId: Long, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = pqCodebook(emb, idCol, vecCol, m, k)
    // absent query id -> empty result, matching the sibling top-k APIs
    // (head() would throw an opaque 'next on empty iterator')
    emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]].collect().headOption match {
      case None =>
        spark.range(0).select(col("id").as(idCol), lit(0.0).as("adc"))
      case Some(q) =>
        // codes come from the FULL corpus (same deterministic codebook as
        // cb, computed ONCE and passed through); the query row is dropped
        // AFTER coding — filtering first would shift the k-smallest-id
        // seeds and desync index and lookup table
        pqTopKFromCodes(
          pqCodesWith(emb, idCol, vecCol, cb)
            .filter(col(idCol).cast("long") =!= queryId),
          idCol, cb, q.toArray, topK)
    }
  }
}
