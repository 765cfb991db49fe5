package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Embedding clustering for training-data curation: deterministic
  * k-means (Lloyd's algorithm) plus per-label centroid audits. Clustering
  * is the scale lever for the O(n²) embedding operators — SemDeDup
  * (Abbas et al. 2023) dedups WITHIN clusters only, and IVF search probes
  * one cell — so the cluster assignment itself must be cheap, shuffle-free
  * and reproducible.
  *
  * Determinism contract: seeds are the vectors of the k smallest ids (no
  * random init), distances accumulate in element order (the same
  * sequential fold an external SQL engine uses), and ties go to the
  * lowest cluster index — every assignment is re-derivable outside the
  * engine, like the md5 mixing buckets (Mixing.hashBucket).
  */
object Clustering {

  /** Vectors of the `k` smallest ids, as the deterministic seed set.
    * A tiny global top-k (TakeOrderedAndProject — never a full sort).
    */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): Array[Array[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])]
      .toDF("id", "v").orderBy("id").limit(k)
      .as[(Long, Array[Double])].collect().map(_._2)
  }

  /** Squared L2 distance, accumulated in element order — bit-for-bit the
    * fold `list_reduce(list_prepend(0.0, [(v[i]-c[i])^2 ...]), +)`
    * computes, so assignments match an external oracle exactly.
    */
  private[ext] def dist2(v: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(v.length, c.length)
    while (i < n) { val d = v(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** Nearest centroid of `v`: strict `<` keeps the FIRST best centroid,
    * so ties go to the lowest cluster index deterministically.
    */
  private[ext] def nearestCentroid(v: Array[Double],
                                   cs: Array[Array[Double]]): (Int, Double) = {
    var best = 0
    var bestD = dist2(v, cs(0))
    var c = 1
    while (c < cs.length) {
      val d = dist2(v, cs(c))
      if (d < bestD) { best = c; bestD = d }
      c += 1
    }
    (best, bestD)
  }

  /** Nearest-centroid assignment: one scalar pass over the corpus with the
    * centroid matrix broadcast — zero shuffle, perfectly parallel (the
    * 100 TB path: k×d doubles per executor, n×k×d flops total). Null
    * ids/vectors are excluded (engine null-id convention).
    *
    * @return (idCol, cluster, dist2)
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          val (best, bestD) = nearestCentroid(v, cs)
          (id, best, bestD)
        }
      }
      .toDF(idCol, "cluster", "dist2")
  }

  /** As [[assign]], but CARRIES THE VECTOR through: (id, vector, cluster)
    * in the same scalar pass — the shape the pairwise consumers
    * (SemDeDup) need, avoiding a corpus-sized join to re-attach vectors
    * to their cluster labels.
    */
  def assignWithVec(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, v, nearestCentroid(v, cs)._1) }
      }
      .toDF(idCol, vecCol, "cluster")
  }

  /** Lloyd's k-means: deterministic seeds (k smallest ids), `maxIters`
    * assign/update rounds. The update is a partial-aggregable typed
    * reduce — per-partition element-wise vector sums merge map-side, so
    * each iteration shuffles k×partitions partial sums, never the corpus.
    * Empty clusters keep their previous centroid. Centroid sums add
    * doubles in shuffle-merge order; downstream consumers needing
    * bit-reproducible assignments should pin the returned centroids and
    * re-run [[assign]] (which IS reproducible given fixed centroids).
    *
    * @return (final centroids, final assignment frame (idCol, cluster, dist2))
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             maxIters: Int = 10): (Array[Array[Double]], DataFrame) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val spark = emb.sparkSession
    import spark.implicits._
    // materialized once: every Lloyd iteration plus the final assign
    // scans this frame — without the checkpoint a 10-iteration run would
    // re-evaluate the upstream source ~12 times (seed + iterations +
    // final), paying the full read each round
    val vecs = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Double])].toDF(idCol, "v")
      .localCheckpoint()
    var centroids = seedCentroids(emb, idCol, vecCol, k)
    var iter = 0
    while (iter < maxIters) {
      // cluster labels ride along with the vectors in one scalar pass —
      // an assign-then-join would shuffle the corpus twice per iteration
      val sums = assignWithVec(vecs, idCol, "v", centroids)
        .select(col("cluster"), col("v"))
        .as[(Int, Array[Double])]
        .groupByKey(_._1)
        .mapValues { case (_, v) => (v, 1L) }
        .reduceGroups { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
          // ragged-vector safety: sum into the longer array (missing
          // trailing dims contribute 0) instead of indexing past the
          // shorter one — consistent with dist2's tolerance
          val (long, short) =
            if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
          val s = long.clone()
          var i = 0
          while (i < short.length) { s(i) += short(i); i += 1 }
          (s, a._2 + b._2)
        }
        .collect()
      val next = centroids.clone()
      sums.foreach { case (c, (s, n)) => next(c) = s.map(_ / n) }
      centroids = next
      iter += 1
    }
    (centroids, assign(vecs, idCol, "v", centroids))
  }

  /** Corpus-wide inertia (sum of squared distances) of an assignment —
    * the convergence metric (non-increasing across Lloyd iterations).
    */
  def inertia(assigned: DataFrame): Double =
    assigned.agg(coalesce(sum("dist2"), lit(0.0))).head().getDouble(0)

  /** Per-label exact centroids, one row per (label, dimension): the mean
    * accumulates in ASCENDING ID ORDER via an ordered fold, so the result
    * is bit-reproducible across runs and engines — this is the auditable
    * path (per-group ordered lists bound memory by group size; use a plain
    * `avg` when ulp-reproducibility doesn't matter, e.g. monitoring
    * dashboards at full corpus scale).
    *
    * @return (label, pos, n_vecs, mean_x)
    */
  def labelCentroidsExact(emb: DataFrame, labelCol: String, idCol: String,
                          vecCol: String): DataFrame =
    emb.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(labelCol).as("label"), col(idCol).cast("long").as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sort_array(collect_list(struct(col("id"), col("x")))).as("xs"))
      .select(col("label"), col("pos"),
        size(col("xs")).cast("long").as("n_vecs"),
        (aggregate(col("xs"), lit(0.0), (acc, e) => acc + e.getField("x"))
          / size(col("xs"))).as("mean_x"))
}
