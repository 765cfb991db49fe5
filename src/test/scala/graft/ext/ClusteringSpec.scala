package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ClusteringSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val corners = Seq(
    (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)), // seeds k=2
    (2L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)),
    (4L, Array(9.0, 10.0)), (5L, Array(10.0, 9.0))
  ).toDF("vec_id", "embedding")

  test("assign picks the nearest centroid with element-ordered distances") {
    val got = Clustering.assign(corners, "vec_id", "embedding",
        Array(Array(0.0, 0.0), Array(10.0, 10.0)))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(0, 1, 0, 0, 1, 1))
    assert(got(0)._3 == 0.0 && got(2)._3 == 1.0 && got(4)._3 == 1.0)
  }

  test("assign breaks exact ties to the lowest cluster index") {
    val mid = Seq((7L, Array(5.0, 5.0))).toDF("vec_id", "embedding")
    val got = Clustering.assign(mid, "vec_id", "embedding",
      Array(Array(0.0, 0.0), Array(10.0, 10.0))).head()
    assert(got.getInt(1) == 0) // equidistant -> first centroid
  }

  test("assign excludes null ids and null vectors (engine convention)") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), Array(1.0)),
      (null.asInstanceOf[java.lang.Long], Array(2.0)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[Array[Double]])
    ).toDF("vec_id", "embedding")
    val got = Clustering.assign(df, "vec_id", "embedding", Array(Array(0.0)))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("seedCentroids returns the k smallest ids' vectors in id order") {
    val seeds = Clustering.seedCentroids(corners, "vec_id", "embedding", 2)
    assert(seeds.length == 2)
    assert(seeds(0).toSeq == Seq(0.0, 0.0) && seeds(1).toSeq == Seq(10.0, 10.0))
  }

  test("kmeans converges on separated blobs and inertia never increases") {
    val (c1, a1) = Clustering.kmeans(corners, "vec_id", "embedding", k = 2,
      maxIters = 1)
    val (c5, a5) = Clustering.kmeans(corners, "vec_id", "embedding", k = 2,
      maxIters = 5)
    val i1 = Clustering.inertia(a1)
    val i5 = Clustering.inertia(a5)
    assert(i5 <= i1 + 1e-9)
    // blobs are symmetric: converged centroids are the blob means
    assert(c5(0).zip(Array(1.0 / 3, 1.0 / 3)).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 })
    assert(c5(1).zip(Array(29.0 / 3, 29.0 / 3)).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 })
    // every vector assigned to its blob
    val clusters = a5.orderBy("vec_id").collect().map(_.getInt(1)).toSeq
    assert(clusters == Seq(0, 1, 0, 0, 1, 1))
  }

  test("kmeans keeps the previous centroid for an empty cluster") {
    // both points sit at the same spot as seed 0; seed 1 goes empty
    val df = Seq((0L, Array(0.0)), (1L, Array(0.0)))
      .toDF("vec_id", "embedding")
    val (cs, _) = Clustering.kmeans(df, "vec_id", "embedding", k = 2,
      maxIters = 3)
    assert(cs(0).toSeq == Seq(0.0) && cs(1).toSeq == Seq(0.0))
  }

  test("labelCentroidsExact folds in ascending id order") {
    val df = Seq(
      (0L, 1, Array(1.0, 2.0)), (1L, 1, Array(3.0, 4.0)),
      (2L, 2, Array(10.0, 20.0))
    ).toDF("vec_id", "label", "embedding")
    val got = Clustering.labelCentroidsExact(df, "label", "vec_id", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 0, 2L, 2.0), (1, 1, 2L, 3.0),
      (2, 0, 1L, 10.0), (2, 1, 1L, 20.0)))
  }

  test("semanticNearDupPairs only pairs within a cluster") {
    // 2 and 3 are near-identical directions near seed 0; 4 and 5 near seed 1
    val pairs = Dedup.semanticNearDupPairs(corners, "vec_id", "embedding",
      k = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no pair may straddle the {0,2,3} / {1,4,5} split
    val blobA = Set(0L, 2L, 3L)
    assert(pairs.forall { case (a, b) =>
      blobA.contains(a) == blobA.contains(b) })
    // the in-blob near-dups survive
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 5L)))
  }
}
