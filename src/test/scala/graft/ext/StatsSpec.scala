package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class StatsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("covarianceExact matches hand-computed population covariance") {
    val emb = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 6.0)))
      .toDF("vec_id", "embedding")
    val got = Stats.covarianceExact(emb, "vec_id", "embedding")
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // means (2, 4); cov = E[xy] - E[x]E[y]
    assert(got((0, 0)) == (2L, 1.0))
    assert(got((0, 1)) == (2L, 2.0))
    assert(got((1, 1)) == (2L, 4.0))
    assert(got.size == 3) // upper triangle only
  }

  test("covarianceFast agrees with exact within 1e-9 on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Stats.covarianceExact(emb, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val fast = Stats.covarianceFast(emb, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(exact.keySet == fast.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(fast(k) - v) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"cell $k: fast=${fast(k)} exact=$v")
    }
    // d=64 upper triangle
    assert(exact.size == 64 * 65 / 2)
  }

  test("covarianceFast on an empty corpus returns an empty frame") {
    val emb = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
      .filter(col("vec_id") < 0)
    assert(Stats.covarianceFast(emb, "vec_id", "embedding").count() == 0L)
  }

  test("topPrincipalComponent recovers a planted direction, sign-fixed") {
    // all mass along (3,4)/5: scalars t in {-2,-1,1,2} => zero mean
    val dir = Seq(0.6, 0.8)
    val emb = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex
      .map { case (t, i) => (i.toLong, dir.map(_ * t)) }
      .toDF("vec_id", "embedding")
    val pc = Stats.topPrincipalComponent(emb, "vec_id", "embedding")
    assert(math.abs(pc(0) - 0.6) < 1e-12 && math.abs(pc(1) - 0.8) < 1e-12)
    // unit norm, positive first coordinate (sign fix)
    assert(math.abs(pc.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("topPrincipalComponent survives a zero-variance leading dimension") {
    // dim 0 constant: covariance row 0 is all zeros; an e_0-started
    // iteration would stall there — the all-ones start must find (0, 1)
    val emb = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex
      .map { case (t, i) => (i.toLong, Seq(5.0, t)) }
      .toDF("vec_id", "embedding")
    val pc = Stats.topPrincipalComponent(emb, "vec_id", "embedding")
    assert(math.abs(pc(0)) < 1e-12 && math.abs(pc(1) - 1.0) < 1e-12, pc.toSeq)
  }

  test("topPrincipalComponent: top PC orthogonal to the all-ones start") {
    // cov [[5,-3],[-3,5]]: the all-ones direction is the LESSER
    // eigenvector (lambda 2); the true top PC is (1,-1)/sqrt(2)
    // (lambda 8) — the Rayleigh-quotient selection must find it
    val emb = Seq((0L, Seq(1.0, -3.0)), (1L, Seq(3.0, -1.0)),
      (2L, Seq(-1.0, 3.0)), (3L, Seq(-3.0, 1.0)))
      .toDF("vec_id", "embedding")
    val pc = Stats.topPrincipalComponent(emb, "vec_id", "embedding")
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(pc(0) - r) < 1e-9 && math.abs(pc(1) + r) < 1e-9, pc.toSeq)
  }

  test("zero-variance corpus falls back to a deterministic unit vector") {
    val emb = (0L until 4L).map((_, Seq(3.0, 7.0))).toDF("vec_id", "embedding")
    val pc = Stats.topPrincipalComponent(emb, "vec_id", "embedding")
    assert(pc.toSeq == Seq(1.0, 0.0))
    // projections of identical vectors are all zero (centered)
    val scores = Stats.pcaProject(emb, "vec_id", "embedding")
      .collect().map(_.getAs[Double]("pca1"))
    assert(scores.forall(s => math.abs(s) < 1e-12))
  }

  test("pcaProject scores are the centered dot products with the top PC") {
    val dir = Seq(0.6, 0.8)
    // offset mean (10, 20): projection must center first
    val emb = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex
      .map { case (t, i) =>
        (i.toLong, dir.zip(Seq(10.0, 20.0)).map { case (d, m) => d * t + m })
      }
      .toDF("vec_id", "embedding")
    val scores = Stats.pcaProject(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getAs[Double]("pca1"))
    // centered scores are the original scalars t
    Seq(-2.0, -1.0, 1.0, 2.0).zip(scores).foreach { case (t, s) =>
      assert(math.abs(s - t) < 1e-9, s"want $t got $s")
    }
  }
}
