package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

class RhpParitySpec extends AnyFunSuite with SharedSpark {

  test("scalar RHP signature equals the Catalyst expression form bit for bit") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val expr = emb.select(col("vec_id"),
        Similarity.rhpSignature(col("embedding").cast("array<double>"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planes = Array.tabulate(32,
      emb.head().getSeq[Float](1).length)(Similarity.planeComponentScalar)
    val scalar = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map { r =>
        r.getLong(0) -> Similarity.rhpSignatureScalar(
          r.getSeq[Double](1).toArray, planes)
      }.toMap
    assert(expr == scalar)
  }
}
