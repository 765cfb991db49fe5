package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Scale smokes for the dedup family (the PackingSpec pattern): enough
  * synthetic volume that the DEFAULT code paths cross their adaptive
  * cutovers — the distributed min-label loop is exercised by CI with real
  * edge counts, not only by the forced `localSolveMaxEdges = 0` unit test.
  */
class DedupScaleSpec extends AnyFunSuite with SharedSpark {

  test("scale smoke: 630k edges cross the 500k cutover; distributed " +
    "labelling matches the driver union-find exactly") {
    // 210k chain components of 4 nodes (base..base+3, base = 4c): edges
    // (k, k+1) wherever k % 4 != 3. Chains give the min-label loop real
    // depth (3 propagation rounds), unlike stars which converge in one.
    val edges = spark.range(840000L)
      .filter(pmod(col("id"), lit(4)) =!= 3)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    // default API: 630k edges > the 500k cutover → distributed path
    val dist = Dedup.duplicateClusters(edges)
    // closed form: every node labels to its chain base
    assert(dist.filter(
      col("cluster_rep") =!= col("doc_id") - pmod(col("doc_id"), lit(4)))
      .count() == 0L)
    assert(dist.count() == 840000L)
    // and the driver union-find (cutover raised above the edge count)
    // produces the identical labelling row for row
    val local = Dedup.duplicateClusters(edges, localSolveMaxEdges = 1000000L)
    assert(dist.except(local).count() == 0L && local.except(dist).count() == 0L)
  }

  test("scale smoke: 10x-replicated corpus — minhash finds cross-replica " +
    "duplicates and clustering reunites every replica family") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text")
    val nBase = base.count()
    // 10 replicas with disjoint id ranges: replica r of doc d gets id
    // d + r*100000 — identical text, so every cross-replica pair is an
    // exact duplicate (Jaccard 1) the LSH bands must surface
    val corpus = spark.range(10).crossJoin(base)
      .select((col("doc_id") + col("id") * 100000L).as("doc_id"),
        col("text"))
    val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text", 32, 8, 0.5)
    val clusters = Dedup.duplicateClusters(pairs)
    // every replica family (same base id mod 100000) collapses to ONE
    // cluster rep — the 10 copies are mutually duplicate, so however the
    // LSH bands bucketed them, the components must reunite them
    val familiesSplit = clusters
      .select(pmod(col("doc_id"), lit(100000L)).as("fam"), col("cluster_rep"))
      .groupBy("fam").agg(countDistinct("cluster_rep").as("reps"),
        count(lit(1)).as("members"))
      .filter(col("reps") =!= 1L || col("members") =!= 10L)
    assert(familiesSplit.count() == 0L,
      "some replica family did not collapse to a single cluster")
    assert(clusters.select(countDistinct(pmod(col("doc_id"), lit(100000L))))
      .head().getLong(0) == nBase)
  }
}
