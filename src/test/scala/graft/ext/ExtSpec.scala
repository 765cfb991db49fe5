package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ExtSpec extends AnyFunSuite with SharedSpark {

  private lazy val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  // ---- TextAnalysis ---------------------------------------------------

  test("langId recognizes marker-bearing sentences per profile") {
    import spark.implicits._
    val df = Seq(
      ("der hund und die katze ist nicht da", "de"),
      ("el gato y la casa es de los padres", "es"),
      ("le chat et les maisons des amis est une", "fr"),
      ("the cat and the dog is in a house of tools", "en"))
      .toDF("text", "expected")
    val got = df.select(col("expected"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is in [0,1] and penalizes punctuation noise") {
    import spark.implicits._
    val df = Seq(
      "the steady growth of the market is clear and the trend is stable",
      "@@@ ## !!! ??? %% ^^ && ** (( ))")
      .toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprints are order-sensitive, rolling fingerprint detects any reorder") {
    import spark.implicits._
    val df = Seq("alpha beta gamma delta", "beta alpha gamma delta").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.rollingFingerprint(col("text")).as("kr")).collect()
    assert(fps(0).getLong(1) != fps(1).getLong(1)) // rolling differs
    assert(fps(0).getLong(0) != fps(1).getLong(0)) // positional differs
  }

  // ---- Dedup ----------------------------------------------------------

  test("minhash LSH finds the planted near-duplicates that exact jaccard confirms") {
    // ground truth: global exact pairs at J >= 0.5 (single "block")
    val exact = Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit(1)), "doc_id", "text", "blk", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 32, 8, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected planted near-duplicates in testdata")
    // exact-verification makes LSH precision 1.0; recall should be high
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size * 8 / 10, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("identical texts give identical minhash signatures and simhash 0 distance") {
    import spark.implicits._
    val df = Seq((1L, "one two three four five six"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 0).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Long]("hamming") == 0L)
  }

  test("expression-form minhash signature + lsh bands stay consistent") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "z y x w v u t s"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(split(col("text"), " ")).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 8))
    val sigs = df.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L)) // identical text -> identical signature
    assert(sigs(1L) != sigs(3L))
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBands(df, col("doc_id"), col("sig"), bands = 4, rowsPerBand = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("duplicateClusters propagates the minimum id across chained components") {
    import spark.implicits._
    // chain 5-3-9 plus separate pair 7-8: reps {3,3,3} and {7,7}
    val edges = Seq((5L, 3L), (9L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val reps = Dedup.duplicateClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 7L -> 7L, 8L -> 7L))
  }

  test("knnJoin returns exactly k deterministic neighbours per vector") {
    val knn = Similarity.knnJoin(embs, "vec_id", "embedding", "label", 3)
    val counts = knn.groupBy("id_a").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(counts == Set(3L)) // every block has > 3 members at sf0.001
    // top neighbour of vec 0 agrees with its brute-force ranking within label
    val sameLabel = embs.filter(col("vec_id") === 0).select("label")
      .collect().head.getInt(0)
    val top = knn.filter(col("id_a") === 0).orderBy(col("cos").desc)
      .collect().head.getLong(1)
    val brute = Dedup.cosineNearDupPairs(
      embs.filter(col("label") === sameLabel), "vec_id", "embedding", "label", -1.0)
      .filter(col("id_a") === 0 || col("id_b") === 0)
      .withColumn("other", when(col("id_a") === 0, col("id_b")).otherwise(col("id_a")))
      .orderBy(col("cos").desc, col("other"))
      .collect().head.getAs[Long]("other")
    assert(top == brute)
  }

  test("exact groups collapse duplicate content to the minimum id") {
    import spark.implicits._
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, sha2(col("text"), 256), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(g.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dup_cnt"))).toSeq
      == Seq((2L, 2L), (9L, 1L)))
  }

  // ---- Similarity -----------------------------------------------------

  test("cosine of a vector with itself is ~1") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a").cast("array<double>"),
      col("b").cast("array<double>")).as("c")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(embs, "vec_id", "embedding", 0L, 10,
      nBits = 16, maxHamming = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty)
    assert((brute intersect lsh).size >= 3,
      s"ANN recall too low: ${(brute intersect lsh).size}/10")
  }

  test("IVF index: partition-pruned probe achieves recall against brute force") {
    val path = tmpDir("ivf") + "/emb"
    Similarity.ivfWrite(embs, "vec_id", "embedding", path, cellBits = 6)
    val qv = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val ivf = Similarity.ivfTopK(spark, path, "vec_id", "embedding", qv,
      k = 10, cellBits = 6, maxHamming = 3, excludeId = Some(0L))
    // the scan must prune partitions (cell filter reaches PartitionFilters)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [ivf_cell"), plan)
    val got = ivf.collect().map(_.getLong(0)).toSet - 0L
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert((got intersect brute).size >= 3, s"IVF recall too low: ${(got intersect brute).size}/10")
  }

  test("salted join distributes a skewed key and preserves results") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (if (i % 10 == 0) 1L else 2L, i.toLong))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", saltBuckets = 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("name").count().orderBy("name").collect().toSeq
      == plain.groupBy("name").count().orderBy("name").collect().toSeq)
  }

  test("salted aggregation decomposes count/sum correctly") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i % 4 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val salted = graft.ops.Skew.saltedAggregate(df, col("k"), 8,
      partial = Seq(count(lit(1)).as("c"), sum(col("v")).as("s")),
      finalAgg = Seq(sum(col("c")).as("cnt"), round(sum(col("s")), 2).as("total")),
      keyName = "k")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), round(sum(col("v")), 2).as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("brute-force top-k is ordered by descending similarity") {
    val rows = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getDouble(1))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }
}
