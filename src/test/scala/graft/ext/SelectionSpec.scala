package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-4 selection operators: DSIR importance resampling, hashed linear
  * classifier inference, Bloom-prefiltered subtraction, vocabulary
  * coverage, per-group KL divergence, per-group caps.
  */
class SelectionSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "physics atoms energy quantum", "target"),
    (2L, "physics energy fields quantum", "target"),
    (3L, "cats dogs pets animals", "raw"),
    (4L, "physics quantum energy atoms", "raw"),
    (5L, "dogs cats animals pets", "raw")
  ).toDF("doc_id", "text", "kind")

  test("dsir: target-like raw documents outweigh off-domain ones") {
    val w = Importance.dsirLogWeights(corpus, "doc_id", "text",
      col("kind") === "target")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // only raw docs are scored
    assert(w.keySet == Set(3L, 4L, 5L))
    // doc 4 shares every token with the target; docs 3/5 share none
    assert(w(4L) > w(3L) && w(4L) > w(5L))
    // identical bags of words -> identical weights (order-independent fold)
    assert(w(3L) == w(5L))
  }

  test("dsir: scoreLogWeights reuses a learned model across frames") {
    val model = Importance.learnDsir(corpus, "text", col("kind") === "target")
    val fresh = Seq((10L, "quantum energy"), (11L, "pets pets"))
      .toDF("doc_id", "text")
    val w = Importance.scoreLogWeights(fresh, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > 0.0 && w(11L) < 0.0)
  }

  test("dsirSelect returns k highest-weight raw docs, ties to low id") {
    val top = Importance.dsirSelect(corpus, "doc_id", "text",
      col("kind") === "target", k = 1).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("linearScore: zero-shuffle plan, sigmoid bounds, keep threshold") {
    val weights = Array.tabulate(16)(b => if (b % 2 == 0) 1.0 else -1.0)
    val scored = Importance.linearScore(corpus, "doc_id", "text",
      weights, bias = 0.0, salt = "t")
    // model inference must be a map-only pass: no Exchange in the plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    val rows = scored.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val prob = r.getDouble(3)
      assert(prob > 0.0 && prob < 1.0)
      assert(r.getBoolean(4) == (prob >= 0.5))
    }
  }

  test("bloomSubtract equals the exact anti-join even at fpp 0.5") {
    val df = (1L to 200L).map(i => (i, s"d$i")).toDF("id", "payload")
    val exclude = (1L to 200L by 3).map(Tuple1(_)).toDF("k")
    // fpp 0.5 forces plenty of false positives through the maybe branch
    val got = Dedup.bloomSubtract(df, "id", exclude, "k", fpp = 0.5)
      .select("id").as[Long].collect().sorted
    val want = df.join(exclude, col("id") === col("k"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("bloomSubtract probes via the codegen expression, not a UDF") {
    // parquet-backed input: a Seq-based LocalRelation would be constant-
    // folded through the filter at optimization time, hiding the probe
    val dir = tmpDir("bloom-plan")
    (1L to 500L).map(i => (i, s"d$i")).toDF("id", "payload")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val exclude = (1L to 500L by 5).map(Tuple1(_)).toDF("k")
    val plan = Dedup.bloomSubtract(df, "id", exclude, "k")
      .queryExecution.executedPlan.toString
    // on a GraftExtensions session the probe is Spark's native
    // BloomFilterMightContain (plan shows its prettyName) and no Scala
    // UDF appears anywhere in the filter stages
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("bloomSubtract: empty exclude returns the non-null-key input") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("id", "payload")
    val got = Dedup.bloomSubtract(df, "id",
      spark.emptyDataFrame.withColumn("k", lit(null).cast("long")), "k")
    assert(got.select("id").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("oovStats: full vocabulary covers everything, missing tokens count") {
    val docs = Seq((1L, "a b c"), (2L, "a z z")).toDF("doc_id", "text")
    val vocabAll = Bpe.learnVocab(docs, "text", vocabSize = 100)
    assert(Bpe.oovStats(docs, "doc_id", "text", vocabAll)
      .agg(sum("n_oov")).as[Long].head() == 0L)
    val got = Bpe.oovStats(docs, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    assert(got == List((1L, 1L), (2L, 2L)))
  }

  test("learnVocab breaks frequency ties by token order") {
    val docs = Seq((1L, "b a b a c")).toDF("doc_id", "text")
    assert(Bpe.learnVocab(docs, "text", 2) == Seq("a", "b"))
  }

  test("groupKlDivergence: identical groups diverge zero, skew positive") {
    val even = Seq(("g1", "x y"), ("g2", "x y")).toDF("src", "text")
    val kl0 = LangModel.groupKlDivergence(even, "src", "text")
      .select("kl").as[Double].collect()
    assert(kl0.forall(_ == 0.0))
    val skew = Seq(("g1", "x x x x"), ("g2", "y y y y")).toDF("src", "text")
    val kl = LangModel.groupKlDivergence(skew, "src", "text")
      .select("kl").as[Double].collect()
    assert(kl.forall(_ > 0.0))
  }

  test("dropRepeatedBlocks keeps first occurrence corpus-wide, rewrites text") {
    val docs = Seq(
      (1L, "a b c d"),   // both blocks first
      (2L, "a b c d"),   // full duplicate -> empty rewrite
      (3L, "a b x y")    // "a b" seen in doc 1, "x y" survives
    ).toDF("doc_id", "text")
    val got = Dedup.dropRepeatedBlocks(docs, "doc_id", "text", blockTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toList
    assert(got == List(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, "x y")))
  }

  test("zorderKey2: known interleave, column/scalar parity, clustered write") {
    import graft.ops.Layout
    // a=3 (bits 0,1), b=5 (bits 0,2): 1 + 4 + 2 + 32 = 39
    assert(Layout.zorderKey2Scalar(3L, 5L, 3) == 39L)
    val df = spark.range(64).select(
      (col("id") % 8).as("a"), floor(col("id") / 8).cast("long").as("b"))
    val pairs = df.select(col("a"), col("b"),
      Layout.zorderKey2(col("a"), col("b"), 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, z) =>
      assert(z == Layout.zorderKey2Scalar(a, b, 3))
    }
    // the 3-bit key is a bijection on the 8x8 grid
    assert(pairs.map(_._3).distinct.length == 64)
    val out = tmpDir("zorder")
    Layout.writeZClustered(df, out, col("a"), col("b"), bits = 3, numFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 64 && back.columns.toSet == Set("a", "b"))
  }

  test("histogram: under/overflow bins, empty bins present, edges correct") {
    val df = Seq(-5.0, 0.0, 1.0, 9.9, 25.0, 100.0, 42.0).toDF("x")
    val got = Stats.histogram(df, col("x"), lo = 0.0, hi = 50.0, nBins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getLong(3))).toList
    assert(got == List(
      (-1, None, 1L),          // -5
      (0, Some(0.0), 3L),      // 0, 1, 9.9
      (1, Some(10.0), 0L),     // empty bin still present
      (2, Some(20.0), 1L),     // 25
      (3, Some(30.0), 0L),
      (4, Some(40.0), 1L),     // 42
      (5, None, 1L)))          // 100 overflow
  }

  test("histogram routes NaN into the overflow bin; counts stay complete") {
    val df = Seq(1.0, Double.NaN, 25.0, Double.NaN, 60.0).toDF("x")
    val got = Stats.histogram(df, col("x"), lo = 0.0, hi = 50.0, nBins = 5)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(3))).toList
    // the two NaNs join the 60.0 overflow; bin counts sum to all 5 rows
    assert(got.map(_._2).sum == 5L)
    assert(got.find(_._1 == 5).map(_._2).contains(3L))
  }

  test("zscore rejects non-integral value columns instead of truncating") {
    val dbl = Seq(1.5, 2.5).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Stats.zscore(dbl, col("v"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("ngramNovelty: shared shingles score low, originals high") {
    val docs = Seq(
      (1L, "a b c d e"),   // shingles {abc bcd cde}
      (2L, "a b c x y"),   // shares "a b c" with doc 1
      (3L, "p q")          // too short: absent
    ).toDF("doc_id", "text")
    val got = Quality.ngramNovelty(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc 1: 3 shingles, 2 novel; doc 2: 3 shingles, 2 novel
    assert(got == List((1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("zscore: exact integer moments, null value keeps null z") {
    val df = Seq(Some(10L), Some(20L), Some(30L), None).toDF("v")
    val got = Stats.zscore(df, col("v")).orderBy("v").collect()
    // sd of {10,20,30} = 10; z = -1, 0, 1
    val zs = got.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    assert(zs.toList == List(-1.0, 0.0, 1.0))
    assert(got.count(_.isNullAt(1)) == 1)
    // degenerate: constant column -> sd 0 -> all z null
    val const = Seq(5L, 5L).toDF("v")
    assert(Stats.zscore(const, col("v")).collect().forall(_.isNullAt(1)))
  }

  test("snapshotDiff classifies ids; null and empty content differ") {
    import graft.ops.Diff
    val old = Seq((1L, Some("a"), "s"), (2L, Some("b"), "s"),
      (3L, Some("c"), "s"), (4L, None, "s")).toDF("id", "t", "src")
    val nw = Seq((2L, Some("b"), "s"), (3L, Some("C"), "s"),
      (4L, Some(""), "s"), (5L, Some("e"), "s")).toDF("id", "t", "src")
    val got = Diff.snapshotDiff(old, nw, "id", Seq("t", "src"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toList
    // id 4: null -> "" must register as changed, not unchanged
    assert(got == List((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "changed"), (5L, "added")))
  }

  test("property: block rewrite keeps exactly one copy of every distinct block") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c")
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(9))(vocab(rnd.nextInt(3))).mkString(" "))
    }.toDF("doc_id", "text")
    val B = 3
    val got = Dedup.dropRepeatedBlocks(docs, "doc_id", "text", blockTokens = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // corpus-wide: kept blocks are exactly the distinct blocks
    val allBlocks = docs.collect().flatMap(r =>
      r.getString(1).split(" ", -1).grouped(B).map(_.mkString(" ")))
    assert(got.map(_._3).sum == allBlocks.distinct.length)
    assert(got.map(_._2).sum == allBlocks.length)
    // per doc: text_clean is the in-order concat of a subset of its blocks,
    // and no kept block appears twice anywhere
    val keptAll = scala.collection.mutable.ArrayBuffer.empty[String]
    got.foreach { case (id, _, nKept, clean) =>
      val blocks = docs.filter(col("doc_id") === id).collect()(0)
        .getString(1).split(" ", -1).grouped(B).map(_.mkString(" ")).toSeq
      val cleanBlocks =
        if (clean.isEmpty) Seq.empty
        else {
          // reconstruct the kept blocks by walking the doc's own blocks
          var rest = clean
          blocks.filter { b =>
            val hit = rest == b || rest.startsWith(b + " ")
            if (hit) rest = rest.stripPrefix(b).stripPrefix(" ")
            hit
          }
        }
      assert(cleanBlocks.length == nKept, s"doc $id: $clean vs $blocks")
      keptAll ++= cleanBlocks
    }
    assert(keptAll.distinct.length == keptAll.length)
  }

  test("property: zorder key is a bijection and nests by quadrant") {
    import graft.ops.Layout
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong)).distinct
    val keys = pts.map { case (a, b) => Layout.zorderKey2Scalar(a, b, 10) }
    assert(keys.distinct.length == pts.length)
    pts.zip(keys).foreach { case ((a, b), z) =>
      // top two key bits are the high bits of b and a: quadrant nesting
      assert(((z >> 19) & 1L) == ((b >> 9) & 1L))
      assert(((z >> 18) & 1L) == ((a >> 9) & 1L))
    }
  }

  test("perGroupCap keeps at most cap per group, deterministically") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = Mixing.perGroupCap(df, "id", "grp", cap = 10L, salt = "s")
    val sizes = a.groupBy("grp").count().select("count").as[Long].collect()
    assert(sizes.forall(_ == 10L))
    val b = Mixing.perGroupCap(df, "id", "grp", cap = 10L, salt = "s")
    assert(a.select("id").as[Long].collect().sorted
      .sameElements(b.select("id").as[Long].collect().sorted))
    // a different salt selects a different (but equally sized) subset
    val c = Mixing.perGroupCap(df, "id", "grp", cap = 10L, salt = "other")
    assert(!a.select("id").as[Long].collect().sorted
      .sameElements(c.select("id").as[Long].collect().sorted))
  }
}
