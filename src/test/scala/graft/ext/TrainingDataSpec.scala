package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TrainingDataSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("repetitionStats: dup-token and top-bigram fractions") {
    val df = Seq((1L, "a a b"), (2L, "x x x x"), (3L, "q")).toDF("doc_id", "text")
    val got = Quality.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // "a a b": 3 tokens, 2 distinct -> dup 1/3; bigrams {a a, a b} -> top 1/2
    assert(got(0) == ((1L, 3L, BigDecimal(1.0 / 3).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5)))
    // "x x x x": dup 3/4; bigram "x x" 3 of 3
    assert(got(1) == ((2L, 4L, 0.75, 1.0)))
    // single token: no bigram -> 0.0
    assert(got(2) == ((3L, 1L, 0.0, 0.0)))
  }

  test("ngramOverlap counts distinct shared n-grams, broadcast side") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox"
      (2L, "totally different words here"),
      (3L, "the quick brown the quick brown")) // repeated shingle counts once
      .toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox")).toDF("doc_id", "text")
    val got = Decontaminate.ngramOverlap(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 2L), (3L, 1L)))
  }

  test("hashSplit covers every row, deterministically, near the fractions") {
    val df = (0L until 2000L).toDF("doc_id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val a = Mixing.hashSplit(df, "doc_id", "s", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.values.sum == 2000L)
    assert(a("train") > 1700 && a("val") > 50 && a("test") > 50)
    // same salt -> identical assignment; different salt -> different
    val row7a = Mixing.hashSplit(df, "doc_id", "s", splits)
      .filter(col("doc_id") === 7).head().getString(1)
    val row7b = Mixing.hashSplit(df, "doc_id", "s", splits)
      .filter(col("doc_id") === 7).head().getString(1)
    assert(row7a == row7b)
  }

  test("weightedSample keeps deterministic per-group subsets") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val kept = Mixing.weightedSample(df, "doc_id", "lang",
      Map("en" -> 0.8), defaultWeight = 0.1, salt = "w")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en kept at ~80% of 500, zh at ~10% of 500
    assert(kept("en") > 350 && kept("en") < 450)
    assert(kept.getOrElse("zh", 0L) < 100)
    val k1 = Mixing.weightedSample(df, "doc_id", "lang", Map("en" -> 0.8), 0.1, "w")
      .agg(sum("doc_id")).head().getLong(0)
    val k2 = Mixing.weightedSample(df, "doc_id", "lang", Map("en" -> 0.8), 0.1, "w")
      .agg(sum("doc_id")).head().getLong(0)
    assert(k1 == k2)
  }

  test("weightedSampleExact draws exactly k, weight-proportionally, reproducibly") {
    val df = (0L until 4000L)
      .map(i => (i, if (i < 200) 50.0 else 1.0)) // 200 heavy rows at 50x
      .toDF("doc_id", "w")
    val s1 = Mixing.weightedSampleExact(df, "doc_id", "w", k = 400, salt = "e1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size === 400)
    // same salt → identical draw; new salt → a different one
    val s1b = Mixing.weightedSampleExact(df, "doc_id", "w", 400, "e1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1b === s1)
    val s2 = Mixing.weightedSampleExact(df, "doc_id", "w", 400, "e2")
      .select("doc_id").as[Long].collect().toSet
    assert(s2 !== s1)
    // 50x-weighted rows must be drastically over-represented vs their
    // 5% population share (expected inclusion near-certain at this k)
    val heavy = s1.count(_ < 200L)
    assert(heavy > 150, s"expected heavy rows to dominate, got $heavy/200")
    // zero/negative/null weights never qualify
    import org.apache.spark.sql.functions.lit
    val withZero = df.withColumn("w",
      org.apache.spark.sql.functions.when(col("doc_id") < 3900L, lit(0.0))
        .otherwise(col("w")))
    val z = Mixing.weightedSampleExact(withZero, "doc_id", "w", 400, "e1")
      .select("doc_id").as[Long].collect()
    assert(z.length === 100 && z.forall(_ >= 3900L))
  }

  test("weightedSampleExact large-k distributed path matches TakeOrdered") {
    // k = 25% of corpus, cutover forced below k: the threshold-selection
    // path (ops.OrderStat) must reproduce the TakeOrdered draw EXACTLY —
    // same salt, same k, membership decided by the same (key desc, id)
    // global order regardless of which physical path ran
    val df = (0L until 4000L)
      .map(i => (i, 1.0 + (i % 7).toDouble))
      .toDF("doc_id", "w").repartition(17)
    val small = Mixing.weightedSampleExact(df, "doc_id", "w", 1000, "e3")
      .select("doc_id").as[Long].collect().toSet
    val dist = Mixing.weightedSampleExact(df, "doc_id", "w", 1000, "e3",
        cutover = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(small.size === 1000)
    assert(dist === small)
  }

  test("bm25TopK matches a hand-computed score and ranks by term density") {
    val docs = Seq(
      (1L, "data data data pad pad pad pad pad"),
      (2L, "data pad pad pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val got = Ranking.bm25TopK(docs, "doc_id", "text", Seq("data"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // only docs containing the term appear; higher tf ranks first
    assert(got.map(_._1) == List(1L, 2L))
    // hand computation: N=3, df=2, avgdl=8, dl=8 -> len norm = 1
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double) = idf * tf * 2.2 / (tf + 1.2)
    assert(math.abs(got(0)._2 - s(3.0)) < 1e-6)
    assert(math.abs(got(1)._2 - s(1.0)) < 1e-6)
  }

  test("redactPii replaces emails, SSNs, and phone numbers only") {
    val df = Seq(
      (1L, "mail a.b-c_d@ex-ample.co.uk now"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 end"),
      (3L, "clean text 1234 stays 12-34")).toDF("id", "t")
    val got = df.select(TextAnalysis.redactPii(col("t"))).as[String]
      .collect().toList
    assert(got == List(
      "mail [EMAIL] now",
      "ssn [SSN] phone [PHONE] end",
      "clean text 1234 stays 12-34"))
  }

  test("pqAssign picks the argmin subvector centroid; pqCodes are ordered") {
    import spark.implicits._
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 codebooks (ids 0, 1).
    // id 2 matches seed 0 in subspace 0 and seed 1 in subspace 1; id 3
    // is equidistant in subspace 0 -> tie breaks to code 0.
    val emb = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(4.0, 4.0, 20.0, 20.0)),
      (2L, Seq(1.0, 1.0, 19.0, 19.0)),
      (3L, Seq(2.0, 2.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val asg = Quantize.pqAssign(emb, "vec_id", "embedding", m = 2, k = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    assert(asg((2L, 0)) == 0 && asg((2L, 1)) == 1)
    assert(asg((3L, 0)) == 0) // tie -> lowest index
    assert(asg((3L, 1)) == 0) // (0,0) is nearer to seed0's (10,10)? no:
    // dist to seed0 (10,10) = 200, seed1 (20,20) = 800 -> code 0
    // seeds code their own subvectors
    assert(asg((0L, 0)) == 0 && asg((0L, 1)) == 0)
    assert(asg((1L, 0)) == 1 && asg((1L, 1)) == 1)
    val codes = Quantize.pqCodes(emb, "vec_id", "embedding", 2, 2)
      .orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Int]]("codes").toList).toList
    assert(codes == List(List(0, 0), List(1, 1), List(0, 1), List(0, 0)))
    // dimension must divide into m
    intercept[IllegalArgumentException] {
      Quantize.pqAssign(emb, "vec_id", "embedding", m = 3, k = 2)
    }
  }

  test("pqTopK ADC ranks same-codebook-cell vectors first") {
    import spark.implicits._
    // two clear clusters (seeds 0 and 1); 2, 4 sit in seed 0's cells,
    // 3, 5 in seed 1's. Query 4 (coded like seed 0) must rank the
    // cell-mates 0 and 2 above 1, 3, 5 — their ADC is the query-to-
    // centroid distance, identical for every vector in the cell.
    val emb = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(4.0, 4.0, 20.0, 20.0)),
      (2L, Seq(0.2, 0.0, 10.0, 10.1)),
      (3L, Seq(4.1, 4.0, 20.2, 20.0)),
      (4L, Seq(0.1, 0.1, 10.1, 10.0)),
      (5L, Seq(3.9, 4.0, 19.9, 20.0))).toDF("vec_id", "embedding")
    val top = Quantize.pqTopK(emb, "vec_id", "embedding", m = 2, k = 2,
      queryId = 4L, topK = 5)
    val rows = top.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 5)
    // ascending adc, non-negative
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.forall(_._2 >= 0.0))
    // cell-mates first (ids 0 and 2 share the query's codes -> equal,
    // minimal adc; tie broken by id)
    assert(rows.take(2).map(_._1).toSeq == Seq(0L, 2L))
    assert(rows(0)._2 == rows(1)._2)
    assert(rows.drop(2).map(_._1).toSet == Set(1L, 3L, 5L))
  }

  test("int8 quantization: codes in range, zero vectors safe, mse small") {
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25)),
      (2L, Seq(0.0, 0.0, 0.0)),
      (3L, Seq(2.54))).toDF("vec_id", "v")
    val v = col("v")
    val got = df.select(col("vec_id"), Quantize.int8Scale(v).as("s"),
        Quantize.int8Codes(v).as("q"), Quantize.int8Mse(v).as("mse"))
      .orderBy("vec_id").collect()
    // scale = 1.0/127; codes round(x*127): (64, -127, 32)
    assert(got(0).getSeq[Int](2) == Seq(64, -127, 32))
    // zero vector: scale 0, all-zero codes, zero error
    assert(got(1).getDouble(1) == 0.0)
    assert(got(1).getSeq[Int](2) == Seq(0, 0, 0))
    assert(got(1).getDouble(3) == 0.0)
    // single element: exact reconstruction (q = 127 exactly)
    assert(got(2).getSeq[Int](2) == Seq(127))
    assert(got(2).getDouble(3) < 1e-24)
    assert(got(0).getDouble(3) > 0 && got(0).getDouble(3) < 1e-4)
  }

  test("incremental minhash index finds a near-dup in a new batch") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashBands(corpus, "doc_id", "text")
    // a light edit of doc 10 plus an unrelated doc
    val batch = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (101L, "completely unrelated fresh words appear in this document now"))
      .toDF("doc_id", "text")
    val hits = Dedup.minhashCandidatesAgainst(batch, index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((100L, 10L)), s"missing near-dup candidate: $hits")
    assert(!hits.exists(_._1 == 101L), s"false candidate for unrelated doc: $hits")
  }

  test("quantizeStats scalar pass equals the expression forms exactly") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(100)
    val v = col("embedding").cast("array<double>")
    val viaExpr = emb.select(col("vec_id"), Quantize.int8Scale(v).as("scale"),
        aggregate(Quantize.int8Codes(v), lit(0L),
          (a, x) => a + x.cast("long")).as("q_sum"),
        Quantize.int8Mse(v).as("mse"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val viaScalar = Quantize.quantizeStats(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(viaExpr == viaScalar)
  }

  test("expression simhash60 equals the scalar path over md5-60 tokens") {
    val texts = Seq((1L, "alpha beta gamma delta"), (2L, "one two"), (3L, "x"))
    val viaExpr = texts.toDF("id", "t")
      .select(col("id"), Dedup.simhash60(
        transform(split(col("t"), " ", -1), Dedup.md5Hash60Col(_))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScalar = texts.map { case (id, t) =>
      id -> Dedup.simhash60Scalar(t.split(" ", -1))
    }.toMap
    assert(viaExpr == viaScalar)
  }

  test("repeatedNgramSpans merges adjacent shared grams into maximal spans") {
    // docs 1 and 2 share tokens 0..5 ("a b c d e f") and again 8..11
    // ("x y z w"); with n=3 the shared 3-grams at positions 0..3 merge
    // into span [0,6), and positions 8..9 merge into [8,12)
    val docs = Seq(
      (1L, "a b c d e f q1 q2 x y z w"),
      (2L, "a b c d e f r1 r2 x y z w"),
      (3L, "totally different words here nothing shared at all now ok fine"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedNgramSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      (1L, 0L, 6L), (1L, 8L, 12L),
      (2L, 0L, 6L), (2L, 8L, 12L)))
  }

  test("repeatedNgramSpans merges OVERLAPPING windows into disjoint spans") {
    // doc 1's qualifying positions are {0, 2} (position 1's gram "b c d"
    // is shared with no one): windows [0,3) and [2,5) overlap, so the
    // output is ONE span [0,5) — disjoint intervals are the contract a
    // sequential cut pass relies on. NULL text must contribute nothing.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c"), (3L, "c d e"), (4L, null))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedNgramSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 0L, 5L), (2L, 0L, 3L), (3L, 0L, 3L)))
  }

  test("bigram LM self-logprob: frequent sequences outscore rare ones") {
    // "a b" appears in 3 docs, "x y" once; doc 4 is pure token soup
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b"),
      (4L, "q w e r t z")).toDF("doc_id", "text")
    val got = LangModel.bigramSelfLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(_._1) == List(1L, 2L, 3L, 4L))
    assert(got.map(_._2) == List(5L, 3L, 1L, 5L))
    // the boilerplate docs outscore the token soup
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(1L) > byId(4L) && byId(3L) > byId(4L))
    // hand-check doc 3: one bigram "a b", C2=6 across docs 1-3,
    // C1("a")=6, V=8 -> ln(7/14)
    assert(math.abs(byId(3L) -
      BigDecimal(math.log(7.0 / 14.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("l2Normalize yields unit vectors, passes zero vectors through") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(0.0, 0.0))).toDF("id", "v")
    val got = df.withColumn("nrm", Similarity.l2Norm(col("v")))
      .select(col("id"), Similarity.l2Normalize(col("v"), col("nrm")).as("u"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(got(1).getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("gopherFilter applies every rule and combines the verdict") {
    val rules = Quality.GopherRules(minTokens = 3, maxTokens = 6,
      minMeanWordLen = 2.0, maxMeanWordLen = 5.0, maxSymbolFrac = 0.25,
      minStopwords = 1, maxDupFrac = 0.5)
    val df = Seq(
      (1L, "the cat sat on mat"),   // passes everything
      (2L, "xx yy"),                // too few tokens, no stopword
      (3L, "the the the the"),      // dup_frac 0.75 > 0.5
      (4L, "the c@t s@t %% !!")     // symbol_frac 4/5 > 0.25
    ).toDF("doc_id", "text")
    val got = Quality.gopherFilter(df, "doc_id", "text", rules)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    val row1 = Quality.gopherFilter(df, "doc_id", "text", rules)
      .filter(col("doc_id") === 1).head()
    assert(row1.getLong(1) == 5L)                  // n_tokens
    assert(row1.getDouble(2) == (18 - 4).toDouble / 5) // mean_wl
    assert(row1.getDouble(3) == 0.0)               // symbol_frac
    assert(row1.getLong(4) == 1L)                  // n_stop ("the")
  }

  test("unigramEntropy matches hand-computed values") {
    val df = Seq(
      (1L, "a a a a"),     // one token type -> H = 0
      (2L, "a b a b"),     // two at p=0.5 -> H = ln 2
      (3L, "a b c d")      // uniform over 4 -> H = ln 4
    ).toDF("doc_id", "text")
    val got = Quality.unigramEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 4L, 1L, 0.0)))
    assert(got(1) == ((2L, 4L, 2L, r6(math.log(2)))))
    assert(got(2) == ((3L, 4L, 4L, r6(math.log(4)))))
  }

  test("gopherFilter counts code points, not UTF-16 units") {
    // the emoji is one code point but two UTF-16 units; SQL length()
    // counts code points, so mean_wl must too
    val df = Seq((1L, "ab 😀")).toDF("doc_id", "text")
    val row = Quality.gopherFilter(df, "doc_id", "text").head()
    assert(row.getLong(1) == 2L)          // "ab", emoji
    assert(row.getDouble(2) == 1.5)       // (4 code points - 1 sep) / 2
  }

  test("tokenBudgetSample keeps a prefix of the hash order per group") {
    val df = (0L until 100L).map(i => (i, if (i < 50) "a" else "b", 10L))
      .toDF("doc_id", "source", "tok")
    val kept = Mixing.tokenBudgetSample(df, "doc_id", "source", "tok",
      budgetTokens = 200, salt = "t")
    // 10 tokens/doc, 200 budget -> exactly 20 docs per group
    val byGroup = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("a" -> 20L, "b" -> 20L))
    // cum_tokens really is the running total within the group
    assert(kept.groupBy("source").agg(max("cum_tokens")).collect()
      .forall(_.getLong(1) == 200L))
    // deterministic across runs
    val k2 = Mixing.tokenBudgetSample(df, "doc_id", "source", "tok", 200, "t")
      .agg(sum("doc_id")).head().getLong(0)
    assert(kept.agg(sum("doc_id")).head().getLong(0) == k2)
  }

  test("tfidfTopTerms: rare terms outrank common ones, k bounds per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana cherry common common"),
      (3L, "common cherry date")).toDF("doc_id", "text")
    val top = Ranking.tfidfTopTerms(docs, "doc_id", "text", k = 2)
    val rows = top.orderBy(col("doc_id"), col("score").desc, col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    // doc 1: apple (tf=2, df=1) beats common (tf=3, df=3) and banana
    assert(rows.take(2).map(_._2) == List("apple", "common"))
    // every doc contributes at most k rows
    val perDoc = top.groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(perDoc.forall(_ <= 2))
    // df really is the document frequency, not a row count
    val dfMap = top.select("term", "df").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap.get("common").contains(3L))
    assert(dfMap.get("apple").contains(1L))
  }

  test("LM logprob: broadcast and distributed paths are bit-identical") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = LangModel.bigramSelfLogProb(docs, "doc_id", "text")
    // broadcastMaxEntries = 0 forces the window path
    val dist = LangModel.bigramSelfLogProb(docs, "doc_id", "text", 0L)
    assert(fast.count() > 0)
    assert(fast.exceptAll(dist).isEmpty && dist.exceptAll(fast).isEmpty)
  }

  test("LM logprob cutover fallthrough (checkpointed-counts join) agrees") {
    import spark.implicits._
    // vocab {a,b,c} = 3 entries; distinct bigrams = 4. maxEntries = 5
    // lands BETWEEN them: vocab fits, vocab+bigrams does not -> the
    // materialized-counts JOIN branch (neither broadcast nor window)
    val docs = Seq((1L, "a b a b c"), (2L, "b c b a")).toDF("doc_id", "text")
    val joinPath = LangModel.bigramSelfLogProb(docs, "doc_id", "text", 5L)
    val bcastPath = LangModel.bigramSelfLogProb(docs, "doc_id", "text")
    val windowPath = LangModel.bigramSelfLogProb(docs, "doc_id", "text", 0L)
    assert(joinPath.count() == 2)
    assert(joinPath.exceptAll(bcastPath).isEmpty &&
      bcastPath.exceptAll(joinPath).isEmpty)
    assert(joinPath.exceptAll(windowPath).isEmpty &&
      windowPath.exceptAll(joinPath).isEmpty)
  }

  test("quantileBuckets: equal bands, null scores pass through as null") {
    import spark.implicits._
    val df = (1 to 8).map(i => (i.toLong, Some(i.toDouble))) :+ (9L, None)
    val scored = df.toDF("doc_id", "score")
    val got = Mixing.quantileBuckets(scored, col("score"), 4, "qb")
      .orderBy("doc_id").collect()
      .map(r => if (r.isNullAt(2)) -1 else r.getInt(2)).toList
    // thresholds 2.75 / 4.5 / 6.25 -> two docs per band; null -> null
    assert(got == List(0, 0, 1, 1, 2, 2, 3, 3, -1))
    intercept[IllegalArgumentException] {
      Mixing.quantileBuckets(scored, col("score"), 1, "qb")
    }
  }

  test("tfidf shuffled-join cutover returns identical results") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana cherry common common"),
      (3L, "common cherry date")).toDF("doc_id", "text")
    val bcast = Ranking.tfidfTopTerms(docs, "doc_id", "text", 2)
    // broadcastMaxTerms = 0 forces the shuffled df join
    val shuffled = Ranking.tfidfTopTerms(docs, "doc_id", "text", 2, 0L)
    assert(bcast.exceptAll(shuffled).isEmpty &&
      shuffled.exceptAll(bcast).isEmpty)
  }

  test("temperatureWeights: alpha=1 is natural, alpha<1 flattens") {
    import spark.implicits._
    // 90/10 token split between two sources
    val df = Seq(("big", 900L), ("big", 8100L), ("small", 1000L))
      .toDF("source", "tok")
    val nat = Mixing.temperatureWeights(df, "source", "tok", alpha = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(nat("big")._1 == 9000L && nat("small")._1 == 1000L)
    assert(nat("big")._2 == 0.9 && nat("small")._2 == 0.1)
    // natural: w == p
    assert(nat("big")._3 == 0.9 && nat("small")._3 == 0.1)
    val cool = Mixing.temperatureWeights(df, "source", "tok", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // sqrt flattening: 3:1 instead of 9:1
    assert(cool("big") == 0.75 && cool("small") == 0.25)
    // weights always sum to ~1
    assert(math.abs(cool.values.sum - 1.0) < 1e-9)
  }

  test("exactStratifiedSplit realises the exact quota in every stratum") {
    import spark.implicits._
    // deliberately unbalanced strata: 100, 37, 3 rows
    val df = ((0L until 100L).map((_, "a")) ++ (100L until 137L).map((_, "b"))
      ++ (137L until 140L).map((_, "c"))).toDF("doc_id", "source")
    val split = Mixing.exactStratifiedSplit(df, "doc_id", "source", "s", 0.2)
    val head = split.filter(col("split") === "holdout")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // round(0.2 * n): 20, round(7.4)=7, round(0.6)=1
    assert(head == Map("a" -> 20L, "b" -> 7L, "c" -> 1L))
    // total coverage, no overlap
    assert(split.count() == 140L)
    // deterministic: same salt -> identical membership
    val again = Mixing.exactStratifiedSplit(df, "doc_id", "source", "s", 0.2)
    assert(split.exceptAll(again).isEmpty)
    // frac=0 and frac=1 degenerate cleanly
    assert(Mixing.exactStratifiedSplit(df, "doc_id", "source", "s", 0.0)
      .filter(col("split") === "holdout").count() == 0L)
    assert(Mixing.exactStratifiedSplit(df, "doc_id", "source", "s", 1.0)
      .filter(col("split") === "train").count() == 0L)
  }

  test("keepCanonical keeps the best-scored doc per cluster") {
    import spark.implicits._
    // docs 1..6; cluster {1,2,3} (rep 1), {4,5} (rep 4); 6 unclustered
    val docs = Seq((1L, 10.0), (2L, 30.0), (3L, 30.0), (4L, 5.0),
      (5L, 1.0), (6L, 7.0)).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_rep")
    val got = Dedup.keepCanonical(docs, clusters, "doc_id", col("score"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .toList
    assert(got == List(
      (1L, 1L, false), (2L, 1L, true),  // score tie 2 vs 3 -> lowest id
      (3L, 1L, false), (4L, 4L, true),
      (5L, 4L, false), (6L, 6L, true))) // unclustered = own canonical
    // exactly one canonical per cluster
    val perCluster = Dedup.keepCanonical(docs, clusters, "doc_id",
        col("score")).filter(col("is_canonical"))
      .groupBy("cluster_rep").count().collect().map(_.getLong(1)).toSet
    assert(perCluster == Set(1L))
  }

  test("rrfFuse: hand-computable fusion, missing-side zero, batch windows") {
    // list A ranks ids 1,2,3; list B ranks 2,1 — id 2: 1/61 + 1/62,
    // id 1: 1/62 + 1/61 (tie with 2 -> id order), id 3: A-only 1/63
    val a = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s")
    val b = Seq((2L, 9.0), (1L, 8.0)).toDF("id", "s")
    val got = Ranking.rrfFuse(Seq(a, b), "id", "s", topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val both = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val only3 = BigDecimal(1.0 / 63)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == List((1L, both), (2L, both), (3L, only3)))

    // batch path: fusion and top-k are per query, never cross-query
    val qa = Seq((10L, 1L, 2.0), (10L, 2L, 1.0), (20L, 1L, 5.0))
      .toDF("q", "id", "s")
    val qb = Seq((10L, 1L, 7.0), (20L, 3L, 1.0)).toDF("q", "id", "s")
    val batch = Ranking.rrfFuse(Seq(qa, qb), "id", "s",
        queryCols = Seq("q"), topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(batch == List((10L, 1L), (20L, 1L)),
      "per-query winners: id 1 leads both lists of q=10 and ranks first in q=20's A list")

    // internal/output name collisions are rejected up front, not as an
    // ambiguous-reference AnalysisException deep in the plan
    val c = Seq((1L, 1.0)).toDF("_rrf_s", "x")
    intercept[IllegalArgumentException] {
      Ranking.rrfFuse(Seq(c, c), "_rrf_s", "x")
    }
  }

  test("epochPlan/repeatToBudget: recipe arithmetic + refusal paths (r19)") {
    import spark.implicits._
    // group a: 100 tokens total, b: 400 — budget 600 at weights .5/.5
    // gives a 3 full epochs + 0 partial, b 0 full + 0.75 partial
    val docs = ((1L to 10L).map(i => (i, "a", 10L)) ++
      (11L to 20L).map(i => (i, "b", 40L))).toDF("id", "g", "tok")
    val plan = Mixing.epochPlan(docs, "g", "tok",
        Seq("a" -> 0.5, "b" -> 0.5), 600L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(plan("a") == ((100L, 300L, 3L, 0.0)))
    assert(plan("b") == ((400L, 300L, 0L, 0.75)))
    val out = Mixing.repeatToBudget(docs, "id", "g", "tok",
      Seq("a" -> 0.5, "b" -> 0.5), 600L, salt = "t")
    // every a-doc appears exactly 3 times, epochs 0..2; b-docs appear
    // 0 or 1 times in epoch 0, ~75% of them, deterministically
    val byId = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 10L).forall(byId(_) == 3L))
    val bCount = (11L to 20L).map(byId.getOrElse(_, 0L))
    assert(bCount.forall(n => n == 0L || n == 1L))
    assert(out.filter($"g" === "a").select("epoch").distinct()
      .as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // determinism: same salt, same repetition set
    val again = Mixing.repeatToBudget(docs, "id", "g", "tok",
      Seq("a" -> 0.5, "b" -> 0.5), 600L, salt = "t")
    assert(again.collect().toSet == out.collect().toSet)
    // a weight naming a group absent from the corpus refuses loudly
    val e = intercept[IllegalArgumentException] {
      Mixing.epochPlan(docs, "g", "tok", Seq("a" -> 1.0, "zz" -> 1.0), 10L)
    }
    assert(e.getMessage.contains("zz"))
    // clobber guard on the epoch column
    intercept[IllegalArgumentException] {
      Mixing.repeatToBudget(docs.withColumn("epoch", lit(1)),
        "id", "g", "tok", Seq("a" -> 1.0, "b" -> 1.0), 10L, "t")
    }
    // weight-0 groups emit nothing; the other group still plans
    val zeroed = Mixing.repeatToBudget(docs, "id", "g", "tok",
      Seq("a" -> 1.0, "b" -> 0.0), 200L, "t")
    assert(zeroed.filter($"g" === "b").count() == 0L)
    assert(zeroed.filter($"g" === "a").count() == 20L) // 2 full epochs
  }
}
