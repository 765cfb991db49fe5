package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic corpus mixing: hash-based train/validation/test
  * splits and per-group weighted downsampling, the assignment machinery a
  * training-data pipeline uses to mix sources at target proportions.
  *
  * Everything is keyed on the md5-derived bucket of the document id (see
  * Dedup.md5Hash60Col) rather than rand(): assignments are reproducible
  * across runs, across engines (any SQL system re-derives them), and
  * stable under re-partitioning — rand()-based splits silently reshuffle
  * membership on every retry/replan, which is catastrophic for train/test
  * hygiene. Pure per-row expression work: no shuffle, no state.
  */
object Mixing {

  // shortest-repr HALF_UP — the exact semantics of Spark's and DuckDB's
  // round() on doubles (the parity-critical definition; keep ONE copy)
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // Spark resolves column names case-insensitively by default, so the
  // clobber guards must too
  private def hasColumn(df: org.apache.spark.sql.DataFrame,
                        name: String): Boolean =
    df.columns.exists(_.equalsIgnoreCase(name))

  /** Deterministic bucket in [0, 10000): md5 of (salt ++ id). */
  def hashBucket(id: Column, salt: String): Column =
    pmod(Dedup.md5Hash60Col(concat(lit(salt), id.cast("string"))), lit(10000L))

  /** Adds a `split` column assigning each row to the first split whose
    * cumulative fraction covers its bucket. Fractions must sum to <= 1;
    * any remainder falls into the last split.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions must sum to <= 1, got $splits")
    require(splits.forall(_._2 >= 0.0),
      s"split fractions must be non-negative, got $splits " +
        "(a negative fraction would make a silently-unreachable split)")
    require(!df.columns.exists(_.equalsIgnoreCase("split")),
      "hashSplit adds 'split'; rename the existing column " +
        "(same clobber guard as quantileBuckets/exactStratifiedSplit)")
    val bucket = hashBucket(col(idCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), els) =>
      when(bucket < math.round(hi * 10000).toInt, name).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Per-group deterministic downsample: keep a row when its bucket falls
    * under the group's weight (fraction in [0,1]). Groups absent from
    * `weights` use `defaultWeight`.
    */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     weights: Map[String, Double], defaultWeight: Double,
                     salt: String): DataFrame = {
    val bucket = hashBucket(col(idCol), salt)
    val threshold = weights.foldRight(
      lit(math.round(defaultWeight * 10000).toInt): Column) {
      case ((g, w), els) =>
        when(col(groupCol) === g, math.round(w * 10000).toInt).otherwise(els)
    }
    df.filter(bucket < threshold)
  }

  /** EXACT-size weighted sampling without replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    * draw exactly `k` rows with inclusion odds proportional to
    * `weightCol`, by ranking on the A-ES key u^(1/w) (u the row's
    * deterministic md5-derived uniform) and keeping the top k. The
    * Bernoulli [[weightedSample]] cannot hit an exact count; this is the
    * "pick exactly 10M docs, quality-weighted" selection a curated-crawl
    * budget actually specifies.
    *
    * Deterministic and engine-replayable: u = (md5-60bit(salt ++ id) + 1)
    * / 2^60 — the +1 happens in INTEGER space before the double cast (so
    * the value matches an oracle's `(BIGINT + 1) / 2^60` bit-for-bit;
    * adding 1.0 after the cast is absorbed by rounding for ~1/128 of
    * ids). Same salt, same sample, on any engine with md5 (the
    * engine-wide convention). New salt → a fresh independent draw.
    *
    * Scale shape: one zero-shuffle scalar pass computes keys; the global
    * top-k runs through [[graft.ops.OrderStat.topKByKeyDesc]] — Spark's
    * TakeOrdered for k <= `cutover` (per-partition heads + a driver merge
    * bounded by cutover×partitions rows), distributed threshold selection
    * above it (approx-quantile bracket + one exact boundary count + a
    * zero-shuffle filter), so "pick exactly 10M docs" never rides the
    * driver. Rows with null/non-positive weight never qualify (loud is
    * wrong here: a weight of zero legitimately means "never sample me").
    *
    * @return the k sampled rows (all input columns), plus `sample_key`
    */
  def weightedSampleExact(df: DataFrame, idCol: String, weightCol: String,
                          k: Int, salt: String,
                          cutover: Int = 65536): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!hasColumn(df, "sample_key"),
      "weightedSampleExact adds 'sample_key'; rename the existing column")
    val u = (graft.ext.Dedup.md5Hash60Col(
      concat(lit(salt), col(idCol).cast("string"))) + lit(1L))
      .cast("double") / math.pow(2.0, 60)
    val keyed = df
      .filter(col(idCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0.0)
      .withColumn("sample_key",
        pow(u, lit(1.0) / col(weightCol).cast("double")))
    graft.ops.OrderStat.topKByKeyDesc(keyed, "sample_key", idCol, k, cutover)
  }

  /** Deterministic global shuffle for training-order assignment: adds
    * `shuffle_pos`, the row's 0-based position in the corpus-wide order of
    * `md5(salt ++ id)` — a reproducible permutation (same salt → same
    * order on any engine; new salt → fresh epoch order) computed WITHOUT a
    * single-task global sort: GlobalOrder buckets on the hash's first two
    * hex chars (256 deterministic, uniform buckets) and ranks per bucket
    * (ops.GlobalOrder.rankByHexKey). The id tie-break makes the position
    * well-defined even under an md5 collision.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String): DataFrame =
    // null ids excluded (engine null-id convention): a null id has no md5
    // key, and NULLS FIRST/LAST ordering is engine-specific
    graft.ops.GlobalOrder.rankByHexKey(df.filter(col(idCol).isNotNull),
      md5(concat(lit(salt), col(idCol).cast("string"))),
      Seq(col(idCol)), "shuffle_pos")

  /** Token-budget mixture sampling: within each group (source/domain),
    * walk documents in deterministic md5-hash order and keep them while
    * the group's RUNNING token total stays within `budgetTokens` — the
    * standard way mixture weights expressed as token budgets ("x billion
    * tokens of source S") are realised. Hash order makes the kept subset a
    * uniform sample of the group, reproducible across runs and engines.
    *
    * One window per group (parallel across groups; a group is never
    * funnelled through the driver). Documents with more tokens than the
    * remaining budget are skipped only at the boundary — the first doc
    * whose cumulative total crosses the budget is dropped along with
    * everything after it in hash order (keep-while, not best-fit).
    *
    * @return input columns + (cum_tokens) for the kept rows
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
                        tokenCol: String, budgetTokens: Long,
                        salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(groupCol).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // null ids/token counts excluded (engine null-id convention): a null
    // token count would silently ride along at its predecessor's cum.
    // Negative counts excluded too — keep-while semantics require a
    // MONOTONE running sum (a negative count could dip a later document
    // back under budget, so the kept set would no longer be a prefix)
    // integral token counts only (same guard as Stats.zscore): the
    // running sum casts to long, and a fractional tokenCol would
    // silently truncate toward zero — budgets would never bind
    require(Seq("int", "bigint", "smallint", "tinyint")
      .contains(df.schema(tokenCol).dataType.simpleString),
      s"tokenCol '$tokenCol' must be an integral type, got " +
        s"${df.schema(tokenCol).dataType.simpleString} — round explicitly first")
    df.filter(col(idCol).isNotNull && col(tokenCol).isNotNull &&
        col(tokenCol) >= 0)
      .withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  /** Temperature-scaled mixture weights (Conneau & Lample 2019, mC4): the
    * sampling weight of group g is n_g^alpha / Σ_h n_h^alpha — alpha < 1
    * flattens the distribution (upsampling low-resource groups), alpha = 1
    * is natural proportions. This is the planning step that turns corpus
    * token counts into per-source sampling rates; feed the weights into
    * [[weightedSample]] or [[tokenBudgetSample]] budgets.
    *
    * Scale shape: ONE map-side-combined aggregate over the corpus
    * (group → token total); everything after operates on the group-count
    * frame (tens of rows), folded on the driver in ascending group order
    * so the double sum is deterministic and engine-reproducible (a
    * distributed agg(sum) over doubles adds in arrival order).
    *
    * @return (group, n_tokens, p, w): natural share p = n_g/N and
    *         temperature weight w, both rounded to 6 dp
    */
  def temperatureWeights(df: DataFrame, groupCol: String, tokenCol: String,
                         alpha: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    // alpha = 0.5 routes through sqrt (IEEE correctly rounded on every
    // engine); general pow is libm-dependent and may differ 1 ulp across
    // engines — oracle comparisons should prefer 0.5 or round coarser
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    // group rendered as string so any group type (int source ids, dates)
    // works — the output frame keys on the rendered value
    val totals = df
      .filter(col(groupCol).isNotNull && col(tokenCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .orderBy(groupCol)
      .as[(String, Long)].collect()
    val grand = totals.map(_._2).sum.toDouble
    val denom = totals.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + powA(n.toDouble)
    }
    val rows = totals.map { case (g, n) =>
      (g, n, r6(n / grand), r6(powA(n.toDouble) / denom))
    }.toSeq
    spark.createDataset(rows).toDF(groupCol, "n_tokens", "p", "w")
  }

  /** Quantile-bucketed curriculum assignment: each row's bucket is the
    * number of exact corpus quantile thresholds strictly below its score
    * — the standard construction for difficulty/quality curricula and
    * perplexity-stratified mixtures (bucket 0 = bottom band).
    *
    * Scale shape: the thresholds are ONE tiny driver row (Spark's exact
    * `percentile` aggregates per-distinct-value counts, never sorting
    * rows globally) and the assignment is a pure per-row expression —
    * no `ntile` window, which would funnel the corpus through a single
    * task for the global order. Thresholds are rounded to 6 dp and
    * scores to 9 dp before comparison, so band membership is
    * engine-reproducible (interpolated quantiles can differ in the last
    * ulps across engines). A null score yields a null bucket.
    *
    * @return input + (bucketName) in 0..nBuckets-1
    */
  def quantileBuckets(df: DataFrame, scoreCol: Column, nBuckets: Int,
                      bucketName: String): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    require(!hasColumn(df, bucketName),
      s"quantileBuckets adds '$bucketName'; rename the existing column")
    val sc = round(scoreCol, 9)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val thRow = df.select(
      call_function("percentile", sc, typedLit(probs)).as("t")).head()
    require(!thRow.isNullAt(0),
      "empty or all-null score corpus has no quantiles")
    val ths = thRow.getSeq[Double](0).map(r6)
    val bucket = ths.foldLeft(lit(0)) { (acc, t) =>
      acc + when(sc > t, 1).otherwise(0)
    }
    df.withColumn(bucketName,
      when(sc.isNull, lit(null)).otherwise(bucket).cast("int"))
  }

  /** EXACT per-stratum holdout split: within each stratum, rows are
    * ranked in md5(salt ++ id) order and the first round(frac·n_s) go to
    * `headName`, the rest to `tailName`. [[hashSplit]] is per-row
    * Bernoulli — each stratum's head count wobbles binomially, which at
    * evaluation scale (a 1k-document benchmark stratum) is a real skew;
    * this variant realises the exact count in every stratum while keeping
    * membership deterministic and engine-reproducible.
    *
    * Scale shape: the per-stratum rank runs on
    * [[graft.ops.GlobalOrder.rankByHexKeyWithin]] — 256-way parallel
    * within every stratum, no driver state — plus one tiny per-stratum
    * count aggregate that broadcast-joins back.
    *
    * @return input columns + (stratum_pos, split)
    */
  def exactStratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
                           salt: String, frac: Double,
                           headName: String = "holdout",
                           tailName: String = "train"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val clobbered = Seq("stratum_pos", "split").filter(hasColumn(df, _))
    require(clobbered.isEmpty,
      s"exactStratifiedSplit adds ${clobbered.mkString("/")}; " +
        "rename existing columns")
    val nc = graft.ops.Cols.fresh(df, "_ss_n")
    // null ids/strata excluded (engine null-id convention; a null stratum
    // has no well-defined quota)
    val base = df.filter(col(idCol).isNotNull && col(strataCol).isNotNull)
    // the rank emits the group size from its own count frame — no third
    // corpus scan for the quota
    graft.ops.GlobalOrder.rankByHexKeyWithin(
        base, Seq(strataCol),
        md5(concat(lit(salt), col(idCol).cast("string"))),
        Seq(col(idCol)), "stratum_pos", Some(nc))
      .withColumn("split",
        when(col("stratum_pos") <
            round(lit(frac) * col(nc)).cast("long"), headName)
          .otherwise(tailName))
      .drop(nc)
  }

  /** Per-group document cap (the "at most N pages per domain" rule of web
    * corpora): keep each group's first `cap` documents in deterministic
    * md5-hash order — a reproducible uniform-without-replacement sample,
    * same salt → same survivors on every run and engine.
    *
    * Scale shape: delegates to [[graft.ops.GlobalOrder.rankByHexKeyWithin]],
    * which ranks inside 256 hash-prefix buckets per group instead of one
    * global window partition per group — a skewed group (one domain with
    * 10^9 pages) never lands on a single task.
    *
    * @return input columns + (cap_pos): the kept rows with their in-group
    *         hash position (0-based)
    */
  def perGroupCap(df: DataFrame, idCol: String, groupCol: String,
                  cap: Long, salt: String): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val base = df.filter(col(idCol).isNotNull && col(groupCol).isNotNull)
    graft.ops.GlobalOrder.rankByHexKeyWithin(base, Seq(groupCol),
        md5(concat(lit(salt), col(idCol).cast("string"))),
        Seq(col(idCol)), "cap_pos")
      .filter(col("cap_pos") < cap)
  }

  /** Per-source repetition plan for a FIXED token budget — the
    * data-constrained training recipe (repeating scarce high-weight
    * sources for multiple epochs while sampling abundant ones once or
    * partially; the published data-mix idiom of the scaling-laws
    * literature): source g's share of the budget is
    * `target_tokens = budget · w_g / Σw`, which its `n_g` corpus
    * tokens cover in `target/n_g` passes — `full_epochs` complete
    * passes plus a `partial_frac` fraction of one more. The plan frame
    * is the auditable recipe artifact; [[repeatToBudget]] materializes
    * it.
    *
    * Scale shape: ONE map-side-combined aggregate (group → token
    * total); the plan math runs driver-side over the group frame (tens
    * of rows) with r6 rounding, engine-reproducible. A weight naming a
    * group ABSENT from the corpus refuses loudly — a silently dropped
    * source is a recipe bug, never a default.
    *
    * @return (groupCol, n_tokens, weight, target_tokens, full_epochs,
    *         partial_frac) — one row per weighted group, ascending
    */
  def epochPlan(df: DataFrame, groupCol: String, tokenCol: String,
                weights: Seq[(String, Double)],
                budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      s"weights must be non-empty and non-negative, got $weights")
    require(weights.map(_._1).distinct.length == weights.length,
      s"duplicate group in weights: $weights")
    val sumW = weights.map(_._2).sum
    require(sumW > 0.0, s"weights must not all be zero: $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df
      .filter(col(groupCol).isNotNull && col(tokenCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(sum(col(tokenCol).cast("long")).as("n_tokens"))
      .as[(String, Long)].collect().toMap
    val missing = weights.map(_._1).filterNot(totals.contains)
    require(missing.isEmpty,
      s"epochPlan: weighted groups absent from the corpus: " +
        s"${missing.mkString(", ")} — a silently dropped source is a " +
        "recipe bug; fix the weights or the group column")
    val rows = weights.sortBy(_._1).map { case (g, w) =>
      val n = totals(g)
      val target = math.round(budgetTokens * (w / sumW))
      val full = if (n <= 0) 0L else target / n
      val partial = if (n <= 0) 0.0 else r6((target - full * n).toDouble / n)
      (g, n, r6(w / sumW), target, full, partial)
    }
    spark.createDataset(rows)
      .toDF(groupCol, "n_tokens", "weight", "target_tokens",
        "full_epochs", "partial_frac")
  }

  /** Materialize an [[epochPlan]]: every group-g document repeats
    * `full_epochs` times (`epoch` = 0..full-1) and joins epoch
    * `full_epochs` iff its deterministic [[hashBucket]] falls under
    * `partial_frac` — a per-DOCUMENT fraction (≈ the token fraction at
    * corpus scale; same salt → same repetition set on every run and
    * engine). Output = the input columns + `epoch`; groups without a
    * weight cannot occur (the plan refused them already); weight-0
    * groups emit nothing.
    *
    * Scale shape: the tiny plan frame broadcast-joins the corpus and a
    * per-row generator emits the epochs — no shuffle of the corpus, no
    * physical copy amplification beyond the requested repetition.
    */
  def repeatToBudget(df: DataFrame, idCol: String, groupCol: String,
                     tokenCol: String, weights: Seq[(String, Double)],
                     budgetTokens: Long, salt: String): DataFrame = {
    require(!hasColumn(df, "epoch"),
      "repeatToBudget adds 'epoch'; rename the existing column")
    val plan = epochPlan(df, groupCol, tokenCol, weights, budgetTokens)
      .select(col(groupCol).as("__g"), col("full_epochs"),
        col("partial_frac"))
    val bucket = hashBucket(col(idCol), salt)
    val thresh = round(col("partial_frac") * 10000).cast("long")
    val emptyLongs = array().cast("array<bigint>")
    val fullArr = when(col("full_epochs") >= 1,
      sequence(lit(0L), col("full_epochs") - 1)).otherwise(emptyLongs)
    val extra = when(bucket < thresh, array(col("full_epochs")))
      .otherwise(emptyLongs)
    df.filter(col(idCol).isNotNull && col(groupCol).isNotNull)
      .join(broadcast(plan), col(groupCol).cast("string") === col("__g"))
      .withColumn("epoch", explode(concat(fullArr, extra)))
      .drop("__g", "full_epochs", "partial_frac")
  }
}
