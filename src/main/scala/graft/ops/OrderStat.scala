package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** [EXT] Distributed order statistics: EXACT global top-k selection
  * without a driver-side merge — the primitive behind "pick exactly 10M
  * documents by score" selections where Spark's own
  * `orderBy(...).limit(k)` (TakeOrderedAndProject) would merge up to
  * k × partitions rows on the driver.
  *
  * Algorithm (threshold selection, the classic distributed k-th order
  * statistic): bracket the k-th largest key with ONE approx-quantile pass
  * (Greenwald-Khanna sketch, `df.stat.approxQuantile`), pin the bracket
  * with ONE exact conditional-count aggregate, then
  *   - everything strictly above the upper bracket value is in the top k
  *     (a zero-shuffle filter — the corpus never moves), and
  *   - the boundary band between the bracket values (~relErr · n rows) is
  *     recursed on for the remaining need, terminating in a TakeOrdered
  *     whose limit is <= `cutover` — a driver merge bounded by the
  *     cutover, never by k.
  * Each recursion level shrinks the candidate set by ~6·relErr, so depth
  * is 2-3 in practice; a depth cap fails loudly rather than looping.
  *
  * The selected SET is exact and deterministic — the top k rows by
  * (key desc, tiebreak asc) — regardless of where the (non-deterministic,
  * sketch-derived) bracket values land: bracket placement only moves work
  * between the filter and the band, never changes membership.
  *
  * Degenerate boundary ties (r18): when more than `cutover` rows share
  * the exact boundary key value (the bracket cannot shrink), selection
  * falls through to a DISTRIBUTED RANK over the tie set's TIEBREAK
  * column — numeric tiebreaks recurse through the same bracket loop on
  * the tiebreak value (threshold selection again, never a funnel);
  * lowercase-hex tiebreaks (the engine's md5-id convention) rank through
  * [[GlobalOrder.rankByHexKey]]'s 256-bucket idiom. The loud refusal
  * remains only for the genuinely unrankable pathologies: a tiebreak
  * that ALSO collapses past the cutover, or one that is neither numeric
  * nor hex.
  *
  * This is an EAGER operator (it runs the quantile/count actions when
  * called, like `Mixing.temperatureWeights`); the returned DataFrame is a
  * union of filters on `df` plus one bounded TakeOrdered. To keep the
  * handful of passes (quantile sketch, exact counts, band recursion) from
  * recomputing an expensive upstream plan, the operator PINS ITS OWN
  * working set (r18): the narrow `(key, tiebreak)` projection it derives
  * is persisted (MEMORY_AND_DISK) before the first action and unpersisted
  * on exit, so upstream evaluates ONCE however many bracket levels run —
  * ~16 bytes × rows cluster-wide, spilling to local disk at corpus scale.
  * When `df` is already cached the operator skips its own pin and rides
  * the caller's. Only the final output filters re-touch `df` (the rows
  * returned must carry every input column).
  */
object OrderStat {

  /** The narrow working-set pin: `cols` of `base`, persisted unless the
    * caller already cached the input (then the projection just rides the
    * existing cache). Returns the frame and whether WE pinned it.
    */
  private def pinStats(input: DataFrame, base: DataFrame,
                       cols: Seq[Column]): (DataFrame, Boolean) = {
    val narrow = base.select(cols: _*)
    if (input.storageLevel != StorageLevel.NONE) (narrow, false)
    else (narrow.persist(StorageLevel.MEMORY_AND_DISK), true)
  }

  /** Exact top-`k` rows of `df` by (`keyCol` desc, `tieCol` asc).
    *
    * Rows with a null key never qualify. For `k <= cutover` this is
    * exactly `orderBy(desc(keyCol), asc(tieCol)).limit(k)` (TakeOrdered —
    * optimal at small k); above the cutover the distributed threshold
    * selection runs and no driver structure ever holds more than
    * ~`cutover` rows.
    *
    * @param cutover largest k (and largest boundary band) still routed
    *                through TakeOrdered; also bounds the tie refusal
    * @param relErr  Greenwald-Khanna sketch relative error (band width)
    */
  def topKByKeyDesc(df: DataFrame, keyCol: String, tieCol: String, k: Long,
                    cutover: Int = 65536, relErr: Double = 1e-4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cutover >= 1, s"cutover must be >= 1, got $cutover")
    require(relErr > 0.0 && relErr < 0.5,
      s"relErr must be in (0, 0.5), got $relErr")
    val base = df.filter(col(keyCol).isNotNull)
    if (k <= cutover)
      base.orderBy(col(keyCol).desc, col(tieCol)).limit(k.toInt)
    else {
      // every stats pass (count, sketch, exact counts, band recursion)
      // runs on the pinned narrow projection; only the returned plan's
      // output filters touch `base` (they must carry all columns)
      val (stats, pinned) =
        pinStats(df, base, Seq(col(keyCol), col(tieCol)))
      try {
        val total = stats.count()
        if (total <= k) base
        else select(stats, base, keyCol, tieCol, total, k, cutover, relErr,
          depth = 0)
      } finally if (pinned) stats.unpersist(blocking = false)
    }
  }

  /** The exact k-th LARGEST key value — the distributed order statistic
    * as a VALUE query (no rows returned, no tiebreak needed: ties at the
    * answer all carry the answer). This is the scale-safe exact quantile
    * for high-cardinality columns: Spark's own exact `percentile`
    * aggregates a value→count map (memory O(distinct values) on one
    * reducer — an OOM on a continuous 10^10-row column), while this runs
    * the same bracket loop as [[topKByKeyDesc]] — one approx-quantile
    * pass + one exact boundary count per level, collecting at most
    * `cutover` boundary keys at the end. Unlike the row-selection path,
    * a degenerate tie band needs no refusal: if every band key equals
    * the bracket value, that value IS the answer.
    */
  def kthLargestKey(df: DataFrame, keyCol: String, k: Long,
                    cutover: Int = 65536, relErr: Double = 1e-4): Double = {
    require(cutover >= 1, s"cutover must be >= 1, got $cutover")
    require(relErr > 0.0 && relErr < 0.5,
      s"relErr must be in (0, 0.5), got $relErr")
    // NaN keys have no rank (every comparison is false — they would be
    // invisible to the bracket counts but inflate `total`, silently
    // shifting every rank): excluded like nulls
    val proj = df.select(col(keyCol).cast("double").as(keyCol))
      .filter(col(keyCol).isNotNull && !isnan(col(keyCol)))
    val (base, pinned) = pinStats(df, proj, Seq(col(keyCol)))
    try {
      val total = base.count()
      require(k >= 1 && k <= total,
        s"k must be in [1, $total (non-null rows)], got $k")
      kthIn(base, keyCol, total, k, cutover, relErr, depth = 0)
    } finally if (pinned) base.unpersist(blocking = false)
  }

  /** DuckDB/Postgres `quantile_disc` semantics: the exact element at
    * ascending rank max(1, ceil(q·n)) — the LOWER discrete quantile, no
    * interpolation, so the answer is always a value that exists in the
    * column and any engine recomputes it bit-identically.
    */
  def exactQuantileDisc(df: DataFrame, keyCol: String, q: Double,
                        cutover: Int = 65536,
                        relErr: Double = 1e-4): Double =
    exactQuantilesDisc(df, keyCol, Seq(q), cutover, relErr).head

  /** All of `qs` in ONE shared pass set (the multi-quantile shape an
    * engine actually serves): one count, one approx-quantile sketch
    * carrying every bracket probability, ONE conditional-count aggregate
    * pinning all brackets, then per-quantile resolution — most answers
    * resolve AT a bracket value with zero extra passes; only quantiles
    * landing strictly inside their (tiny) band pay a per-q tail.
    */
  def exactQuantilesDisc(df: DataFrame, keyCol: String, qs: Seq[Double],
                         cutover: Int = 65536,
                         relErr: Double = 1e-4): Seq[Double] = {
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0,
      s"quantile must be in [0, 1], got $q"))
    // NaN exclusion: same argument as kthLargestKey
    val proj = df.select(col(keyCol).cast("double").as(keyCol))
      .filter(col(keyCol).isNotNull && !isnan(col(keyCol)))
    val (base, pinned) = pinStats(df, proj, Seq(col(keyCol)))
    try {
      val total = base.count()
      require(total > 0, "exactQuantilesDisc over zero non-null rows")
      val out = new Array[Double](qs.size)
      // (output index, k-th largest rank) still unresolved
      var pending: Seq[(Int, Long)] = qs.zipWithIndex.map { case (q, i) =>
        (i, total - math.max(1L, math.ceil(q * total).toLong) + 1L)
      }
      var margin = 2.0 * relErr
      while (pending.nonEmpty) {
        val probs = pending.flatMap { case (_, k) =>
          val p = 1.0 - k.toDouble / total
          Seq(math.max(0.0, p - margin), math.min(1.0, p + margin))
        }
        val vs = base.stat.approxQuantile(keyCol, probs.toArray, relErr)
        val sums = pending.indices.flatMap { i =>
          Seq(sum(when(col(keyCol) > vs(2 * i + 1), 1L).otherwise(0L)),
            sum(when(col(keyCol) >= vs(2 * i + 1), 1L).otherwise(0L)),
            sum(when(col(keyCol) > vs(2 * i), 1L).otherwise(0L)),
            sum(when(col(keyCol) >= vs(2 * i), 1L).otherwise(0L)))
        }
        val r = base.agg(sums.head, sums.tail: _*).head()
        pending = pending.zipWithIndex.filter { case ((idx, k), i) =>
          val vLow = vs(2 * i); val vHigh = vs(2 * i + 1)
          val above = r.getLong(4 * i); val atHi = r.getLong(4 * i + 1)
          val aboveLow = r.getLong(4 * i + 2); val atLeast = r.getLong(4 * i + 3)
          if (above < k && k <= atLeast) {
            out(idx) =
              if (k <= atHi) vHigh
              else if (k > aboveLow) vLow
              else kthIn(
                base.filter(col(keyCol) > vLow && col(keyCol) < vHigh),
                keyCol, aboveLow - atHi, k - atHi, cutover, relErr, 1)
            false // resolved
          } else true // sketch missed this bracket: retry wider
        }.map(_._1)
        margin *= 4.0 // at margin >= 1 the bracket is [min, max]: always hits
      }
      out.toSeq
    } finally if (pinned) base.unpersist(blocking = false)
  }

  /** Bracket loop for the k-th largest VALUE within `frame` (`total`
    * rows, all keys non-null, 1 <= k <= total). Progress argument: each
    * level either resolves the answer AT a bracket value (one exact
    * count decides it — this is how heavy ties resolve without any
    * refusal) or recurses on the strictly-INTERIOR band, which drops
    * both boundary atoms and is ~6·relErr·total for a continuous key —
    * so the depth cap only fires on genuinely pathological inputs.
    */
  private def kthIn(frame: DataFrame, keyCol: String, total: Long, k: Long,
                    cutover: Int, relErr: Double, depth: Int): Double = {
    require(depth < 16,
      s"k-th-key selection failed to converge after $depth levels " +
        s"(band still $total rows for k=$k) — widen relErr or raise cutover")
    import frame.sparkSession.implicits._
    if (total <= cutover) {
      // bounded collect of the candidate keys; k-th largest directly
      val keys = frame.select(col(keyCol)).as[Double].collect().sorted
      keys(keys.length - k.toInt)
    } else {
      val q = 1.0 - k.toDouble / total
      var margin = 2.0 * relErr
      var vLow = 0.0; var vHigh = 0.0
      var above = 0L; var atHi = 0L; var aboveLow = 0L; var atLeast = 0L
      var bracketed = false
      while (!bracketed) {
        val vs = frame.stat.approxQuantile(keyCol,
          Array(math.max(0.0, q - margin), math.min(1.0, q + margin)), relErr)
        vLow = vs(0); vHigh = vs(1)
        // ONE exact pass: counts above/at both bracket values
        val r = frame.agg(
          sum(when(col(keyCol) > vHigh, 1L).otherwise(0L)).as("above"),
          sum(when(col(keyCol) >= vHigh, 1L).otherwise(0L)).as("at_hi"),
          sum(when(col(keyCol) > vLow, 1L).otherwise(0L)).as("above_low"),
          sum(when(col(keyCol) >= vLow, 1L).otherwise(0L)).as("at_least"))
          .head()
        above = r.getLong(0); atHi = r.getLong(1)
        aboveLow = r.getLong(2); atLeast = r.getLong(3)
        if (above < k && k <= atLeast) bracketed = true
        else margin *= 4.0 // see topKByKeyDesc: [min, max] always brackets
      }
      // v_k is the value with count(> v_k) < k <= count(>= v_k)
      if (k <= atHi) vHigh // count(>vHigh) < k <= count(>=vHigh)
      else if (k > aboveLow) vLow // count(>vLow) < k <= count(>=vLow)
      else {
        // strictly interior: both boundary atoms excluded, so the band
        // shrinks every level even on heavily tied keys
        val band = frame.filter(col(keyCol) > vLow && col(keyCol) < vHigh)
        kthIn(band, keyCol, aboveLow - atHi, k - atHi, cutover, relErr,
          depth + 1)
      }
    }
  }

  /** Recursive threshold selection. `stats` is the pinned narrow
    * `(key, tiebreak)` working set and `out` the full-width frame; both
    * hold exactly `total` rows (all keys non-null) under identical
    * predicates — every action runs on `stats`, the returned plan is
    * built from `out`. `cutover < need <= total`.
    *
    * Progress argument (the kthIn structure, r18): each level's exact
    * pass counts both sides of BOTH bracket values, so the boundary key
    * either IS a bracket value — resolved immediately through its tie
    * atom (TakeOrdered under the cutover, distributed tiebreak rank
    * above it) — or sits strictly INTERIOR, where the recursion drops
    * both boundary atoms and the band shrinks every level even on
    * heavily tied keys (the r17 shape recursed on the CLOSED band,
    * which never shrinks on two-point distributions — a convergence
    * failure the depth cap turned into a spurious refusal).
    */
  private def select(stats: DataFrame, out: DataFrame, keyCol: String,
                     tieCol: String, total: Long, need: Long, cutover: Int,
                     relErr: Double, depth: Int): DataFrame = {
    require(depth < 16,
      s"top-k threshold selection failed to converge after $depth levels " +
        s"(band still ${total} rows for need=$need) — widen relErr or " +
        "raise cutover")
    // bracket the need-th largest key: the value at quantile q has rank
    // within relErr*total of q*total, so quantiles at q -/+ margin bound
    // the boundary from both sides once exact counts confirm them
    val q = 1.0 - need.toDouble / total
    var margin = 2.0 * relErr
    var vLow = 0.0; var vHigh = 0.0
    var above = 0L; var atHi = 0L; var aboveLow = 0L; var atLeast = 0L
    var bracketed = false
    while (!bracketed) {
      val pLow = math.max(0.0, q - margin)
      val pHigh = math.min(1.0, q + margin)
      val vs = stats.stat.approxQuantile(keyCol, Array(pLow, pHigh), relErr)
      vLow = vs(0); vHigh = vs(1)
      // ONE exact pass pins all four counts around the bracket
      val r = stats.agg(
        sum(when(col(keyCol) > vHigh, 1L).otherwise(0L)).as("above"),
        sum(when(col(keyCol) >= vHigh, 1L).otherwise(0L)).as("at_hi"),
        sum(when(col(keyCol) > vLow, 1L).otherwise(0L)).as("above_low"),
        sum(when(col(keyCol) >= vLow, 1L).otherwise(0L)).as("at_least"))
        .head()
      above = r.getLong(0); atHi = r.getLong(1)
      aboveLow = r.getLong(2); atLeast = r.getLong(3)
      if (above <= need && need <= atLeast) bracketed = true
      // sketch rank error exceeded the margin — widen geometrically;
      // terminates because at margin >= 1 the bracket is [min, max],
      // where above = 0 <= need and atLeast = total >= need always hold
      else margin *= 4.0
    }
    if (need <= atHi) {
      // the boundary key IS vHigh: everything above it qualifies plus
      // `remaining` rows of vHigh's tie atom
      val kept = out.filter(col(keyCol) > vHigh)
      val remaining = need - above
      if (remaining == 0L) kept
      else kept.unionAll(resolveAtom(stats, out, keyCol, tieCol, vHigh,
        atHi - above, remaining, cutover, relErr))
    } else if (need > aboveLow) {
      // the boundary key IS vLow
      val kept = out.filter(col(keyCol) > vLow)
      kept.unionAll(resolveAtom(stats, out, keyCol, tieCol, vLow,
        atLeast - aboveLow, need - aboveLow, cutover, relErr))
    } else {
      // strictly interior: both boundary atoms excluded, so the band
      // shrinks every level (~6·relErr·total for a continuous key)
      val kept = out.filter(col(keyCol) >= vHigh)
      val bandPred = col(keyCol) > vLow && col(keyCol) < vHigh
      val bandSize = aboveLow - atHi
      val bandNeed = need - atHi
      if (bandSize <= cutover)
        kept.unionAll(out.filter(bandPred)
          .orderBy(col(keyCol).desc, col(tieCol)).limit(bandNeed.toInt))
      else
        kept.unionAll(
          select(stats.filter(bandPred), out.filter(bandPred), keyCol,
            tieCol, bandSize, bandNeed, cutover, relErr, depth + 1))
    }
  }

  /** `remaining` rows out of the `tieCount`-row atom at exactly
    * `key == v`, ordered by the tiebreak: whole-atom and
    * cutover-bounded cases resolve directly, larger atoms rank their
    * tiebreak distributed ([[tieSelect]]).
    */
  private def resolveAtom(stats: DataFrame, out: DataFrame, keyCol: String,
                          tieCol: String, v: Double, tieCount: Long,
                          remaining: Long, cutover: Int,
                          relErr: Double): DataFrame = {
    val atom = col(keyCol) === v
    if (remaining == tieCount) out.filter(atom)
    else if (tieCount <= cutover)
      out.filter(atom).orderBy(col(tieCol)).limit(remaining.toInt)
    else tieSelect(stats.filter(atom), out.filter(atom), tieCol,
      tieCount, remaining, cutover, relErr)
  }

  /** Distributed rank over a boundary TIE SET: every row of `statsTies` /
    * `outTies` carries the same key value; keep exactly the `remaining`
    * smallest rows by `tieCol` without a tie-set-sized driver merge.
    *
    *  - NUMERIC tiebreaks run the same bracket machinery on the tiebreak
    *    value ([[kthIn]] on a monotone double surrogate): one threshold
    *    value, a zero-shuffle strict filter, and the == atom resolved by
    *    a TakeOrdered on the ORIGINAL tiebreak bounded by `cutover` —
    *    surrogate rounding collapses distinct tiebreaks only INTO the
    *    atom, where the original column re-orders them exactly.
    *  - LOWERCASE-HEX tiebreaks (md5-style ids) rank through
    *    [[GlobalOrder.rankByHexKey]]: 256 deterministic order-preserving
    *    buckets, per-bucket windows — funnel-free.
    *
    * Refusal remains only for the unrankable: a tiebreak whose == atom
    * ALSO exceeds `cutover` (both key and tiebreak collapsed), or a type
    * that is neither numeric nor hex.
    */
  private def tieSelect(statsTies: DataFrame, outTies: DataFrame,
                        tieCol: String, tieCount: Long, remaining: Long,
                        cutover: Int, relErr: Double): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    // the whole tie set qualifies: no rank needed, and no refusal even
    // for an unrankable tiebreak — the answer is simply every tie row
    if (remaining == tieCount) return outTies
    statsTies.schema(tieCol).dataType match {
      case _: NumericType =>
        val tc = Cols.fresh(statsTies, "_os_tie")
        // a null/NaN tiebreak has no defined rank inside a tie set this
        // large — silently dropping it would shift every rank; refuse
        val unranked = statsTies.filter(col(tieCol).isNull ||
          isnan(col(tieCol).cast("double"))).count()
        require(unranked == 0L,
          s"cannot rank a $tieCount-row boundary tie set: tiebreak " +
            s"'$tieCol' carries $unranked null/NaN value(s)")
        val tiesD = statsTies.select(col(tieCol).cast("double").as(tc))
        // the remaining-th SMALLEST tiebreak = (count - remaining + 1)-th
        // largest; the surrogate is monotone, so the strict filter below
        // is exact and the == atom absorbs any double collapse
        val cutoff = kthIn(tiesD, tc, tieCount, tieCount - remaining + 1L,
          cutover, relErr, depth = 0)
        val below = statsTies
          .filter(col(tieCol).cast("double") < cutoff).count()
        val residual = remaining - below
        require(residual <= cutover,
          s"$residual rows needed from tiebreak value $cutoff whose tie " +
            s"atom exceeds cutover $cutover: key AND tiebreak have both " +
            "collapsed — select on a better-distributed tiebreak")
        outTies.filter(col(tieCol).cast("double") < cutoff)
          .unionAll(outTies.filter(col(tieCol).cast("double") === cutoff)
            .orderBy(col(tieCol)).limit(residual.toInt))
      case StringType =>
        val nonHex = statsTies
          .filter(!col(tieCol).rlike("^[0-9a-f]{2}")).count()
        require(nonHex == 0L,
          s"cannot rank a $tieCount-row boundary tie set: string tiebreak " +
            s"'$tieCol' has $nonHex value(s) that are not lowercase hex " +
            "(md5-style ids) — supply a numeric or hex tiebreak")
        val pos = Cols.fresh(outTies, "_os_pos")
        GlobalOrder.rankByHexKey(outTies, col(tieCol), Seq(col(tieCol)), pos)
          .filter(col(pos) < remaining)
          .drop(pos)
      case other =>
        throw new IllegalArgumentException(
          s"cannot rank a $tieCount-row boundary tie set: tiebreak " +
            s"'$tieCol' of type ${other.simpleString} is neither numeric " +
            "nor a hex string — supply a rankable tiebreak or raise cutover")
    }
  }
}
