package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Distributed global ordering primitives: assign every row its rank
  * in a corpus-wide total order WITHOUT funnelling the corpus through one
  * task (`Window.orderBy` with no partition key collapses to a single
  * partition — the classic scale trap).
  *
  * Same two-level design as [[Packing.packSequences]], specialised to
  * hex-string order keys (md5-style): the key's first two hex characters
  * give 256 DETERMINISTIC buckets whose numeric order equals the key's
  * lexicographic order (lowercase hex is order-preserving under the
  * char-by-char comparison both Spark and any ANSI engine use), so
  *
  *   1. bucket assignment is pure per-row arithmetic — no sampling, no
  *      `repartitionByRange`, identical on every evaluation;
  *   2. one tiny aggregate (256 rows) collects per-bucket counts to the
  *      driver, which prefix-sums them into per-bucket base ranks;
  *   3. a window partitioned BY BUCKET (parallel) ranks within buckets and
  *      adds the base.
  *
  * md5 keys are uniform, so the 256 buckets are balanced at any corpus
  * size; one shuffle total (hash by bucket for the window).
  */
object GlobalOrder {

  /** Adds `posName`: the 0-based rank of each row under the total order
    * (keyCol, tieCols...). `keyCol` must be a lowercase-hex string with at
    * least two characters (an md5/sha hex digest); `tieCols` break exact
    * key collisions so the rank is well-defined row-by-row.
    *
    * Precondition (same as Packing.packSequences): `df` must evaluate
    * DETERMINISTICALLY — the input is scanned twice (once for the bucket
    * counts, once for the ranking), and the per-bucket bases computed
    * from the first scan are only valid if the second sees the same rows.
    * Frames containing `sample()`/`rand()` or reading mutable sources
    * must be persisted/checkpointed by the caller first.
    */
  def rankByHexKey(df: DataFrame, keyCol: Column, tieCols: Seq[Column],
                   posName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(_.equalsIgnoreCase(posName)),
      s"rankByHexKey adds '$posName'; rename the existing column")
    // temp columns must not clobber caller columns of the same name
    val kc = Cols.fresh(df, "_go_key")
    val bc = Cols.fresh(df, "_go_bucket")
    val withKey = df.withColumn(kc, keyCol)
      .withColumn(bc,
        when(col(kc).rlike("^[0-9a-f]{2}"),
          conv(substring(col(kc), 1, 2), 16, 10).cast("int")))
    // 256 rows to the driver; prefix-sum into per-bucket base ranks
    val counts = withKey.groupBy(bc).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"rankByHexKey: ${r.getLong(1)} row(s) have a null or " +
            "non-lowercase-hex order key; keys must be >=2 lowercase hex " +
            "chars (an md5/sha digest)")
        r.getInt(0) -> r.getLong(1)
      }.toMap
    var acc = 0L
    val bases: Map[Int, Long] = (0 until 256).map { b =>
      val e = b -> acc
      acc += counts.getOrElse(b, 0L)
      e
    }.toMap
    val basesCol = typedLit(bases)
    val w = Window.partitionBy(bc).orderBy(col(kc) +: tieCols: _*)
    withKey
      .withColumn(posName,
        element_at(basesCol, col(bc)) + row_number().over(w) - 1)
      .drop(kc, bc)
  }

  /** Grouped twin of [[rankByHexKey]]: `posName` is the row's 0-based rank
    * WITHIN its `groupCols` group under the (keyCol, tieCols...) order —
    * with neither a per-group single-task funnel (`Window.partitionBy
    * (group).orderBy(key)` funnels each group through ONE task, the scale
    * trap when one stratum dominates the corpus) nor driver state (group
    * cardinality is unbounded, so the driver-side prefix sum of the
    * ungrouped variant does not transfer).
    *
    * Fully distributed two-level scheme: per-(group, bucket) counts are a
    * tiny aggregate (≤256 rows per group); the per-group prefix sum over
    * those counts is a window over ≤256 rows per partition; the bases
    * join back (broadcast while executor-sized — ≤ 2M rows — a plain
    * shuffled join beyond, so group cardinality never bounds the
    * operator); the final window partitions by (group, bucket) —
    * 256-way parallel within every group.
    *
    * Same determinism precondition as [[rankByHexKey]]: the input is
    * scanned twice and must evaluate identically both times. Rows with a
    * null/non-hex key or a null group fail with a clear message (a null
    * group would silently vanish at the base join — null keys never
    * equi-join).
    */
  def rankByHexKeyWithin(df: DataFrame, groupCols: Seq[String],
                         keyCol: Column, tieCols: Seq[Column],
                         posName: String): DataFrame =
    rankByHexKeyWithin(df, groupCols, keyCol, tieCols, posName, None)

  /** As [[rankByHexKeyWithin(df*]]; when `sizeName` is set, the output
    * also carries each row's GROUP SIZE under that name — derived from
    * the same per-(group, bucket) count frame the ranking already
    * aggregates, so callers needing quotas (stratified splits) skip a
    * third corpus scan.
    */
  def rankByHexKeyWithin(df: DataFrame, groupCols: Seq[String],
                         keyCol: Column, tieCols: Seq[Column],
                         posName: String, sizeName: Option[String],
                         broadcastMaxBaseRows: Long = BroadcastMaxBaseRows)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "rankByHexKeyWithin needs >=1 group column")
    val clobbered = (posName +: sizeName.toSeq)
      .filter(n => df.columns.exists(_.equalsIgnoreCase(n)))
    require(clobbered.isEmpty,
      s"rankByHexKeyWithin adds ${clobbered.mkString("/")}; " +
        "rename the existing column(s)")
    val kc = Cols.fresh(df, "_go_key")
    val bc = Cols.fresh(df, "_go_bucket")
    val baseC = Cols.fresh(df, "_go_base")
    val withKey = df.withColumn(kc, keyCol)
      .withColumn(bc,
        when(col(kc).rlike("^[0-9a-f]{2}"),
          conv(substring(col(kc), 1, 2), 16, 10).cast("int")))
    // tiny frame: one row per (group, bucket); checkpointed because it is
    // consumed twice (validity check + base join) and re-aggregating the
    // corpus twice would double the heavy pass
    val counts = withKey.groupBy(groupCols.map(col) :+ col(bc): _*).count()
      .localCheckpoint()
    val invalid = counts.filter(col(bc).isNull ||
      groupCols.map(col(_).isNull).reduce(_ || _)).limit(1).collect()
    require(invalid.isEmpty,
      "rankByHexKeyWithin: rows with a null group or a null/non-lowercase-" +
        "hex order key present; keys must be >=2 lowercase hex chars and " +
        "groups non-null")
    val wBase = Window.partitionBy(groupCols.map(col): _*).orderBy(col(bc))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.partitionBy(groupCols.map(col): _*)
    val bases = counts
      .withColumn(baseC, coalesce(sum("count").over(wBase), lit(0L)))
      .withColumns(sizeName.map(_ -> sum("count").over(wTotal)).toMap)
      .drop("count")
    val wRank = Window.partitionBy(groupCols.map(col) :+ col(bc): _*)
      .orderBy(col(kc) +: tieCols: _*)
    // bases is groups × ≤256 rows: broadcast while that is executor-sized,
    // fall back to a shuffled join for very-high-cardinality groupings
    // (the counts frame is checkpointed, so the cardinality probe is a
    // cheap local count, and the join input is never recomputed)
    val basesJoin =
      if (counts.count() <= broadcastMaxBaseRows) broadcast(bases) else bases
    withKey
      .join(basesJoin, groupCols :+ bc)
      .withColumn(posName, col(baseC) + row_number().over(wRank) - 1)
      // the using-join moved its keys first; restore the caller's layout
      .select(df.columns.map(col).toIndexedSeq ++
        (col(posName) +: sizeName.map(col).toSeq): _*)
  }

  /** SERIAL-parity dense ids (`base+1, base+2, ...` in `sortCols` order)
    * WITHOUT the one-task funnel of `row_number().over(Window.orderBy)`:
    * a balanced range repartition gives a total order across partitions,
    * `zipWithIndex` assigns per-partition offsets (one lightweight
    * count-per-partition job — Spark's cumulative-offset primitive), and
    * every partition stamps its rows in parallel.
    *
    * The ids do not depend on where the range sampler places partition
    * boundaries: boundaries only move rows between partitions, never
    * change the total order, so the assignment is deterministic — PROVIDED
    * `sortCols` is a unique key (duplicate sort keys would make the order
    * among equals placement-dependent). Ingest uses file path and
    * (document_id, chunk_index), both unique.
    */
  def denseIds(df: DataFrame, sortCols: Seq[Column], idName: String,
               base: Long = 0L, numPartitions: Option[Int] = None): DataFrame = {
    require(sortCols.nonEmpty, "denseIds needs >=1 sort column")
    require(!df.columns.exists(_.equalsIgnoreCase(idName)),
      s"denseIds adds '$idName'; rename the existing column")
    val spark = df.sparkSession
    // default: let AQE size the range exchange (a small batch coalesces,
    // a huge one fans out); ids are identical either way
    val ranged = numPartitions.fold(df.repartitionByRange(sortCols: _*))(
      n => df.repartitionByRange(n, sortCols: _*))
    val sorted = ranged.sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
      .add(idName, org.apache.spark.sql.types.LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + 1L + i))
    }
    spark.createDataFrame(indexed, schema)
  }

  // ~128 MB of (group, bucket, base) rows at worst — the broadcast bound
  private val BroadcastMaxBaseRows = 2000000L
}
