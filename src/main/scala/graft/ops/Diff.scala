package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Corpus snapshot diff — the change-data primitive of an
  * incremental pipeline: given two snapshots of an id-keyed table,
  * classify every id as added / removed / changed / unchanged, comparing
  * content by fingerprint instead of column-by-column.
  *
  * Scale shape: each side is reduced to (id, 16-byte md5) BEFORE the
  * full-outer join, so the shuffle carries a fixed ~24 bytes per row no
  * matter how wide the rows are — diffing two 100 TB snapshots moves two
  * id+hash columns, not the corpora. With both snapshots bucketed on the
  * id the join is co-located and the diff is shuffle-free.
  *
  * Ids must be unique within each snapshot (the usual table-key
  * contract); null ids are dropped (engine null-id convention).
  */
object Diff {

  /** Reproducible row fingerprint over `cols`, null-safe and
    * framing-unambiguous: each value renders netstring-style as
    * `<charlen>:<value>` (nulls as the bare marker `n`, distinct from
    * every length-prefixed value, so ("a", null) and ("a", "") hash
    * differently), then md5 over the concatenation. Length prefixes make
    * the decoding unique for ANY content — a sentinel-separator scheme
    * would mis-frame values that themselves contain the sentinel
    * (control characters do occur in scraped corpus text).
    */
  def rowFingerprint(cols: Seq[Column]): Column =
    md5(concat(cols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("n"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*))

  /** @return (idCol, status) with status in
    *         {'added','removed','changed','unchanged'}
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "hashCols must be non-empty")
    // filter AFTER the cast: an id that fails cast('long') must drop like
    // a null id, not ride into the join as a never-matching null key
    def keyed(df: DataFrame, h: String, id: String): DataFrame =
      df.select(col(idCol).cast("long").as(id),
          rowFingerprint(hashCols.map(col)).as(h))
        .filter(col(id).isNotNull)
    val oh = keyed(oldDf, "_d_ho", "_d_ido")
    val nh = keyed(newDf, "_d_hn", "_d_idn")
    oh.join(nh, col("_d_ido") === col("_d_idn"), "full_outer")
      .select(
        coalesce(col("_d_ido"), col("_d_idn")).as(idCol),
        when(col("_d_ho").isNull, "added")
          .when(col("_d_hn").isNull, "removed")
          .when(col("_d_ho") === col("_d_hn"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
