package graft.ops

import org.apache.spark.sql.DataFrame

/** Internal column-name hygiene shared by operators that add temp or
  * output columns to caller frames.
  */
private[graft] object Cols {

  /** A column name derived from `base` that collides with nothing in
    * `df` (case-insensitively — Spark resolution is case-insensitive by
    * default, so a same-name-different-case "fresh" column would still
    * clobber).
    */
  def fresh(df: DataFrame, base: String): String =
    fresh(df.columns.toSeq, base)

  /** As above over an explicit column set (e.g. the union of both sides
    * of a join, where the temp name must dodge either frame's columns).
    */
  def fresh(columns: Seq[String], base: String): String = {
    val taken = columns.map(_.toLowerCase).toSet
    Iterator.iterate(base)(_ + "_")
      .dropWhile(n => taken(n.toLowerCase)).next()
  }

  /** Minimal JSON string escaping for the sidecar files this package
    * writes by hand (manifest, shard indexes) — symmetric with any JSON
    * reader, including the package's own parsers.
    */
  def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }
}
