package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Symmetric int8 embedding quantization: per-vector scale =
  * max|x| / 127, q_i = round(x_i / scale) in [-127, 127] — the standard
  * storage/bandwidth reduction for embedding corpora (4x smaller than
  * float32, 8x smaller than float64; distance computations over int8 are
  * also SIMD-friendlier downstream).
  *
  * Pure per-row expression work: zero shuffle, and every step is plain
  * ANSI arithmetic, so stored quantized vectors can be re-derived and
  * audited by any SQL engine (same portability contract as the md5 token
  * hashes). Zero vectors quantize to all-zero with scale 0 — never a
  * division by zero.
  */
object Quantize {

  /** Per-vector quantization scale: max|x| / 127 (0.0 for zero/empty). */
  def int8Scale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0.0)) / 127.0

  /** Quantized int8 codes (as an int array; the parquet writer narrows). */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L), least(lit(127L),
          round(x / s, 0).cast("long")))).cast("int"))
  }

  /** One scalar pass computing (id, scale, q_sum, mse) per vector — the
    * performance path. The expression forms above re-evaluate the scale
    * subtree per element when interpreted (higher-order lambdas see no
    * common-subexpression elimination), turning O(d) into O(d²) per row;
    * this pass is O(d) and bit-identical: same max-fold, same
    * BigDecimal(HALF_UP) rounding as Spark's round(), same element-order
    * error fold (QuantizeParity in TrainingDataSpec pins it).
    */
  def quantizeStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                    vecCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        var mx = 0.0
        var i = 0
        while (i < v.length) { val a = math.abs(v(i)); if (a > mx) mx = a; i += 1 }
        val scale = mx / 127.0
        var qSum = 0L
        var sqErr = 0.0
        i = 0
        while (i < v.length) {
          val q =
            if (scale == 0.0) 0L
            else math.max(-127L, math.min(127L,
              java.math.BigDecimal.valueOf(v(i) / scale)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
          qSum += q
          val e = v(i) - q.toDouble * scale
          sqErr += e * e
          i += 1
        }
        val mse = if (v.length > 0) sqErr / v.length else 0.0
        (id, scale, qSum, mse)
      })
      .toDF(idCol, "scale", "q_sum", "mse")
  }

  /** Mean squared reconstruction error of the quantization, folded in
    * element order (deterministic, oracle-reproducible).
    */
  def int8Mse(vec: Column): Column = {
    val s = int8Scale(vec)
    val sqErr = aggregate(vec, lit(0.0), (acc, x) => {
      val q = when(s === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L), least(lit(127L),
          round(x / s, 0).cast("long"))))
      val e = x - q.cast("double") * s
      acc + e * e
    })
    when(size(vec) > 0, sqErr / size(vec).cast("double")).otherwise(lit(0.0))
  }
}
