package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-score buffer: parallel arrays sorted best-first
  * (score descending, id ascending tiebreak), never more than k entries.
  * Insertion is a linear scan + shift — k is single-digit in every
  * caller, so this beats heap bookkeeping.
  */
final class TopKBuffer(val k: Int) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  /** rank order: (score desc, id asc), TOTAL — NaN ranks strictly worst
    * (a NaN similarity is a broken input, never a best neighbour), with
    * the id tiebreak still applying among NaNs. Without the explicit NaN
    * arms, `>`/`==` are both false against NaN and the buffer order
    * becomes arrival-dependent. Returns true if (s1,id1) ranks strictly
    * better than (s2,id2).
    */
  @inline private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) (!n1 && n2) || (n1 && n2 && id1 < id2)
    else s1 > s2 || (s1 == s2 && id1 < id2)
  }

  def insert(id: Long, score: Double): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    // position of the new entry among the current n (all better ones stay)
    var pos = n
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    val last = math.min(n, k - 1) // entry k-1 falls off when full
    var i = last
    while (i > pos) { ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1 }
    ids(pos) = id; scores(pos) = score
    if (n < k) n += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.scores(i)); i += 1 }
  }
}

/** Native bounded top-k-by-score aggregate (SURVEY §4.2 ladder (b): a
  * custom Catalyst aggregate where the built-ins can't express the
  * semantics efficiently). `row_number().over(partitionBy(g).orderBy
  * (score))`+`filter(<= k)` must shuffle EVERY candidate row; this
  * TypedImperativeAggregate participates in partial aggregation
  * (ObjectHashAggregate), so each group is truncated to k rows on the
  * map side and the exchange carries at most k rows per (group, input
  * partition) — a shuffle that scales with the ANSWER, not the pair
  * space. Winners (score desc, id asc, ties included) are identical to
  * the window form for REAL-VALUED, NON-NULL inputs, so oracle hashes
  * carry over; deliberate divergences (shared with the typed fallback):
  * NaN scores rank strictly worst where `ORDER BY score DESC` would put
  * them first, and null ids/scores are skipped like any SQL aggregate
  * where the window form would rank them.
  *
  * Registered as `graft_topk_by_score(id, score, k)` by GraftExtensions;
  * returns array<struct<id:bigint, score:double>> best-first.
  */
case class TopKByScoreNative(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!third.foldable)
      TypeCheckResult.TypeCheckFailure("k must be a constant")
    else if (first.dataType != LongType || second.dataType != DoubleType ||
      !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(third.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_by_score expects (bigint, double, const int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    else if (third.eval() == null)
      TypeCheckResult.TypeCheckFailure("k must not be null")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true
  override def prettyName: String = "graft_topk_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = first.eval(input)
    val score = second.eval(input)
    if (id != null && score != null)
      b.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = new GenericInternalRow(Array[Any](b.ids(i), b.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    // entries were serialized best-first, so inserts keep that order
    while (i < n) { b.insert(bb.getLong, bb.getDouble); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreNative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreNative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKByScoreNative =
    copy(first = newFirst, second = newSecond, third = newThird)
}
