package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: parallel (id, score) arrays kept sorted
  * (score DESC, id ASC), length ≤ k. Insertion into a tiny array beats
  * a heap for ANN-sized k (≤ ~100) and serializes flat.
  *
  * Ordering uses Double.compare, so NaN sorts above every value and
  * equal to itself (falling through to the id tie-break) — identical to
  * Spark's descending sort and to functions.TopK, keeping results
  * byte-equal to the window row_number formulation even under ties. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  /** (score, id) strictly ahead of (score2, id2) in the retained order. */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(id: Long, score: Double): Unit = {
    if (n == k && better(scores(n - 1), ids(n - 1), score, id)) return
    var idx = 0
    while (idx < n && better(scores(idx), ids(idx), score, id)) idx += 1
    if (idx >= k) return
    val last = math.min(n, k - 1)
    var j = last
    while (j > idx) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    ids(idx) = id
    scores(idx) = score
    if (n < k) n += 1
  }
}

/** Native bounded top-k aggregate: the same shuffle contract as
  * functions.TopK (map-side combine ships at most k candidates per
  * partition per group) but over unsafe rows — no Dataset
  * `.map`-to-case-class hop, so the ANN scoring pipeline above it stays
  * inside whole-stage codegen (no DeserializeToObject /
  * SerializeFromObject in the plan; PlanQualitySpec pins this).
  * Output: array<struct<id:bigint, score:double>>, (score DESC, id ASC). */
case class TopKAggregate(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"topk requires k > 0, got $k")

  // analysis-time typing: an int id / float score coerces here instead
  // of ClassCastException-ing in update() at runtime (AbstractDataType
  // is private[sql]; Seq[DataType] narrows the override covariantly)
  override def inputTypes: Seq[DataType] = Seq(LongType, DoubleType)
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "heap_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buffer.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buffer.insert(other.ids(i), other.scores(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buffer.n) { i =>
      new GenericInternalRow(Array[Any](buffer.ids(i), buffer.scores(i)))
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.ids(i)); bb.putDouble(buffer.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    buf.n = bb.getInt()
    var i = 0
    while (i < buf.n) { buf.ids(i) = bb.getLong(); buf.scores(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKAggregate {
  /** Column form: `heapTopKAgg(id, score, k)` for use in `agg(...)`. */
  def heapTopKAgg(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAggregate(ColumnBridge.expression(id), ColumnBridge.expression(score), k)
        .toAggregateExpression())
}
