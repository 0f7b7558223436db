package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise sum of `array<long>` rows into one `array<long>` — the
  * fixed-point vector accumulator for the linear-algebra operators
  * (Pca covariance·v products, Align cross-covariance cells).
  *
  * Why it exists: the explode-then-groupBy formulation of a per-dim sum
  * materializes n·d (or n·d² for the outer-product case) generator rows
  * and shuffles a keyed aggregate; this aggregate folds each row's
  * d-cell array straight into a d-long buffer — one pass, map-side
  * combine ships exactly one d-cell array per partition, no generator,
  * no keyed exchange. Sums are exact int64 adds of already-quantized
  * 1e-12 fixed-point terms, so results are bit-identical to the
  * exploded formulation (integer addition is order-free).
  *
  * Contract: rows must agree on array length (a clear error otherwise —
  * ragged inputs silently mis-shape a covariance); NULL arrays and
  * empty arrays are skipped (the generator semantics: posexplode emits
  * nothing for them); NULL elements are illegal (quantized terms are
  * never null). Empty input ⇒ NULL (matches sum-of-nothing). */
final class LongVectorBuffer {
  var sums: Array[Long] = null

  def add(arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (n == 0) return
    if (sums == null) sums = new Array[Long](n)
    require(sums.length == n,
      s"long_vector_sum: ragged input — saw arrays of length ${sums.length} and $n")
    var i = 0
    while (i < n) { sums(i) += arr.getLong(i); i += 1 }
  }

  def mergeFrom(other: LongVectorBuffer): Unit = {
    if (other.sums == null) return
    if (sums == null) { sums = other.sums.clone(); return }
    require(sums.length == other.sums.length,
      s"long_vector_sum: ragged input — saw arrays of length ${sums.length} and ${other.sums.length}")
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
  }
}

case class LongVectorSumAggregate(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVectorBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_vector_sum"

  override def createAggregationBuffer(): LongVectorBuffer = new LongVectorBuffer

  override def update(buffer: LongVectorBuffer, input: InternalRow): LongVectorBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: LongVectorBuffer, other: LongVectorBuffer): LongVectorBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: LongVectorBuffer): Any =
    if (buffer.sums == null) null else new GenericArrayData(buffer.sums)

  override def serialize(buffer: LongVectorBuffer): Array[Byte] = {
    val n = if (buffer.sums == null) -1 else buffer.sums.length
    val bb = ByteBuffer.allocate(4 + math.max(0, n) * 8)
    bb.putInt(n)
    if (n > 0) { var i = 0; while (i < n) { bb.putLong(buffer.sums(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVectorBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new LongVectorBuffer
    val n = bb.getInt()
    if (n >= 0) {
      buf.sums = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVectorSumAggregate =
    copy(child = newChildren(0))
}

object VectorSumAggregate {
  /** Column form: `longVectorSumAgg(arrayOfLongs)` for use in `agg(...)`. */
  def longVectorSumAgg(arr: Column): Column =
    ColumnBridge.column(
      LongVectorSumAggregate(ColumnBridge.expression(arr)).toAggregateExpression())

  /** Column form: one power-iteration round — see [[PowerStepAggregate]]. */
  def powerStepAgg(xc: Column, v: Array[Double]): Column =
    ColumnBridge.column(
      PowerStepAggregate(ColumnBridge.expression(xc), v).toAggregateExpression())
}

/** One power-iteration round u ∝ C·v as a single aggregate pass: per
  * row, s = unfx(Σ_j fx(xc_j·v_j)) (the row's projection on the
  * current direction), then cell_j += fx(xc_j·s). Exactly the Pca
  * fixed-point recipe (fx = floor(x·1e12 + 0.5) as long, unfx =
  * long/1e12), so results are bit-identical to the explode + per-row
  * keyed join + groupBy(pos) formulation it replaces — with ONE corpus
  * pass, no n·d generator rows, no join, no keyed exchange (map-side
  * combine ships one d-cell array per partition).
  *
  * `v` is a plain constructor argument (the d-vector of the current
  * round — O(d) driver state, the broadcast-ML-loop stance), not a
  * child expression, so each round's literal never enters codegen.
  * NULL/empty rows are skipped (explode semantics); a row whose length
  * differs from v's is a clear error (ragged corpora silently corrupt
  * a covariance product). */
case class PowerStepAggregate(
    xcExpr: Expression,
    v: Array[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVectorBuffer] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType, containsNull = false))
  override def children: Seq[Expression] = Seq(xcExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "power_step"

  @inline private def fx(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong

  override def createAggregationBuffer(): LongVectorBuffer = new LongVectorBuffer

  override def update(buffer: LongVectorBuffer, input: InternalRow): LongVectorBuffer = {
    val raw = xcExpr.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (d > 0) {
        require(d == v.length,
          s"power_step: ragged input — vector of length $d against direction of length ${v.length}")
        if (buffer.sums == null) buffer.sums = new Array[Long](d)
        var s9 = 0L
        var j = 0
        while (j < d) { s9 += fx(arr.getDouble(j) * v(j)); j += 1 }
        val s = s9.toDouble / 1e12
        j = 0
        while (j < d) { buffer.sums(j) += fx(arr.getDouble(j) * s); j += 1 }
      }
    }
    buffer
  }

  override def merge(buffer: LongVectorBuffer, other: LongVectorBuffer): LongVectorBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: LongVectorBuffer): Any =
    if (buffer.sums == null) null else new GenericArrayData(buffer.sums)

  override def serialize(buffer: LongVectorBuffer): Array[Byte] = {
    val n = if (buffer.sums == null) -1 else buffer.sums.length
    val bb = ByteBuffer.allocate(4 + math.max(0, n) * 8)
    bb.putInt(n)
    if (n > 0) { var i = 0; while (i < n) { bb.putLong(buffer.sums(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVectorBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new LongVectorBuffer
    val n = bb.getInt()
    if (n >= 0) {
      buf.sums = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PowerStepAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PowerStepAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PowerStepAggregate =
    copy(xcExpr = newChildren(0))
}
