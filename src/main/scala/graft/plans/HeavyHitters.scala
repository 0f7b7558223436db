package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra/Gries 1982; mergeability:
  * Agarwal et al., PODS 2012): at most `m` counters per buffer.
  *
  *   update: known item → +1; room → insert at 1; full → decrement ALL
  *           counters (dropping zeros) — the classic m-way cancel.
  *   merge:  sum counters pairwise, then if > m survive, subtract the
  *           (m+1)-th largest count from all and keep positives —
  *           preserves the MG invariant under any merge tree.
  *
  * Guarantees after any partitioning/merge order over n rows:
  *   est(x) ≤ true(x)            (never overestimates)
  *   true(x) − est(x) ≤ n/(m+1)  (bounded undercount)
  * so every item with true frequency > n/(m+1) is RETAINED — the
  * sketch cannot false-negative a real heavy hitter. Which light items
  * also linger (and their exact estimates) legitimately depends on
  * merge order; only the guarantees are deterministic, so oracled
  * queries must emit guarantee BOOLEANS, not raw estimates.
  *
  * 100 TB shape: fixed m·(string+8B) state per partition regardless of
  * input size or cardinality — the map-side combine ships ≤ m counters
  * per partition where an exact groupBy(term) shuffles the full
  * vocabulary. The standard first pass for "top domains / hot tokens"
  * over a corpus too wide to count exactly.
  */
final class MgBuffer(val m: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < m => counts.update(item, 1L)
      case None =>
        // decrement-all: one occurrence of each of m+1 distinct items
        // (the m tracked + this one) cancels out
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def mergeIn(other: MgBuffer): Unit = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > m) {
      // subtract the (m+1)-th largest count from everything
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - m - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** `mg_heavy_hitters(item, m)` → array<struct<item:string,est:bigint>>
  * sorted est DESC, item ASC (deterministic rendering of whatever
  * counter set survived). */
case class MgAggregate(
    itemExpr: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with ImplicitCastInputTypes {

  require(m > 0, s"mg_heavy_hitters requires m > 0, got $m")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mg_heavy_hitters"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(m)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val item = itemExpr.eval(input)
    // .toString copies out of the reused UTF8String scan buffer
    if (item != null) buffer.add(item.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val entries = buffer.counts.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val items = buffer.counts.toArray
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + items.length * 12 + bytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.m)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(items(i)._2); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt(); val arr = new Array[Byte](len); bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgAggregate =
    copy(itemExpr = newChildren(0))
}

object HeavyHitters {
  /** Column form for `agg(...)`. */
  def mgHeavyHitters(item: Column, m: Int): Column =
    ColumnBridge.column(
      MgAggregate(ColumnBridge.expression(item), m).toAggregateExpression())
}
