package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` over a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]], carried as its
  * serialized bytes and deserialized lazily once per JVM — the same
  * shape Spark's own runtime-filter injection gives a shuffle join,
  * exposed as a library operator so a pipeline can prune a fact scan
  * against a dimension key set explicitly (a 1 MB filter standing in
  * for a multi-GB semi-join shuffle at 100 TB).
  *
  * Codegen references the expression instance itself
  * (`addReferenceObj`) and calls [[mightContain]], so the generated
  * code never re-parses the byte image per row; the byte array (not
  * the filter object) is what serializes to executors.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects an integral key column, got $t")
  }

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(bloomBytes)

  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => mightContain(l)
    case i: java.lang.Integer => mightContain(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain((long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContain(bytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bytes))
}
