package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(value, filter_bytes)` — probe a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public spark-sketch
  * API, same sketch `DataFrameStatFunctions.bloomFilter` builds).
  *
  * The filter argument must be a foldable binary (a literal of the
  * serialized sketch): it is deserialized ONCE — lazily for interpreted
  * eval, at compile time for codegen, where the filter object is installed
  * as a codegen reference so the generated row loop is a single
  * `mightContainLong` call with zero per-row deserialization. This is the
  * same shape as Spark's own runtime-filter probe; reimplemented here from
  * the public Expression API so the engine can bloom-prune *explicitly*
  * (see [[graft.ext.BloomJoin]]) rather than relying on the optimizer's
  * own injected filters.
  *
  * False positives pass the probe (by Bloom design); false negatives are
  * impossible — callers re-verify with an exact join when exactness
  * matters.
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      if (right.dataType == BinaryType && right.foldable)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter must be a foldable BINARY literal")
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain value must be integral, got ${t.sql}")
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(value: Any, ignored: Any): Any =
    filter.mightContainLong(value.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      (value, _) => s"${ev.value} = $ref.mightContainLong((long) $value);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
