package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Element-wise vector subtraction — the residual step of IVF-PQ
  * ([[graft.ext.IvfPq]]): `r = v − centroid`. A codegen'd expression
  * because `zip_with` is CodegenFallback and the residual is computed once
  * per corpus vector on the encode path. Floats widen exactly to double,
  * so mixed float/double inputs produce the same bits as widening first —
  * matching the DuckDB oracle's `::DOUBLE[]` arithmetic. */
object VecSubAlgo {
  private def get(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  def sub(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): ArrayData = {
    val n = VectorAlgo.sameDim("vec_sub", a, b)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_sub: null element at index $i — vectors must be dense")
      out(i) = get(a, i, aFloat) - get(b, i, bFloat)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `vec_sub(array<float|double>, array<float|double>)` → `array<double>`. */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_sub"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> vectors, got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecSubAlgo.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecSubAlgo.sub($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}
