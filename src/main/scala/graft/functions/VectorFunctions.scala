package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector arithmetic for embedding columns.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — every row pays interpreted lambda dispatch. These
  * expressions run the same sequential loop (identical IEEE summation order,
  * so results are bit-identical to the HOF formulation and to the DuckDB
  * oracle's `list_dot_product`) inside whole-stage codegen via a static
  * helper, the pattern of Spark's own `Levenshtein`.
  */
object VectorAlgo {

  /** Shared dimension guard for the vector kernels: mismatched lengths are
    * an error (a truncated dot/cosine silently excludes the longer vector's
    * tail from its own norm — plausible but wrong), not a min-length walk. */
  def sameDim(op: String, a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$op: mismatched vector dimensions (${a.numElements()} vs ${b.numElements()})")
    n
  }

  /** dot(a,b) / (|a|·|b|), accumulated left-to-right in one pass. */
  def cosine(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = sameDim("cosine_sim", a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    } else {
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = sameDim("dot_product", a, b)
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  protected def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double>, " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def dataType: DataType = DoubleType
  protected def isFloat: Boolean = elementType(left).contains(FloatType)
}

/** `cosine_sim(array, array)` — codegen'd cosine similarity. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgo.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorAlgo.cosine($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(array, array)` — codegen'd dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorAlgo.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorAlgo.dot($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
