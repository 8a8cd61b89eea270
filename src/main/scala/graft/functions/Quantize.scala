package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the standard 4×
  * compression path for vector corpora at the 100 TB scale (an
  * `array<float>` embedding becomes an `array<byte>` of codes; per-vector
  * symmetric max-abs scaling, cosine is scale-invariant so similarity
  * search runs on the codes directly).
  *
  * Determinism contract: `code_i = floor(x_i * 127.0 / maxabs + 0.5)` in
  * double arithmetic (float inputs widened exactly), which the DuckDB
  * oracle replicates op-for-op — `floor(+0.5)` is used instead of
  * `round()` because Scala's `math.round` (half-up) and DuckDB's `round`
  * (half-away-from-zero) disagree on negative halves. Codes are exact
  * integers in [-127, 127]; integer dot products accumulate in `long`
  * (max 127²·dim, nowhere near overflow) so [[QuantizeAlgo.cosineI8]] is
  * bit-identical across engines and partitionings.
  */
object QuantizeAlgo {

  def codes(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      // explicit null-element check: UnsafeArrayData would otherwise read
      // garbage for a null slot and GenericArrayData would NPE in the
      // executor — both worse than a clean error at the offending row
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"quantize_i8: null element at index $i — embeddings must be dense")
      val a = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs > 0.0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = math.floor(x * 127.0 / maxabs + 0.5).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Cosine over int8 code vectors; exact integer accumulation, 0.0 when
    * either side is the zero vector (a zero input quantizes to all-zero
    * codes). Mismatched dimensions are an error, not a silent truncation —
    * a truncated cosine is a plausible-but-wrong score. */
  def cosineI8(a: ArrayData, b: ArrayData): Double = {
    val n = VectorAlgo.sameDim("cosine_i8", a, b)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong; val y = b.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** `quantize_i8(array<float|double>)` → `array<tinyint>` codes. */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_i8"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    QuantizeAlgo.codes(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeAlgo.codes($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

/** `cosine_i8(array<tinyint>, array<tinyint>)` — codegen'd cosine over
  * quantized codes. */
case class CosineI8(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "cosine_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<tinyint> code vectors, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizeAlgo.cosineI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantizeAlgo.cosineI8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineI8 =
    copy(left = newLeft, right = newRight)
}
