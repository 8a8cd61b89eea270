package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance computation for product-quantized vectors
  * ([[graft.ext.Pq]]): given a corpus vector's PQ codes (one centroid index
  * per subspace) and a query's precomputed distance table (quantized
  * sub-distances to every centroid of every subspace, laid out
  * `s * ksub + j`), the approximate distance is `m` table lookups + adds
  * instead of `dim` multiplies — the scan-side economics that make PQ the
  * 100 TB ANN path (Jégou et al. 2011, "Product Quantization for Nearest
  * Neighbor Search").
  *
  * Table entries are integer-quantized (the fixed-point trick SIMD PQ
  * implementations use for uint8/uint16 tables — FAISS's
  * `IndexPQFastScan`), so the sum is exact integer arithmetic: associative,
  * partitioning-independent, and bit-identical in any engine — the oracle
  * can GROUP-BY-sum the same entries.
  */
object PqAdcAlgo {
  def adc(codes: ArrayData, table: ArrayData): Long = {
    val m = codes.numElements()
    if (m == 0) throw new IllegalArgumentException("pq_adc: empty code vector")
    val tn = table.numElements()
    if (tn % m != 0) throw new IllegalArgumentException(
      s"pq_adc: table length $tn not a multiple of code length $m")
    val ksub = tn / m
    var acc = 0L
    var s = 0
    while (s < m) {
      // explicit null-element check (same rationale as QuantizeAlgo.codes):
      // UnsafeArrayData would read garbage for a null slot, GenericArrayData
      // would NPE in the executor
      if (codes.isNullAt(s)) throw new IllegalArgumentException(
        s"pq_adc: null code at subspace $s")
      val j = codes.getInt(s)
      if (j < 0 || j >= ksub) throw new IllegalArgumentException(
        s"pq_adc: code $j out of range [0, $ksub) at subspace $s")
      val idx = s * ksub + j
      if (table.isNullAt(idx)) throw new IllegalArgumentException(
        s"pq_adc: null table entry at index $idx")
      acc += table.getLong(idx)
      s += 1
    }
    acc
  }
}

/** `pq_adc(array<int> codes, array<bigint> table)` → bigint quantized
  * asymmetric distance. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess // null ELEMENTS rejected at runtime
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<bigint> table), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(codes: Any, table: Any): Any =
    PqAdcAlgo.adc(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.PqAdcAlgo.adc($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
