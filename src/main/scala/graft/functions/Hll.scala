package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketches as first-class columns — the mergeable
  * cardinality state behind [[graft.graph.HyperBall]] (Boldi & Vigna 2013:
  * neighborhood functions / centralities at scale are HLL unions along
  * edges). Spark's own `approx_count_distinct` keeps its sketch internal
  * to one aggregate; these expressions expose the registers so ITERATIVE
  * algorithms can carry, merge, and re-estimate them across rounds:
  *
  *  - `hll_init(id, p)`    → `array<byte>` of 2^p registers, one set
  *  - `hll_merge(sketch)`  → aggregate: element-wise register max
  *  - `hll_count(sketch)`  → the standard HLL estimate (with the
  *    linear-counting small-range correction)
  *
  * Register max is associative, commutative, and idempotent, so every
  * merge result — and therefore every estimate — is exactly
  * partitioning-independent (asserted in HyperBallSpec), unlike
  * double-summing aggregates.
  */
object HllAlgo {
  def init(id: Long, p: Int): ArrayData = {
    val m = 1 << p
    val regs = new Array[Byte](m)
    val h = XXH64.hashLong(id, 42L)
    val idx = (h & (m - 1)).toInt
    // rank of the first 1-bit in the remaining 64-p bits (HLL++ rho)
    val w = h >>> p
    val rho = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfTrailingZeros(w) + 1
    regs(idx) = rho.toByte
    UnsafeArrayData.fromPrimitiveArray(regs)
  }

  def count(regs: ArrayData): Double = {
    val m = regs.numElements()
    require(m >= 16, s"hll_count: need >= 16 registers, got $m")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs.getByte(i).toInt
      invSum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}

/** `hll_init(bigint id, int p)` → `array<byte>` sketch with one register set. */
case class HllInit(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "hll_init"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, IntegerType) if right.foldable =>
        val p = right.eval().asInstanceOf[Int]
        if (p >= 4 && p <= 14) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: p must be in [4, 14], got $p")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint id, literal int p), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override protected def nullSafeEval(id: Any, p: Any): Any =
    HllAlgo.init(id match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }, p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, p) => s"graft.functions.HllAlgo.init((long) $id, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllInit =
    copy(left = newLeft, right = newRight)
}

/** `hll_count(array<byte> sketch)` → double cardinality estimate. */
case class HllCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "hll_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<byte> registers, got $t")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(regs: Any): Any =
    HllAlgo.count(regs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllAlgo.count($c)")

  override protected def withNewChildInternal(newChild: Expression): HllCount =
    copy(child = newChild)
}

/** `hll_merge(array<byte>)` aggregate: element-wise register max per group.
  * Buffer is one register array (sized on first input), constant state at
  * any group size; partial (map-side) combine applies. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    if (buf.isEmpty) return other.clone()
    require(buf.length == other.length,
      s"hll_merge: register count mismatch (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else maxInto(buf, v.asInstanceOf[ArrayData].toByteArray())
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf else maxInto(buf, other)

  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) null else UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}
