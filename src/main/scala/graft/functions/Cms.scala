package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native mergeable
  * aggregate — point-frequency estimation under fixed memory, the
  * companion of the Misra–Gries top-k sketch ([[MisraGriesAgg]] answers
  * "what are the heavy items"; CMS answers "how often does THIS item
  * occur" for arbitrary probes):
  *
  *  - `cms_sketch(expr, depth, width)` → `array<bigint>` of depth·width
  *    counters (row-major); each row d increments position
  *    `xxhash64(item, seed=d) mod width`.
  *  - `cms_estimate(sketch, item, depth, width)` → the min over rows of
  *    the item's counter — an OVERESTIMATE, never under (the CMS
  *    one-sided guarantee), with `est − true ≤ e·N/width` in expectation
  *    per row and exponentially tight in `depth`.
  *
  * Parameter domain (BEHAVIOR CHANGE, round 7): `depth ∈ [1,16]`,
  * `width ∈ [16, 2^24]`, and — new — jointly `depth·width ≤ 2^26`
  * counters (512 MB serialized). Combinations that the per-parameter
  * bounds alone used to accept (e.g. depth 8 × width 2^24) are now
  * rejected at ANALYSIS time: the strict Int-overflow hazard only starts
  * past 2^28 counters, but 2^26 is already far beyond any sane per-group
  * sketch and failing early beats a shuffle-time serialization crash.
  * Callers that genuinely need a wider table should shard the keyspace
  * across groups, not widen one sketch.
  *
  * Unlike order-sensitive double aggregates, the sketch is a vector of
  * exact integer SUMS: bit-identical under any partitioning or merge
  * tree (counter addition is associative/commutative), so estimates are
  * fully deterministic per corpus. Scale story: O(depth·width) state per
  * partition, one pass, merge = element-wise add — the 100 TB frequency
  * table that never shuffles the corpus. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a STRING column, got ${child.dataType.sql}")
    else if (depth < 1 || depth > 16)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch: depth must be in [1, 16], got $depth")
    else if (width < 16 || width > (1 << 24))
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch: width must be in [16, 2^24], got $width")
    // joint bound: serialize() builds an 8·depth·width-byte buffer, so
    // every ACCEPTED parameter combination must stay well under the 2 GB
    // Int byte-array ceiling (depth=16 × width=2^24 would overflow
    // buf.length*8+4 to a negative size and crash at shuffle time).
    // 2^26 counters = 512 MB per sketch — already far past any sane
    // per-group sketch; reject, don't defer the failure to serialization.
    else if (depth.toLong * width > (1L << 26))
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch: depth*width must be <= 2^26 counters " +
          s"(512 MB serialized), got ${depth.toLong * width}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String]
    var d = 0
    while (d < depth) {
      buf(d * width + CmsAgg.slot(s, d, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

object CmsAgg {
  /** Row-d counter slot for an item: xxhash64 of the UTF-8 bytes with the
    * row index as the seed, floor-mod width (shared by sketch and
    * estimate — the hash family definition). */
  private[functions] def slot(s: UTF8String, d: Int, width: Int): Int = {
    val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes(), d.toLong)
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  private def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a constant (foldable) integer")
    val v = e.eval(InternalRow.empty)
    require(v != null, s"$what must be a constant integer")
    v.asInstanceOf[Number].intValue()
  }

  def fromFunctionCall(children: Seq[Expression]): CmsAgg = {
    require(children.length == 3,
      "cms_sketch(expr, depth, width) takes 3 arguments")
    CmsAgg(children(0), foldableInt(children(1), "cms_sketch: depth"),
      foldableInt(children(2), "cms_sketch: width"))
  }

  def estimateFromFunctionCall(children: Seq[Expression]): CmsEstimate = {
    require(children.length == 4,
      "cms_estimate(sketch, item, depth, width) takes 4 arguments")
    CmsEstimate(children(0), children(1),
      foldableInt(children(2), "cms_estimate: depth"),
      foldableInt(children(3), "cms_estimate: width"))
  }
}

/** `cms_estimate(sketch, item, depth, width)` — min over the sketch rows
  * of the item's counter. Scalar probe over an already-aggregated sketch
  * (k probe rows, not corpus rows), so CodegenFallback costs nothing on
  * the hot path. */
case class CmsEstimate(sketch: Expression, item: Expression,
    depth: Int, width: Int)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, item)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!sketch.dataType.isInstanceOf[ArrayType] ||
      sketch.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate: sketch must be ARRAY<BIGINT>, got ${sketch.dataType.sql}")
    else if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate: item must be STRING, got ${item.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val it = item.eval(input)
    if (sk == null || it == null) return null
    val arr = sk.asInstanceOf[ArrayData]
    require(arr.numElements() == depth * width,
      s"cms_estimate: sketch has ${arr.numElements()} counters, " +
        s"expected depth*width = ${depth * width}")
    val s = it.asInstanceOf[UTF8String]
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = arr.getLong(d * width + CmsAgg.slot(s, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsEstimate =
    copy(sketch = newChildren(0), item = newChildren(1))
}
