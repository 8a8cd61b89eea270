package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native Catalyst aggregate
  * (`approx_top_k(expr, k)` via [[graft.GraftExtensions]]).
  *
  * The mergeable-summaries formulation (Misra & Gries 1982; Agarwal et al.
  * 2013, "Mergeable Summaries" — both public): each partition keeps at most
  * `k` counters; overflow decrements all counters (update) or subtracts the
  * (k+1)-th largest count (merge). Guarantees after any sequence of updates
  * and merges over n rows:
  *
  *  - every item with true count > n/(k+1) IS present in the sketch
  *    (no false negatives above the threshold), and
  *  - each reported count underestimates the true count by at most n/(k+1).
  *
  * Scale story: this is the distributed heavy-hitter path — per-partition
  * sketches of fixed size `k` merge associatively on the driver-less
  * partial/final aggregation tree, so corpus-frequency top-k costs ONE
  * pass and O(k) state per partition instead of a full-vocabulary shuffle
  * (the exact baseline, `TextAnalysis.heavyHitterNgrams`, is the oracle
  * in ApproxTopKSpec and q73).
  *
  * Output: `array<struct<item: string, count_lb: bigint>>` sorted by
  * count descending, item ascending — deterministic for a deterministic
  * partitioning, and the guaranteed-heavy subset is partitioning-invariant
  * (the property q73's oracle checks).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  // misuse fails at analysis time, not as an executor ClassCastException
  // (update casts the input to UTF8String)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"approx_top_k requires a STRING column, got ${child.dataType.sql}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"approx_top_k: k must be >= 1, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // decrement-all: drop zeroed counters; the arriving item is absorbed
        // by the decrement (classic MG step)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive (mergeable-
      // summaries rule: error stays <= n/(k+1) after any merge tree)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - sub)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_lb", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "approx_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Resolve `approx_top_k(expr, k)` — `k` must be a foldable integer. */
  def fromFunctionCall(children: Seq[Expression]): MisraGriesAgg = {
    require(children.length == 2, "approx_top_k(expr, k) takes 2 arguments")
    require(children(1).foldable,
      "approx_top_k: k must be a constant (foldable) integer")
    val kv = children(1).eval(InternalRow.empty)
    require(kv != null, "approx_top_k: k must be a constant integer")
    MisraGriesAgg(children(0), kv.asInstanceOf[Number].intValue())
  }
}
