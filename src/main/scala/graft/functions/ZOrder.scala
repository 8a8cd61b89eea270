package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value for multi-dimensional data clustering —
  * the standard 100 TB data-layout lever: sort/range-partition a table by
  * the interleaved bits of several columns and parquet row-group min/max
  * stats become selective on EVERY interleaved dimension at once, so
  * pushed-down predicates on any of them skip most of the scan (the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; here as a plain
  * codegen'd expression usable with `repartitionByRange` +
  * `sortWithinPartitions` — see `engine.Sources.zOrderLayout`).
  *
  * Determinism contract (oracle-replicable in pure SQL bit arithmetic):
  * with n columns, each value contributes its low `bits = 63 / n` bits,
  * LSB-first and column-major — bit `b` of column `j` lands at output
  * position `b*n + j`. Inputs must be integral, non-negative and
  * `< 2^bits`; out-of-range values are an error, not a silent mask (a
  * masked coordinate aliases distant rows into one locality bucket —
  * plausible-but-wrong layout). Callers bin wide/typed domains first
  * (`Sources.widthBucket` for numeric/date ranges, `pmod` for hashes).
  */
object ZOrderAlgo {

  def interleave(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    var j = 0
    while (j < n) {
      val x = xs(j)
      if (x < 0L || x >= (1L << bits)) throw new IllegalArgumentException(
        s"z_value: input $j out of range [0, 2^$bits) for $n columns: $x — " +
          "bin inputs first (width_bucket / pmod)")
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      j = 0
      while (j < n) {
        out |= ((xs(j) >> b) & 1L) << (b * n + j)
        j += 1
      }
      b += 1
    }
    out
  }
}

/** `z_value(c1, c2[, ... c6])` → `bigint` Morton code (see [[ZOrderAlgo]]). */
case class ZValue(children: Seq[Expression]) extends Expression {
  override def prettyName: String = "z_value"

  private def n: Int = children.size
  private def bits: Int = 63 / n

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 2 || n > 6)
      TypeCheckResult.TypeCheckFailure(s"$prettyName takes 2-6 columns, got $n")
    else children.map(_.dataType).zipWithIndex.collectFirst {
      case (t, i) if !Seq(ByteType, ShortType, IntegerType, LongType).contains(t) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName argument $i must be integral, got $t")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v match {
        case b: java.lang.Byte => b.longValue()
        case s: java.lang.Short => s.longValue()
        case x: java.lang.Integer => x.longValue()
        case l: java.lang.Long => l.longValue()
      }
      i += 1
    }
    ZOrderAlgo.interleave(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("zvals")
    val evals = children.map(_.genCode(ctx))
    if (nullable) {
      val assigns = evals.zipWithIndex.map { case (e, i) =>
        s"""${e.code}
           |if (!${ev.isNull}) {
           |  if (${e.isNull}) { ${ev.isNull} = true; }
           |  else { $arr[$i] = (long)(${e.value}); }
           |}""".stripMargin
      }.mkString("\n")
      ev.copy(code = code"""
        |boolean ${ev.isNull} = false;
        |long[] $arr = new long[$n];
        |$assigns
        |long ${ev.value} = -1L;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.ZOrderAlgo.interleave($arr, $bits);
        |}""".stripMargin)
    } else {
      val assigns = evals.zipWithIndex.map { case (e, i) =>
        s"""${e.code}
           |$arr[$i] = (long)(${e.value});""".stripMargin
      }.mkString("\n")
      ev.copy(isNull = FalseLiteral, code = code"""
        |long[] $arr = new long[$n];
        |$assigns
        |long ${ev.value} = graft.functions.ZOrderAlgo.interleave($arr, $bits);
        |""".stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue = copy(children = newChildren)
}
