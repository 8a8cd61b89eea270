package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The MirrorMode polynomial string hash (`str_poly_hash(s)` via
  * [[graft.GraftExtensions]]): fold `acc = (acc·31 + codepoint) mod
  * 1000000007` over the characters of `s`, left to right — bit-identical to
  * the declarative formulation it replaces in [[graft.ext.TextDedup.strHash]]
  *
  * {{{ aggregate(filter(split(s, ""), c => c =!= ""),
  *               lit(0L), (acc, c) => pmod(acc * 31 + ascii(c), P)) }}}
  *
  * piece by piece: `split(s, "")` yields one piece per CODE POINT (Java's
  * regex engine splits between code points, keeping a surrogate pair whole)
  * plus a trailing empty piece (limit −1) that the filter drops; `ascii`
  * is `codePointAt(0)` of the piece. So the fold runs over the code points
  * of `s`, which is exactly what [[StrPolyHash.compute]] iterates.
  *
  * WHY: higher-order functions (`aggregate`/`filter`/`transform`) are
  * CodegenFallback — the old formulation paid interpreted lambda dispatch
  * plus a per-character array materialization for every shingle/word of
  * every MirrorMode document (q181/q188–q190/q195–q196), and dominated
  * q181's per-micro-batch fold. This expression is one static call per row
  * inside whole-stage codegen (the [[WordShingles]] pattern). Equality with
  * the declarative fold is pinned in ExtSpec on the real corpus plus
  * non-ASCII edge cases. */
case class StrPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"str_poly_hash requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "str_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    StrPolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrPolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StrPolyHash =
    copy(child = newChild)
}

object StrPolyHash {
  private val P = 1000000007L

  /** Runtime kernel shared by interpreted and generated code paths.
    * `acc·31 + cp` stays far below 2⁶³ (acc < 10⁹, cp ≤ 0x10FFFF), so the
    * plain `%` of non-negative operands equals the declarative `pmod`. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}
