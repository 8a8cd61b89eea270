package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Double Metaphone phonetic encoding (Philips 2000, public algorithm) via
  * Apache commons-codec, which ships on Spark's runtime classpath — the
  * stronger phonetic comparison splink exposes beside soundex for
  * entity-resolution comparison levels
  * (`/root/reference/03_aml_entity_resolution.py:39-53`; SURVEY.md §2.8).
  * `doubleMetaphone` is stateless per call, so one shared encoder is
  * thread-safe across executor tasks. */
object DoubleMetaphoneAlgo {
  private val dm = new org.apache.commons.codec.language.DoubleMetaphone
  def encode(s: UTF8String): UTF8String =
    UTF8String.fromString(dm.doubleMetaphone(s.toString))
  def encodeAlternate(s: UTF8String): UTF8String =
    UTF8String.fromString(dm.doubleMetaphone(s.toString, true))
}

/** Catalyst expression: null-safe, whole-stage-codegen'd via a static call
  * (same pattern as [[JaroWinkler]]). Registered as SQL functions
  * `double_metaphone` / `double_metaphone_alt` by [[graft.GraftExtensions]].
  * `alternate` selects Double Metaphone's secondary code, which captures
  * ethnic-variant pronunciations. */
case class DoubleMetaphoneExpr(child: Expression, alternate: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String =
    if (alternate) "double_metaphone_alt" else "double_metaphone"

  override protected def nullSafeEval(input: Any): Any =
    if (alternate) DoubleMetaphoneAlgo.encodeAlternate(input.asInstanceOf[UTF8String])
    else DoubleMetaphoneAlgo.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (alternate) "encodeAlternate" else "encode"
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleMetaphoneAlgo.$method($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DoubleMetaphoneExpr =
    copy(child = newChild)
}
