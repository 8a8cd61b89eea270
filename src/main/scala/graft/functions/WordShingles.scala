package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column as ONE in-row expression
  * (`word_shingles(text, n)` via [[graft.GraftExtensions]]): lowercase,
  * whitespace-split, then every run of `n` consecutive tokens joined by a
  * single space, in document order with duplicates kept.
  *
  * Replaces the window-function formulation of shingling (explode words →
  * `lead(w, k) over (partition by id order by pos)` → concat), which costs
  * a full shuffle+sort of the token table per call — this expression
  * computes the same strings with zero shuffle inside whole-stage codegen
  * (the generated code is a single static call per row, the same pattern
  * Spark's own regexp expressions use).
  *
  * Token semantics match `TextDedup.words` exactly: `split(lower(text),
  * '\s+')` with Java limit -1 (leading empty token preserved when the text
  * starts with whitespace), so swapping formulations cannot change any
  * oracle-checked shingle string. */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** SQL-registration factory (see [[graft.GraftExtensions]]): validates
    * arity and that `n` is a constant integer up front, so
    * `word_shingles(text)` or a non-foldable `n` fails with a clear
    * message at analysis time instead of an IndexOutOfBoundsException /
    * opaque eval error. */
  def fromFunctionCall(children: Seq[Expression]): WordShingles = {
    require(children.length == 2, "word_shingles(text, n) takes 2 arguments")
    require(children(1).foldable,
      "word_shingles: n must be a constant (foldable) integer")
    val nv = children(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(nv != null, "word_shingles: n must be a non-null constant integer")
    require(nv.isInstanceOf[Number],
      s"word_shingles: n must be an integer, got ${children(1).dataType.sql}")
    val n = nv.asInstanceOf[Number].intValue()
    require(n >= 1, s"word_shingles: n must be >= 1, got $n")
    WordShingles(children(0), n)
  }

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Runtime kernel shared by interpreted and generated code paths. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // identical to split(lower(text), '\s+'): UTF8String lowercasing, Java
    // regex split with limit -1
    val toks = Whitespace.split(text.toLowerCase.toString, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      if (n == 1) out(i) = UTF8String.fromString(toks(i))
      else {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out(i) = UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
