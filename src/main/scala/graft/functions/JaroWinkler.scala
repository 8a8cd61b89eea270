package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Winkler 1990, public algorithm) — the
  * default fuzzy string comparison of the reference's entity-resolution
  * stage (Splink 2.x comparison levels,
  * `/root/reference/03_aml_entity_resolution.py:39-53`; SURVEY.md §2.8).
  *
  * Standard parameters: scaling factor p = 0.1, prefix bonus capped at 4
  * characters, no boost threshold.
  */
object JaroWinklerAlgo {

  def similarity(l: UTF8String, r: UTF8String): Double =
    similarity(l.toString, r.toString)

  def similarity(s1: String, s2: String): Double = {
    val jaro = jaroSimilarity(s1, s2)
    var prefix = 0
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def jaroSimilarity(s1: String, s2: String): Double = {
    val (len1, len2) = (s1.length, s2.length)
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(0, math.max(len1, len2) / 2 - 1)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, counted halved
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0
  }
}

/** Catalyst expression wrapper: null-safe, whole-stage-codegen'd via a static
  * call (the same pattern as Spark's built-in `Levenshtein`). Registered as
  * SQL function `jaro_winkler` by [[graft.GraftExtensions]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaroWinklerAlgo.similarity($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
