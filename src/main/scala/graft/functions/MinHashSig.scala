package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_sig(array<string> shingles, int numPerm)` → `array<bigint>`:
  * the MinHash signature (Broder's min-wise hashing) in ONE pass over the
  * shingle array — the hot-path replacement for the declarative
  *
  *   `transform(sequence(0, p−1), s -> array_min(transform(sh, x -> xxhash64(x, s))))`
  *
  * whose nested higher-order functions are CodegenFallback with per-element
  * lambda plumbing AND allocate numPerm intermediate hash arrays per row.
  * This expression is bit-identical to that formulation by construction:
  * per element it computes `h1 = XXH64(bytes, seed=42)` (what
  * `xxhash64(x, …)` folds first) then `XXH64.hashInt(s, h1)` per
  * permutation (the fold of the int lambda variable), taking the running
  * min — the exact same multi-arg xxhash64 fold, so signatures, bands and
  * buckets are unchanged anywhere the old form was used (MinHashSigSpec
  * pins equality, including null elements — folded as just the int, the
  * multi-arg hash's null-skip — the empty array → all-null signature of
  * `array_min(empty) = NULL`, and the NULL array → all-null signature:
  * the old form's outer transform ran over the non-null `sequence`, so a
  * null shingle array produced `[NULL × p]`, not NULL — null-text docs
  * band together as candidates rather than silently vanishing).
  *
  * One pass over elements × a tight numPerm inner loop of `XXH64.hashInt`
  * on primitives: no allocation beyond the output array. numPerm must be
  * a foldable positive int (it shapes the output array). */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // never NULL: a null/empty shingle array yields the all-null signature
  // (the declarative form's outer transform ran over the non-null sequence)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val p = right.eval(null)
      if (p != null && p.asInstanceOf[Int] >= 1 && p.asInstanceOf[Int] <= 1024)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numPerm must be a literal in [1, 1024], got $p")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int literal), got ($l, $r)")
  }

  private lazy val numPerm: Int = right.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) {
      // old form: transform(sequence(0,p−1), s -> array_min(transform(NULL,…)))
      // = [NULL × p] — the outer transform runs over the non-null sequence
      return new GenericArrayData(new Array[Any](numPerm))
    }
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) {
      // array_min over an empty transform is NULL per permutation
      return new GenericArrayData(new Array[Any](numPerm))
    }
    val out = new Array[Long](numPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64(x, s) = fold over [x, s] from seed 42; a null x is
      // skipped by the multi-arg hash, leaving h1 = 42
      val h1 =
        if (a.isNullAt(i)) 42L
        else {
          val s = a.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var p = 0
      while (p < numPerm) {
        val h = XXH64.hashInt(p, h1)
        if (h < out(p)) out(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}
