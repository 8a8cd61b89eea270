package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MinHashSigSpec extends SparkTestBase {
  import spark.implicits._

  // the declarative formulation minhash_sig replaces — kept here as the
  // reference semantics the expression must match bit-for-bit
  private def reference(shingles: org.apache.spark.sql.Column, numPerm: Int) =
    transform(sequence(lit(0), lit(numPerm - 1)),
      s => array_min(transform(shingles, x => xxhash64(x, s))))

  test("bit-identical to the nested higher-order xxhash64 formulation") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("hello world five gram", "x")),
      (3L, Seq("solo")),
      (4L, Seq.empty[String])
    ).toDF("id", "sh")
    val out = df.select(col("id"),
      call_function("minhash_sig", col("sh"), lit(8)).as("fast"),
      reference(col("sh"), 8).as("ref"))
    assert(out.where(not(col("fast") <=> col("ref"))).count() == 0)
    // empty shingle set -> all-null signature (array_min of empty = NULL)
    val empty = out.where(col("id") === 4L)
      .select(col("fast")).as[Seq[Option[Long]]].head()
    assert(empty.length == 8 && empty.forall(_.isEmpty))
  }

  test("null elements fold like the multi-arg hash's null skip") {
    val df = spark.sql(
      "SELECT array('x', CAST(NULL AS STRING), 'y') AS sh")
    val out = df.select(
      call_function("minhash_sig", col("sh"), lit(4)).as("fast"),
      reference(col("sh"), 4).as("ref"))
    assert(out.where(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("NULL shingle array yields the all-null signature, like the old form") {
    // transform(sequence(0,p−1), s -> array_min(transform(NULL, …))) is
    // [NULL × p] — the outer transform runs over the non-null sequence. A
    // NULL result instead would make null-text docs vanish from banding.
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS sh")
    val out = df.select(
      call_function("minhash_sig", col("sh"), lit(6)).as("fast"),
      reference(col("sh"), 6).as("ref"))
    assert(out.where(not(col("fast") <=> col("ref"))).count() == 0)
    val v = out.select(col("fast")).as[Seq[Option[Long]]].head()
    assert(v.length == 6 && v.forall(_.isEmpty))
  }

  test("minhashSignature resolves without the session function registry") {
    // the helper must build the native expression directly (Cols bridge),
    // not call_function — a session built WITHOUT GraftExtensions then
    // still resolves it (the registry path would throw at analysis)
    val e = graft.functions.Cols.expr(
      graft.ext.TextDedup.minhashSignature(col("sh"), 4))
    assert(e.isInstanceOf[MinHashSig],
      s"expected a direct MinHashSig expression, got ${e.getClass}")
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "sh")
    val out = df.select(
      graft.ext.TextDedup.minhashSignature(col("sh"), 4).as("fast"),
      reference(col("sh"), 4).as("ref"))
    assert(out.where(not(col("fast") <=> col("ref"))).count() == 0)
  }

  test("rejects non-literal or out-of-range numPerm") {
    val df = Seq((1L, Seq("a"))).toDF("id", "sh")
    intercept[Exception] {
      df.select(call_function("minhash_sig", col("sh"), lit(0))).collect()
    }
    intercept[Exception] {
      df.select(call_function("minhash_sig", col("sh"), col("id"))).collect()
    }
  }
}
