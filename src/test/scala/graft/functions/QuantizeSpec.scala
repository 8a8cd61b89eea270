package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.Similarity

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def codesOf(v: Seq[Float]): Seq[Byte] =
    Seq(Tuple1(v)).toDF("v")
      .select(call_function("quantize_i8", col("v")).as("c"))
      .as[Seq[Byte]].head()

  private def qCosine(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("cosine_i8",
        call_function("quantize_i8", col("a")),
        call_function("quantize_i8", col("b"))).as("c"))
      .as[Double].head()

  test("codes match the hand-computed floor(x*127/maxabs + 0.5) contract") {
    // maxabs = 1.0: 1.0 -> 127; -0.5 -> floor(-63.5+0.5) = -63 (NOT -64,
    // the half-away-from-zero answer); 0.25 -> floor(31.75+0.5) = 32; 0 -> 0
    assert(codesOf(Seq(1.0f, -0.5f, 0.25f, 0.0f)) == Seq[Byte](127, -63, 32, 0))
    // the max-magnitude element always hits ±127 exactly
    assert(codesOf(Seq(-3.5f, 1.75f)) == Seq[Byte](-127, 64))
  }

  test("zero vector quantizes to all-zero codes and cosine_i8 returns 0.0") {
    assert(codesOf(Seq(0.0f, 0.0f, 0.0f)) == Seq[Byte](0, 0, 0))
    assert(qCosine(Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)) == 0.0)
  }

  test("quantization is invariant under power-of-two scaling (exact IEEE)") {
    val v = Seq(0.31f, -0.97f, 0.02f, 0.55f, -0.001f)
    assert(codesOf(v) == codesOf(v.map(_ * 4.0f)))
  }

  test("identical vectors score cosine_i8 = 1 up to sqrt rounding") {
    val v = Seq(0.3f, -0.7f, 0.12f, 0.99f)
    assert(math.abs(qCosine(v, v) - 1.0) < 1e-12)
  }

  test("quantized cosine tracks exact cosine within the max-abs error bound") {
    // seeded vectors, dim 64, values in [-1, 1]: per-element quantization
    // error <= maxabs/254, so ||delta||/||v|| stays ~0.007 and the cosine
    // perturbation is well under 0.03
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(20)(Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    val pairs = for (a <- vecs; b <- vecs if a != b) yield (a, b)
    val df = pairs.toDF("a", "b").select(
      call_function("cosine_sim", col("a"), col("b")).as("exact"),
      call_function("cosine_i8",
        call_function("quantize_i8", col("a")),
        call_function("quantize_i8", col("b"))).as("quant"))
    val worst = df.select(max(abs(col("exact") - col("quant")))).as[Double].head()
    assert(worst < 0.03, s"worst quantized-cosine error $worst")
  }

  test("quantizedTopK ranks a planted exact-duplicate first") {
    // vec 100 is bit-identical to query 0 -> identical codes -> top neighbor
    val base = Array.fill(32)(0.5f)
    val rnd = new scala.util.Random(7)
    val corpus = (Seq((0L, base.toSeq), (100L, base.toSeq)) ++
      (1L to 50L).map(i => (i, Array.fill(32)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)))
      .toDF("vec_id", "embedding")
    val top = Similarity.quantizedTopK(
      corpus, corpus.filter(col("vec_id") === 0L), "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].collect()
    assert(top.sameElements(Array(100L)))
  }

  test("type misuse fails at analysis time, not in executors") {
    intercept[AnalysisException] {
      Seq("x").toDF("s").select(call_function("quantize_i8", col("s"))).collect()
    }
    intercept[AnalysisException] {
      Seq((Seq(1.0f), Seq(1.0f))).toDF("a", "b")
        .select(call_function("cosine_i8", col("a"), col("b"))).collect()
    }
  }
}
