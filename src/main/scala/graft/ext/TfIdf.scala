package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse TF-IDF document vectors and the inverted-index cosine similarity
  * join over them — the lexical complement to the embedding-space
  * similarity operators in [[Similarity]] (dense ANN) and [[TextDedup]]
  * (set overlap): ranked *weighted* lexical similarity, the
  * `similarity_join` a corpus-curation pipeline runs to find re-writes and
  * templated boilerplate that exact/MinHash dedup misses.
  *
  * Determinism: IDF is quantized once per term —
  * `idf_q = floor(ln(N/df)·1000 + 0.5)` as BIGINT — and every downstream
  * sum (dot products, squared norms) is EXACT integer arithmetic, so
  * scores are independent of shuffle/aggregation order; only the final
  * `dot / (√n1·√n2)` touches doubles, through IEEE-identical ops.
  *
  * Scale shape: candidates come from the inverted index (equi-join on
  * term), with high-df terms dropped BEFORE the join (`dfCapRatio` — a term
  * in a constant fraction of an N-doc corpus fans out O(N²) pairs; rare
  * terms fan out O(df²) with df bounded). This is the standard df-cut from
  * the similarity-join literature (prefix filtering, Bayardo et al. 2007 —
  * dropping the highest-df terms bounds candidate generation while barely
  * moving cosine, since capped terms carry the lowest IDF weight).
  */
object TfIdf {

  /** Per-(doc, term) quantized TF-IDF weights after the df cut.
    * Tokenization matches [[TextAnalysis.tokens]] (lowercase,
    * whitespace-split) so the SQL mirror is exact.
    *
    * Two cuts compose: `dfCapRatio` (relative — the stop-word cut) and
    * `dfCapMax` (absolute — the candidate-volume bound). The ratio cut
    * alone does NOT bound join fan-out: per-term candidates are O(df²),
    * so at corpus scale a term just under `ratio·N` docs still emits
    * ~(ratio·N)² pairs. A production similarity join at 10⁹ docs sets
    * `dfCapMax` to a few thousand — candidates are then ≤ dfCapMax² per
    * term regardless of N (the measured q118 blow-up under ScaleCheck's
    * vocabulary-tagged growth arm is exactly the ratio-only failure). */
  def weights(docs: DataFrame, dfCapRatio: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text",
      dfCapMax: Long = Long.MaxValue): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfc, "term").crossJoin(broadcast(n))
      .where(col("df") <= col("n") * lit(dfCapRatio) &&
        col("df") <= lit(dfCapMax))
      .select(col("doc_id"), col("term"),
        (col("tf") *
          floor(log(col("n").cast("double") / col("df")) * lit(1000.0) +
            lit(0.5)).cast("long")).as("w"))
  }

  /** All document pairs with TF-IDF cosine ≥ `minCosine`, via the inverted
    * index. Output: (d1, d2, dot, cosine) with d1 < d2, cosine rounded. */
  def cosinePairs(docs: DataFrame, minCosine: Double = 0.5,
      dfCapRatio: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text", dfCapMax: Long = Long.MaxValue): DataFrame = {
    // the weights table feeds three consumers (both join sides + norms);
    // a lazy checkpoint computes the tokenize+tf+df cascade once instead
    // of three times (and keeps the final plan shallow)
    val kept = graft.graph.Checkpointer(docs.sparkSession, None)
      .lazily(weights(docs, dfCapRatio, idCol, textCol, dfCapMax))
    val norms = kept.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("n2"))
    val dots = kept.as("k1")
      .join(kept.as("k2"),
        col("k1.term") === col("k2.term") &&
          col("k1.doc_id") < col("k2.doc_id"))
      .groupBy(col("k1.doc_id").as("d1"), col("k2.doc_id").as("d2"))
      .agg(sum(col("k1.w") * col("k2.w")).as("dot"))
    dots
      .join(norms.as("n1"), col("d1") === col("n1.doc_id"))
      .join(norms.as("n2"), col("d2") === col("n2.doc_id"))
      .withColumn("cosine",
        col("dot") / (sqrt(col("n1.n2").cast("double")) *
          sqrt(col("n2.n2").cast("double"))))
      .where(col("cosine") >= minCosine)
      .select(col("d1"), col("d2"), col("dot").cast("long").as("dot"),
        round(col("cosine"), 4).as("cosine"))
  }
}
