package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding corpora — the third compression
  * tier beside full-precision ([[Similarity]]) and int8 scalar quantization
  * ([[Similarity.quantizedTopK]]): split each `dim`-vector into `m`
  * subvectors, represent each by the index of its nearest subspace centroid
  * (`log2(ksub)` bits instead of `32 · dim/m`), and answer queries with
  * asymmetric distance — per corpus row, `m` table lookups + integer adds
  * ([[graft.functions.PqAdc]]) instead of `dim` multiplies. Jégou et al.
  * 2011; the workhorse layout behind FAISS `IndexPQ`.
  *
  * Codebooks are TRAINING-FREE (strided corpus rows, the same device as
  * [[Ivf]]'s centroids): deterministic, mirrorable in SQL, and refreshable
  * by any k-means variant without touching encode/search. Distance tables
  * are integer-quantized (`floor(d² · 2²⁰ + ½)`, the fixed-point trick of
  * SIMD PQ implementations), so every downstream sum is exact integer
  * arithmetic — associative, partitioning-independent, cross-engine
  * bit-identical.
  *
  * 100 TB shape: encoding is a broadcast join (corpus × m·ksub centroid
  * rows) + two keyed aggregations — the corpus shuffles on its own id only;
  * search is a broadcast of the (tiny) per-query tables across the code
  * table, never a shuffle of the corpus.
  */
object Pq {

  private[ext] def l2sq(a: Column, b: Column): Column =
    call_function("dot_product", a, a) -
      lit(2.0) * call_function("dot_product", a, b) +
      call_function("dot_product", b, b)

  // All subvectors/centroids flow as array<double> (per-element widening is
  // exact, so this matches the float arithmetic bit-for-bit and the DuckDB
  // ::DOUBLE[] oracle), which lets float corpora and double k-means
  // centroids share one encode/search path.
  private[ext] def subSlice(vec: Column, s: Column, subdim: Int): Column =
    slice(vec, s * subdim + 1, lit(subdim)).cast("array<double>")

  private[ext] val Scale = 1048576.0 // 2^20 fixed-point quantization of d²

  /** Strided training-free codebook: one row per (subspace s, centroid j),
    * `centroid` = the s-th slice of the j-th seed vector. Seeds are the
    * first `ksub` corpus rows with `id % stride == 0` in id order —
    * deterministic and SQL-mirrorable. The row_number window runs over the
    * `ksub` seed rows only (bounded by a parameter, not by data). */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, stride: Int, offset: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    val subdim = dim / m
    val seeds = corpus
      .filter(pmod(col(idCol), lit(stride.toLong)) === offset.toLong)
      .orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol).as("__seed"),
        (row_number().over(Window.orderBy(col(idCol))) - 1).as("j"))
    seeds.select(col("j"), explode(sequence(lit(0), lit(m - 1))).as("s"),
        subSlice(col("__seed"), col("s"), subdim).as("centroid"))
  }

  /** Per-subspace Lloyd's k-means refinement of [[codebook]] — real PQ
    * trains its subquantizers (Jégou 2011 §III); the strided codebook is
    * the deterministic init. All `m` subspaces train simultaneously: one
    * broadcast-assignment join + one (s, j, position) average per
    * iteration, the corpus shuffled only at its exploded subvector size.
    * Empty cells keep their previous centroid (the [[Ivf.trainCentroids]]
    * convention). Mean centroids are shuffle-order-dependent doubles, so
    * the trained path is spec-gated, not oracle-gated — exactly like
    * IVF's trained tier. */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, stride: Int, iters: Int): DataFrame = {
    val subdim = dim / m
    val sub = corpus.select(col(idCol).as("__id"),
        explode(sequence(lit(0), lit(m - 1))).as("s"),
        subSlice(col(vecCol), col("s"), subdim).as("sv"))
      .localCheckpoint() // re-read every iteration
    var cb = codebook(corpus, idCol, vecCol, dim, m, ksub, stride)
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val best = sub.join(broadcast(cb), Seq("s"))
        .groupBy(col("__id"), col("s"))
        .agg(min_by(struct(col("j"), col("sv")),
          struct(l2sq(col("sv"), col("centroid")).as("d2"), col("j"))).as("b"))
        .select(col("s"), col("b.j").as("j"), col("b.sv").as("sv"))
      val means = best.select(col("s"), col("j"), posexplode(col("sv")))
        .groupBy("s", "j", "pos").agg(avg("col").as("v"))
        .groupBy("s", "j")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v")).as("ncv"))
      cb = cb.join(means, Seq("s", "j"), "left_outer")
        .select(col("j"), col("s"),
          coalesce(col("ncv"), col("centroid")).as("centroid"))
        .localCheckpoint()
      it += 1
    }
    cb
  }

  /** Mean squared quantization error of a codebook over a corpus — the
    * training objective, exposed so callers can compare codebooks (and
    * PqSpec can assert training helps). */
  def quantizationError(corpus: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, dim: Int, m: Int): DataFrame = {
    val subdim = dim / m
    corpus.select(col(idCol).as("__id"),
        explode(sequence(lit(0), lit(m - 1))).as("s"),
        subSlice(col(vecCol), col("s"), subdim).as("sv"))
      .join(broadcast(cb), Seq("s"))
      .groupBy(col("__id"), col("s"))
      .agg(min(l2sq(col("sv"), col("centroid"))).as("d2"))
      .agg(sum("d2").as("total_sq_error"), count(lit(1)).as("n_subvectors"))
  }

  /** Encode every corpus vector to `m` centroid indices: explode into
    * subvectors, broadcast-join the codebook, argmin d² per (id, s) with
    * deterministic ties (smaller j), assemble the code array in subspace
    * order. Output: (idCol, codes array<int>). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, dim: Int, m: Int): DataFrame = {
    val subdim = dim / m
    val sub = corpus.select(col(idCol).as("__id"),
      explode(sequence(lit(0), lit(m - 1))).as("s"),
      subSlice(col(vecCol), col("s"), subdim).as("sv"))
    sub.join(broadcast(cb), Seq("s"))
      .groupBy(col("__id"), col("s"))
      // struct min = lexicographic (d², then j): deterministic argmin
      .agg(min(struct(l2sq(col("sv"), col("centroid")).as("d2"),
        col("j").as("j"))).as("best"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("best.j")))),
        x => x.getField("j")).as("codes"))
      .select(col("__id").as(idCol), col("codes"))
  }

  /** Per-query quantized distance tables, laid out `s * ksub + j` (the
    * [[graft.functions.PqAdc]] contract). Output: (query_id, table
    * array<long> of length m·ksub). */
  def distTables(queries: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, dim: Int, m: Int): DataFrame = {
    val subdim = dim / m
    val sub = queries.select(col(idCol).as("query_id"),
      explode(sequence(lit(0), lit(m - 1))).as("s"),
      subSlice(col(vecCol), col("s"), subdim).as("qv"))
    sub.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("j"),
        floor(l2sq(col("qv"), col("centroid")) * Scale + lit(0.5))
          .cast("long").as("entry"))
      .groupBy("query_id")
      .agg(transform(
        array_sort(collect_list(struct(col("s"), col("j"), col("entry")))),
        x => x.getField("entry")).as("table"))
  }

  /** End-to-end PQ top-k: codebook → corpus codes → query tables →
    * ADC scan. Ranking ascends by quantized distance with neighbor-id
    * tie-break, so results are exactly reproducible. The compressed-scan
    * economics: after encode, each corpus row costs `m` lookups+adds per
    * query (codegen'd [[graft.functions.PqAdc]]) and `4·m` bytes of code
    * payload instead of `4·dim` vector bytes. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 8, ksub: Int = 16,
      stride: Int = 20, trainedCodebook: Option[DataFrame] = None): DataFrame = {
    val cb = trainedCodebook
      .getOrElse(codebook(corpus, idCol, vecCol, dim, m, ksub, stride))
      .localCheckpoint() // read by both encode and distTables
    val codes = encode(corpus, idCol, vecCol, cb, dim, m)
      .withColumnRenamed(idCol, "neighbor_id")
    val tables = distTables(queries, idCol, vecCol, cb, dim, m)
    codes.join(broadcast(tables), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", call_function("pq_adc", col("codes"), col("table")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc").asc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc", "rank")
  }
}
