package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: inverted lists + product-quantized RESIDUALS — the composition
  * that serves billion-vector ANN in production (FAISS `IndexIVFPQ`;
  * Jégou et al. 2011 §IV). Vectors are assigned to their nearest coarse
  * centroid (L2, the [[Ivf]] device with L2 instead of cosine), the
  * residual `v − centroid` is PQ-encoded ([[Pq]] on an offset-strided
  * residual codebook), and a query probes only the `nProbe` nearest lists,
  * scoring each list's codes against the query's OWN residual distance
  * table for that list — `‖q − v‖² = ‖(q − c) − r‖²`, so quantized ADC
  * distances are comparable across probed lists.
  *
  * Everything is deterministic arithmetic (strided seeds, argmin with id
  * tie-breaks, fixed-point tables, exact integer ADC sums), so the full
  * pipeline is SQL-mirrorable like q103.
  *
  * 100 TB shape: assignment + encode are broadcast joins and keyed
  * aggregates over the corpus (never a corpus shuffle at expanded size);
  * search joins the code table to the tiny per-(query, probed-list)
  * tables on `list_id` — an equi-join whose per-row fan-out is bounded by
  * the number of queries probing that list. The scan reads `4·m` bytes of
  * codes per row instead of `4·dim` vector bytes, and only `nProbe/lists`
  * of the corpus.
  *
  * SIZING RULE (measured, SCALE.md 100× table): `ivfStride` must GROW
  * with the corpus so the list count stays ~constant (FAISS guidance:
  * nlist ≈ √N…16√N). A fixed stride makes nlist ∝ N and coarse
  * assignment — corpus × broadcast(centroids) — quadratic: the 100×
  * scale arm with stride 20 spilled >79 GB before the harness adopted
  * stride ∝ factor. The broadcast itself also grows with nlist; past
  * ~10⁵ lists switch assignment to a shuffled equi-join on a coarse
  * pre-bucket.
  */
object IvfPq {

  /** PQ seed offset: residuals of the coarse centroids themselves are ~0
    * (a centroid is its own nearest list), so seeding the residual
    * codebook at `id % stride == 0` — the centroid ids — would collapse it
    * to near-zero vectors. Seed on a nonzero offset instead. */
  private val SeedOffset = 7

  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 8, ksub: Int = 16,
      ivfStride: Int = 20, seedStride: Int = 20, nProbe: Int = 4): DataFrame = {
    val subdim = dim / m
    val v = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("ve"))
    val cent = v.filter(pmod(col("vid"), lit(ivfStride.toLong)) === 0)
      .select(col("vid").as("list_id"), col("ve").as("cv"))
      .localCheckpoint() // read by assignment and by query probing

    // coarse assignment: argmin L2 with list-id tie-break, carrying the
    // centroid for the residual — min over a (d2, list_id, cv) struct is a
    // hash aggregate with map-side partials, no window over the corpus
    val res = v.join(broadcast(cent))
      .withColumn("__d2", Pq.l2sq(col("ve"), col("cv")))
      .groupBy(col("vid"))
      // (d2, list_id) is already unique per group, so cv/ve never act as
      // comparison keys — they just ride the winning struct out of the agg
      .agg(min(struct(col("__d2"), col("list_id"), col("cv"), col("ve"))).as("b"))
      .select(col("vid"), col("b.list_id").as("list_id"),
        call_function("vec_sub", col("b.ve"), col("b.cv")).as("rv"))
      .localCheckpoint() // read by codebook seeding and encoding

    val cb = Pq.codebook(res, "vid", "rv", dim, m, ksub, seedStride, SeedOffset)
      .localCheckpoint()
    val codes = Pq.encode(res, "vid", "rv", cb, dim, m)
      .join(res.select("vid", "list_id"), Seq("vid"))

    // probe the nProbe nearest lists per query; the window runs over
    // |queries| × |lists| rows — query-set sized, not corpus sized
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probes = q.join(broadcast(cent))
      .withColumn("__d2", Pq.l2sq(col("qv"), col("cv")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__d2").asc, col("list_id"))))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("list_id"),
        call_function("vec_sub", col("qv"), col("cv")).as("rq"))

    // per-(query, probed list) quantized distance table over the residual
    val tables = probes
      .select(col("query_id"), col("list_id"),
        explode(sequence(lit(0), lit(m - 1))).as("s"),
        Pq.subSlice(col("rq"), col("s"), subdim).as("qs"))
      .join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("list_id"), col("s"), col("j"),
        floor(Pq.l2sq(col("qs"), col("centroid")) * Pq.Scale + lit(0.5))
          .cast("long").as("entry"))
      .groupBy("query_id", "list_id")
      .agg(transform(
        array_sort(collect_list(struct(col("s"), col("j"), col("entry")))),
        x => x.getField("entry")).as("table"))

    codes.join(broadcast(tables), Seq("list_id"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("adc", call_function("pq_adc", col("codes"), col("table")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc").asc, col("vid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("adc"), col("rank"))
  }

  /** Two-stage retrieval: IVF-PQ shortlist, then EXACT re-rank — the
    * standard production composition (FAISS's `IndexRefineFlat` atop
    * `IndexIVFPQ`): quantized ADC narrows the corpus to `shortlist`
    * candidates per query, then full-precision cosine re-scores ONLY
    * those candidates and keeps the final top-`k`. Fixes the PQ
    * approximation error exactly where it matters (the head of the
    * ranking) while still never scanning full vectors for the corpus at
    * large.
    *
    * 100 TB shape: stage 1 is [[topK]]'s code-scan (4·m bytes/row over
    * nProbe lists); stage 2 touches `shortlist·|queries|` full vectors —
    * fetched by an equi-join on the candidate ids (a keyed shuffle of
    * candidate rows only; the corpus at large never ships vectors), with
    * the query vectors broadcast. The re-rank window runs over
    * query-set-sized data.
    *
    * Determinism: the shortlist is [[topK]]'s (exact integer ADC,
    * id tie-breaks); the re-rank cosine is the codegen'd sequential dot
    * product ([[graft.functions.VectorFunctions]]), bit-equal to an
    * engine mirroring the same IEEE op order. */
  def topKReranked(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int, dim: Int, m: Int = 8,
      ksub: Int = 16, ivfStride: Int = 20, seedStride: Int = 20,
      nProbe: Int = 4): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val cand = topK(corpus, queries, idCol, vecCol, shortlist, dim, m,
      ksub, ivfStride, seedStride, nProbe)
    val nv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol)
      .cast("array<double>").as("nv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol)
      .cast("array<double>").as("qv"))
    cand.select("query_id", "neighbor_id")
      .join(nv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", call_function("cosine_sim", col("qv"), col("nv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
