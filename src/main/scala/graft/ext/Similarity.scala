package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns: exact cosine
  * (sequential-order double arithmetic, so results are bit-comparable with a
  * SQL oracle), brute-force top-k as the correctness baseline, and
  * random-hyperplane LSH bucketing as the 100 TB scale path.
  */
object Similarity {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via zip_with + left-to-right aggregate. Higher-order
    * functions are CodegenFallback, so this is the slow reference
    * formulation — kept for sessions without [[graft.GraftExtensions]] and
    * as the equivalence baseline for the codegen'd expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Codegen'd cosine (graft.functions.CosineSimilarity): identical
    * left-to-right IEEE arithmetic, whole-stage-codegen'd. Requires the
    * `cosine_sim` function registered by GraftExtensions. */
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Brute-force top-k neighbors for a (small) query set: broadcast the
    * queries, scan the corpus once, rank per query. The corpus is never
    * shuffled — only the k·|queries| survivors move. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar corpus items with a DIFFERENT label — the
    * "looks like a positive, isn't one" pairs an embedding/reranker
    * trainer needs (the in-batch-negatives upgrade every retrieval
    * pipeline reaches for). Same broadcast-query scan shape as
    * [[bruteForceTopK]] — the corpus is never shuffled, the label
    * inequality rides the join, and only k·|queries| survivors move. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        col(labelCol).as("neighbor_label"))
      .join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("__ql") =!= col("neighbor_label"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
  }

  /** kNN label prediction over an embedding corpus: each query's label is
    * the majority vote of its k nearest (cosine) neighbors — the standard
    * weak-labeling / embedding-quality-eval primitive (predict a held-out
    * label from geometry; compare against the true one). Votes are exact
    * integers; ties break to the smaller label, rank ties to the smaller
    * neighbor id — fully deterministic, so the whole prediction is
    * SQL-mirrorable. Same broadcast-query scan as [[bruteForceTopK]]. */
  def knnPredict(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("true_label"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        col(labelCol).as("__nl"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val topk = scored.withColumn("__r", row_number().over(wRank)).filter(col("__r") <= k)
    val votes = topk.groupBy("query_id", "true_label", "__nl")
      .agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("__nl"))
    votes.withColumn("__vr", row_number().over(wVote)).filter(col("__vr") === 1)
      .select(col("query_id"),
        col("true_label").cast("long").as("true_label"),
        col("__nl").cast("long").as("predicted_label"),
        col("votes"))
  }

  /** [[bruteForceTopK]] over int8-quantized codes (graft.functions.QuantizeI8):
    * per-vector max-abs scaling, cosine on the codes directly (cosine is
    * scale-invariant). At 100 TB this is the 4×-compression path — the
    * quantized corpus projection is what gets scanned/broadcast, and the
    * integer dot products are exact and order-independent. Quantization
    * happens in the pre-join projections, so each corpus row is coded once
    * per scan, not once per query pairing. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def codes(c: Column): Column = call_function("quantize_i8", c)
    val q = queries.select(col(idCol).as("query_id"), codes(col(vecCol)).as("qc"))
    val scored = corpus.select(col(idCol).as("neighbor_id"), codes(col(vecCol)).as("nc"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_q", call_function("cosine_i8", col("qc"), col("nc")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_q").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine_q", "rank")
  }

  /** All-pairs cosine ≥ threshold. O(n²) — the correctness baseline for
    * [[neardupPairsBanded]] (asserted in SimilaritySpec), NOT the registered
    * scale path: a BroadcastNestedLoopJoin over n² pairs dies at 100 TB. */
  def neardupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_l"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_r"), col(vecCol).as("vb"))
    a.join(b, col("id_l") < col("id_r"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_l", "id_r", "cosine")
  }

  /** Banded hyperplane-LSH near-dup pairs — the 100 TB scale path for
    * embedding near-dup detection. `bands` independent signatures of
    * `rowsPerBand` hyperplanes each; a pair is a candidate iff it shares
    * some band's full bucket (the MinHash-banding construction applied to
    * Charikar's sign hashes). Candidate generation is an equi-join on
    * (band, bucket) — never O(n²) — and only candidates get the exact
    * cosine verification. Bucket rows carry ids only; vectors join back on
    * the id at verify time, so the ×bands explode never shuffles vectors.
    *
    * Recall for a pair at angle θ is 1-(1-(1-θ/π)^rowsPerBand)^bands:
    * more bands raise recall, more rowsPerBand cut candidates. Tune for
    * the target threshold; verified against [[neardupPairs]] in unit tests.
    */
  def neardupPairsBanded(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int, rowsPerBand: Int, dim: Int): DataFrame = {
    val bk = bandedBuckets(df, idCol, vecCol, bands, rowsPerBand, dim)
    val cands = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_l"), col("b.id").as("id_r"))
      .dropDuplicates("id_l", "id_r")
    verifyCosine(df, idCol, vecCol, cands, threshold)
  }

  /** (id, band, bucket) rows for banded hyperplane LSH — the shared
    * candidate-generation front end of [[neardupPairsBanded]] and
    * [[neardupEdgesChained]]. Bucket rows carry ids only. */
  private def bandedBuckets(df: DataFrame, idCol: String, vecCol: String,
      bands: Int, rowsPerBand: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(bands * rowsPerBand, dim)
    val bucketCols = (0 until bands).map { b =>
      lshBucket(col(vecCol), planes.slice(b * rowsPerBand, (b + 1) * rowsPerBand))
    }
    df.select(col(idCol).as("id"), posexplode(array(bucketCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Exact-cosine verification of an explicit candidate set: vectors join
    * back by id, so candidate generation never shuffles vectors. */
  private def verifyCosine(df: DataFrame, idCol: String, vecCol: String,
      cands: DataFrame, threshold: Double): DataFrame = {
    val va = df.select(col(idCol).as("id_l"), col(vecCol).as("va"))
    val vb = df.select(col(idCol).as("id_r"), col(vecCol).as("vb"))
    cands.join(va, "id_l").join(vb, "id_r")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_l", "id_r", "cosine")
  }

  /** Chain-contracted near-dup edges — the giant-cluster-safe candidate
    * shape. [[neardupPairsBanded]]'s bucket self-join emits O(c²) rows for
    * a bucket of c clones (a million boilerplate copies → 10¹² candidate
    * pairs before any filter). Here each (band, bucket) instead contributes
    * only its *consecutive-by-id* member pairs — c−1 rows, via one window —
    * so candidate volume is linear in corpus size no matter how skewed the
    * buckets. The verified chain edges connect exactly the same nodes
    * within a bucket of bit-identical embeddings (cosine 1 between every
    * consecutive pair), so connected components over them equal the
    * pairwise components for clone clusters; for merely-similar members a
    * chain edge can fail verification where some non-adjacent pair would
    * have passed, making the resulting components a refinement (never a
    * coarsening) of the pairwise-edge components — the safe direction for
    * dedup (asserted in SimilaritySpec). */
  def neardupEdgesChained(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int, rowsPerBand: Int, dim: Int): DataFrame = {
    val bk = bandedBuckets(df, idCol, vecCol, bands, rowsPerBand, dim)
    val w = Window.partitionBy("band", "bucket").orderBy("id")
    val cands = bk.withColumn("id_l", lag(col("id"), 1).over(w))
      .filter(col("id_l").isNotNull)
      .select(col("id_l"), col("id").as("id_r"))
      .dropDuplicates("id_l", "id_r")
    verifyCosine(df, idCol, vecCol, cands, threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication" —
    * public): find embedding-space near-duplicate pairs via the banded-LSH
    * scale path ([[neardupPairsBanded]] — candidates from bucket equi-joins,
    * exact cosine verification, never O(n²)), then per pair drop the
    * LOWER-quality member (ties drop the higher id, so verdicts are
    * deterministic). Returns every row of `quality` (`id`, `quality`) with
    * an `is_dropped` verdict — the keep-list a curation pipeline feeds to
    * training. A document near-duplicating several others is dropped if any
    * of its pairings says so; the chain keeps at least one representative
    * per near-dup cluster (the globally best-quality member is never the
    * drop side of any pair). */
  def semanticDedup(emb: DataFrame, quality: DataFrame, idCol: String,
      vecCol: String, threshold: Double, bands: Int, rowsPerBand: Int,
      dim: Int): DataFrame = {
    val pairs = neardupPairsBanded(emb, idCol, vecCol, threshold, bands, rowsPerBand, dim)
    val ql = quality.select(col("id").as("id_l"), col("quality").as("__ql"))
    val qr = quality.select(col("id").as("id_r"), col("quality").as("__qr"))
    val drops = pairs.join(ql, "id_l").join(qr, "id_r")
      .select(
        when(col("__ql") < col("__qr"), col("id_l"))
          .when(col("__qr") < col("__ql"), col("id_r"))
          .otherwise(greatest(col("id_l"), col("id_r"))).as("id"))
      .distinct()
    quality
      .join(drops.withColumn("__d", lit(true)), Seq("id"), "left_outer")
      .select(col("id"), col("quality"),
        coalesce(col("__d"), lit(false)).as("is_dropped"))
  }

  /** Cluster-contracted semantic dedup — the giant-cluster-safe variant of
    * [[semanticDedup]]. Instead of materializing every near-dup pair (O(c²)
    * for a c-clone cluster) and applying a pairwise drop rule, this
    * contracts candidates through connected components: chain edges from
    * [[neardupEdgesChained]] (linear in corpus size) → min-id components
    * ([[graft.graph.ConnectedComponents]]) → keep exactly the best-quality
    * member per component (ties keep the lowest id). Returns every row of
    * `quality` (`id`, `quality`) with its `cluster_id` (own id for
    * singletons) and an `is_dropped` verdict.
    *
    * Scale shape: one window over buckets, one equi-join per verification
    * side, O(log n) CC rounds, one argmax aggregate + one join for the
    * keep rule — nothing anywhere is quadratic in cluster size. The keep
    * rule is argmax-by-(quality, −id) via `max_by`, a map-side-combinable
    * aggregate, so even a million-member component never sorts in one task
    * the way a row_number window would. */
  def semanticDedupClusters(emb: DataFrame, quality: DataFrame, idCol: String,
      vecCol: String, threshold: Double, bands: Int, rowsPerBand: Int,
      dim: Int, checkpointDir: Option[String] = None): DataFrame = {
    val edges = neardupEdgesChained(emb, idCol, vecCol, threshold, bands, rowsPerBand, dim)
      .select(col("id_l").as("src"), col("id_r").as("dst"))
    // chain edges are dropDuplicates'd and id_l < id_r, so already distinct
    ClusterKeep.assignAndKeep(quality, edges, checkpointDir)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 over (plane, dim)),
    * materialized as literal arrays — no fitting step, reproducible across
    * runs and engines. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until numPlanes).map { p =>
      Array.tabulate(dim) { d =>
        var z = (p.toLong * 0x9E3779B97F4A7C15L) + (d.toLong * 0xBF58476D1CE4E5B9L) + 0x94D049BB133111EBL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        // top 52 bits -> [0,1) -> [-1,1)
        (z >>> 12).toDouble / (1L << 52).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-of-projection LSH bucket id (Charikar random hyperplane LSH): one
    * bit per hyperplane. Vectors in the same bucket are ANN candidates —
    * bucket join replaces the O(n²) cross product at scale. */
  def lshBucket(vecCol: Column, planes: Seq[Array[Double]]): Column = {
    val v = toDouble(vecCol)
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(call_function("dot_product", v, planeLit) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN: assign corpus and queries to hyperplane buckets, join on
    * the bucket, rank within it. `multiProbe` additionally probes every
    * bucket at Hamming distance 1 from the query's bucket (flip one plane
    * bit) — the standard multi-probe LSH recall boost for vectors near a
    * hyperplane, at (numPlanes+1)× query-side fan-out and unchanged
    * corpus-side cost. Verified against [[bruteForceTopK]] in unit tests. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int, dim: Int,
      multiProbe: Boolean = false): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q =
      if (!multiProbe) q0
      else q0.withColumn("bucket", explode(array(
        (col("bucket") +: (0 until numPlanes).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i)))): _*)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
