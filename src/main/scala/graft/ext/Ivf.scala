package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: partition the corpus into
  * inverted lists by nearest centroid, probe only the `nProbe` lists
  * closest to each query. Training-free: centroids are a deterministic
  * corpus subset (every `stride`-th vector), so the index is reproducible
  * with no fitting job — rebuild = one assignment pass.
  *
  * Scale shape: assignment is a broadcast(centroids) nested-loop scored
  * once per corpus vector (one scan, no shuffle of the corpus), list
  * membership is a column, and the probe is an equi-join on list id. With
  * `nProbe == number of lists` this degrades exactly to brute force — the
  * equivalence is unit-tested.
  */
object Ivf {

  /** Assign each vector to its nearest centroid list. The argmax is a
    * `max_by` hash aggregate keyed on the vector id, with partial (map-side)
    * aggregation over the broadcast-scored product — the corpus is never
    * shuffled at its expanded (×centroids) size, and there is no window
    * sort. Ties break to the lowest list id via the (sim, -list_id) struct
    * ordering, matching the `ORDER BY sim DESC, list_id` oracle. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int): DataFrame =
    assignTo(corpus,
      corpus.filter(col(idCol) % stride === 0)
        .select(col(idCol).as("list_id"), col(vecCol).as("cv")),
      idCol, vecCol)

  /** Assign each corpus vector to its nearest centroid from an explicit
    * `(list_id, cv)` centroid table — the generalized core of [[assign]],
    * reused by the k-means trainer. Same scale shape: broadcast centroids,
    * map-side `max_by` argmax, corpus never shuffled at expanded size. */
  def assignTo(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.join(broadcast(centroids))
      .withColumn("__sim", Similarity.cosine(col(vecCol), col("cv")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("list_id"), col(vecCol).as("__vec")),
        struct(col("__sim"), (-col("list_id")).as("__tb"))).as("__best"))
      .select(col(idCol), col(s"__best.__vec").as(vecCol), col("__best.list_id"))

  /** Lloyd's k-means over the embedding column (cosine assignment,
    * element-wise-mean update) — trains IVF centroids, and doubles as the
    * semantic-clustering primitive a training-data pipeline uses for
    * cluster-balanced sampling. Init is the deterministic stride subset
    * (reproducible, no RNG). Per iteration: one broadcast-assignment pass
    * and one (list_id, position) average — the corpus is shuffled only at
    * its exploded dimension count, never pairwise. Empty clusters keep
    * their previous centroid. The centroid table stays k rows, so the
    * final struct re-assembly (a CodegenFallback HOF) touches k rows only. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int, iters: Int): DataFrame = {
    var centroids = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("list_id"), col(vecCol).as("cv"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val means = assignTo(corpus, centroids, idCol, vecCol)
        .select(col("list_id"), posexplode(col(vecCol)))
        .groupBy("list_id", "pos").agg(avg("col").as("v"))
        .groupBy("list_id")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("new_cv"))
      centroids = centroids
        .join(means, Seq("list_id"), "left_outer")
        .select(col("list_id"), coalesce(col("new_cv"), col("cv")).as("cv"))
        .localCheckpoint()
      it += 1
    }
    centroids
  }

  /** Top-k for each query probing trained centroids — [[topK]] with a
    * k-means index instead of the stride index. */
  def topKTrained(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val assigned = assignTo(corpus, centroids, idCol, vecCol)
    val probeW = Window.partitionBy("query_id").orderBy(col("__csim").desc, col("list_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .withColumn("__csim", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("list_id"))
    val rankW = Window.partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    probes.join(assigned, "list_id")
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cosine", Similarity.cosine(col("qv"), col(vecCol)))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Top-k for each query, probing the `nProbe` nearest lists. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, stride: Int, nProbe: Int): DataFrame = {
    val assigned = assign(corpus, idCol, vecCol, stride)
    val centroids = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("list_id"), col(vecCol).as("cv"))
    val probeW = Window.partitionBy("query_id").orderBy(col("__csim").desc, col("list_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(centroids))
      .withColumn("__csim", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("list_id"))
    val rankW = Window.partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    probes.join(assigned, "list_id")
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cosine", Similarity.cosine(col("qv"), col(vecCol)))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }
}
