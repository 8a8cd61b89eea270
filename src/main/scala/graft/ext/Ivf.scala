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
      stride: Int): DataFrame = {
    val centroids = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("list_id"), col(vecCol).as("cv"))
    corpus.join(broadcast(centroids))
      .withColumn("__sim", Similarity.cosine(col(vecCol), col("cv")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("list_id"), col(vecCol).as("__vec")),
        struct(col("__sim"), (-col("list_id")).as("__tb"))).as("__best"))
      .select(col(idCol), col(s"__best.__vec").as(vecCol), col("__best.list_id"))
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
