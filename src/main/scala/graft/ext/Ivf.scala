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

  /** Assign each vector to its nearest centroid list. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int): DataFrame = {
    val centroids = corpus.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("list_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("list_id"))
    corpus.join(broadcast(centroids))
      .withColumn("__sim", Similarity.cosine(col(vecCol), col("cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("list_id"))
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
