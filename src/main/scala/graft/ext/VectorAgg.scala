package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped vector aggregation over embedding columns — the reduction side
  * of a semantic-clustering / IVF pipeline (per-cluster centroids, domain
  * mixture means). Complements [[Ivf.trainCentroids]]: that is the
  * driver-iterative k-means trainer; this is the one-pass distributed
  * centroid for *given* cluster assignments, e.g. refreshing an IVF index
  * after re-assignment or computing per-label mean vectors for mixture
  * balancing.
  *
  * Scale shape: `posexplode` fans each row into `dim` rows, then ONE hash
  * aggregation on (cluster, dim) with map-side partial combine — a single
  * shuffle whose width is `clusters × dim`, independent of corpus size.
  * No `collect`, no window, no driver loop.
  *
  * Determinism: float addition is shuffle-order-dependent, so centroids
  * over raw floats are not bit-reproducible across runs. `quantScale`
  * fixes the granularity (e.g. 1e6): each element is floored to an integer
  * tick first, the sum is exact (order-independent) Long arithmetic, and
  * the final division is one deterministic double op — the property the
  * driver's bit-exact oracle gate needs, and the property a reproducible
  * training pipeline wants anyway. Pass `quantScale = 0` for raw-float
  * centroids when bit-reproducibility is not required. */
object VectorAgg {

  /** Long-format centroids: one row per (cluster, dim position) with the
    * member count and the quantized mean. `vecCol` is an `array<float>`
    * (or `array<double>`) column; all vectors in a group must share the
    * same length for the result to be a well-formed centroid. */
  def groupedCentroids(df: DataFrame, clusterCol: String, vecCol: String,
      quantScale: Long = 1000000L): DataFrame = {
    val ex = df.select(col(clusterCol), posexplode(col(vecCol)).as(Seq("pos", "elem")))
    if (quantScale > 0) {
      ex.select(col(clusterCol), col("pos").cast("long").as("pos"),
          floor(col("elem").cast("double") * quantScale).cast("long").as("q"))
        .groupBy(col(clusterCol), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("__sq"))
        .select(col(clusterCol), col("pos"), col("n"),
          (col("__sq").cast("double") / (col("n") * quantScale.toDouble))
            .as("centroid"))
    } else {
      ex.select(col(clusterCol), col("pos").cast("long").as("pos"),
          col("elem").cast("double").as("e"))
        .groupBy(col(clusterCol), col("pos"))
        .agg(count(lit(1)).as("n"), avg(col("e")).as("centroid"))
    }
  }
}
