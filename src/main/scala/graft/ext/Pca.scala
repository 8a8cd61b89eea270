package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step before ANN indexing or visualization (the same role PQ's per-
  * subspace rotation plays in [[Pq]]).
  *
  * Split exactly along the scale boundary:
  *  1. [[scatterMatrix]] — the O(data) pass. Coordinates quantize to a
  *     fixed integer grid (`⌊x·S + 0.5⌋`; binary floats scaled by 10⁴
  *     cannot land on exact halves, so the floor is unambiguous — the
  *     [[graft.functions.QuantizeAlgo]] argument) and the d(d+1)/2 upper-
  *     triangle second-moment sums accumulate as EXACT longs in a
  *     per-partition kernel (`mapPartitions` — the documented legitimate
  *     imperative case: a d² accumulator array has no DataFrame shape),
  *     then one tiny keyed sum merges the ≤ numPartitions partials.
  *     Commutative integer addition ⇒ partitioning-invariant, SQL-
  *     mirrorable, hash-gatable.
  *  2. [[topComponent]] — the O(d²) step on the collected matrix (4096
  *     doubles at d=64 — the Fellegi–Sunter-EM tiny-table precedent):
  *     fixed-iteration power method with deterministic driver arithmetic.
  *     Spec-gated (floats), never in the data path.
  */
object Pca {

  /** Upper-triangle exact-integer second-moment matrix: (i, j, s) with
    * 0 ≤ i ≤ j < d, s = Σ_rows q_i·q_j. At 10¹⁰⁺ rows drop `scale` an
    * order of magnitude to keep Σ q_i·q_j under 2⁶³. */
  def scatterMatrix(df: DataFrame, vecCol: String,
      scale: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol)).as[Array[Float]]
    vecs.mapPartitions { it =>
      var acc: Array[Long] = null
      var d = 0
      it.foreach { v =>
        if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
        require(v.length == d, s"ragged embedding: ${v.length} vs $d")
        val q = new Array[Long](d)
        var i = 0
        while (i < d) {
          q(i) = math.floor(v(i).toDouble * scale + 0.5).toLong; i += 1
        }
        var k = 0; i = 0
        while (i < d) {
          var j = i
          while (j < d) { acc(k) += q(i) * q(j); k += 1; j += 1 }
          i += 1
        }
      }
      if (acc == null) Iterator.empty
      else {
        val out = Iterator.tabulate(d) { i => i }.flatMap { i =>
          (i until d).map { j =>
            val k = i * d - i * (i - 1) / 2 + (j - i)
            (i, j, acc(k))
          }
        }
        out
      }
    }.toDF("i", "j", "s")
      .groupBy("i", "j").agg(sum(col("s")).as("s"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("s").cast("long").as("s"))
  }

  /** Dominant eigenvector of the collected scatter matrix via `iters`
    * power-method steps from the all-ones vector, L2-normalized each
    * step; deterministic fixed-order driver arithmetic on a d×d array.
    * Returns the component (length d, first nonzero coordinate made
    * positive for sign stability). */
  def topComponent(scatter: DataFrame, iters: Int = 50): Array[Double] = {
    val rows: Array[Row] = scatter.select("i", "j", "s").collect()
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2).toDouble)
      m(i)(j) = s; m(j)(i) = s
    }
    var v = Array.fill(d)(1.0)
    (1 to iters).foreach { _ =>
      val nv = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      val norm = math.sqrt(nv.map(x => x * x).sum)
      v = if (norm == 0.0) nv else nv.map(_ / norm)
    }
    val firstNz = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (firstNz < 0) v.map(-_) else v
  }

  /** Project each vector onto a component: (idCol, score). Literal
    * component array, per-row sequential `dot_product` (the codegen'd
    * [[graft.functions]] kernel) — one projection pass, no shuffle. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      component: Array[Double]): DataFrame = {
    val comp = component.map(x => f"CAST($x%.8f AS FLOAT)")
      .mkString("array(", ", ", ")")
    df.select(col(idCol),
      expr(s"dot_product($vecCol, $comp)").as("score"))
  }
}
