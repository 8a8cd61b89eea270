package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.4 risk 5: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join split handles sort-merge
  * spills automatically; explicit salting is the deterministic fallback for
  * when one key dominates so heavily that even a split partition hot-spots
  * a single task — the classic hot-beneficiary-account shape in transaction
  * graphs.
  *
  * Left (fact) rows scatter across `salt` sub-keys via a hash of the whole
  * row; the right (dim) side replicates `salt`× — correct for one-to-many
  * joins (each fact row still meets its dim row exactly once).
  */
object SkewJoin {

  def salted(facts: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val factCols: Array[Column] = facts.columns.map(col)
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(factCols.toIndexedSeq: _*), lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    saltedFacts.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
