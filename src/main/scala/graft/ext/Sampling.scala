package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling — the reproducibility layer a
  * training-data pipeline needs around `sample()`-style driver surfaces
  * (reference `/root/reference/03_aml_entity_resolution.py:59,94` samples for
  * inspection; a training pipeline must instead split *stably*, so the same
  * document lands in the same split on every run, any cluster size, any
  * partitioning).
  *
  * Everything here is a pure projection/filter over a hash of the row id —
  * no shuffle, no RNG state, trivially pushed into scans. Two hash choices:
  * [[arithHash]] (multiplicative hashing, exactly mirrorable in ANSI SQL for
  * cross-engine audits) and `xxhash64` (full 64-bit dispersion; the default
  * at scale).
  */
object Sampling {

  /** Seeded multiplicative hash (Knuth's 2654435761 over the id modulo a
    * prime): every intermediate stays far below Long overflow (ANSI-safe)
    * and the whole expression is plain integer arithmetic any engine
    * reproduces bit-for-bit. Dispersion is weaker than xxhash64 but
    * sufficient for percent-bucket assignment. */
  def arithHash(id: Column, seed: Long): Column =
    pmod((pmod(id, lit(1000003L)) + lit(seed)) * lit(2654435761L), lit(1000000007L))

  /** Seeded xxhash64 — the scale default (not SQL-mirrorable). */
  def xxHash(id: Column, seed: Long): Column = xxhash64(id, lit(seed))

  /** Assign every row a stable percent bucket (0–99) and a named split.
    * `boundaries` are cumulative upper percents, ascending, ending at 100 —
    * e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)`. Adding rows
    * later never moves an existing row between splits (the property
    * `randomSplit` cannot give). */
  def hashSplit(df: DataFrame, idCol: String, seed: Long,
      boundaries: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 90, "test" -> 100),
      hash: (Column, Long) => Column = arithHash): DataFrame = {
    require(boundaries.nonEmpty && boundaries.last._2 == 100,
      "boundaries must be cumulative percents ending at 100")
    require(boundaries.map(_._2) == boundaries.map(_._2).sorted,
      "boundaries must be ascending")
    val bucket = pmod(hash(col(idCol), seed), lit(100L))
    val split = boundaries.init.foldRight(lit(boundaries.last._1): Column) {
      case ((name, hi), els) => when(bucket < hi, lit(name)).otherwise(els)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Deterministic stratified sampling: keep a row when its hash bucket
    * falls below its stratum's per-100 quota — `sampleBy` semantics without
    * RNG, so the sample is identical on every run and engine. Strata
    * missing from `quotas` are dropped (quota 0). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      quotas: Map[String, Int], seed: Long,
      hash: (Column, Long) => Column = arithHash): DataFrame = {
    require(quotas.values.forall(q => q >= 0 && q <= 100),
      "quotas are per-100 keep rates")
    val bucket = pmod(hash(col(idCol), seed), lit(100L))
    // deterministic when-chain order for reproducible plans
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(0): Column) {
      case (els, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(els)
    }
    df.filter(bucket < quota)
  }

  /** Deterministic FIXED-SIZE sample per group: rank rows inside each
    * stratum by their seeded hash (id as the total tie-break) and keep the
    * first `k` — reservoir-sampling semantics without RNG state, so the
    * same rows are chosen on every run, engine, and partitioning, and a
    * re-run over a grown corpus changes the selection minimally (only
    * where new ids hash below an incumbent). One shuffle+sort on the
    * stratum; at 100 TB pre-aggregate candidates per partition first if a
    * single stratum dominates. Output keeps all columns plus `sample_rank`
    * (1-based). */
  def groupSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Long,
      hash: (Column, Long) => Column = arithHash): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash(col(idCol), seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Weight-proportional fixed-size sampling WITHOUT replacement via
    * priority sampling (Duffield, Lund & Thorup 2007): each row gets
    * priority `w / u` for a uniform `u ∈ (0,1]` and the k highest
    * priorities are kept — near-optimal variance for subset-sum estimates
    * under any weights, which is why it (not Bernoulli) is the standard
    * for weighted corpus subsampling.
    *
    * `u` is derived from [[arithHash]] (`(h mod 1000003 + 1) / 1000004`),
    * so the sample is deterministic across runs/engines/partitionings;
    * the priority `w · 1000004 / (h+1)` is two IEEE ops over exactly-
    * representable integers — bit-identical everywhere. Top-k evaluates as
    * TakeOrderedAndProject: per-partition heaps, no global sort. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h1 = pmod(arithHash(col(idCol), seed), lit(1000003L)) + lit(1L)
    df.withColumn("priority",
        round(col(weightCol) * lit(1000004.0) / h1, 4))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }
}
