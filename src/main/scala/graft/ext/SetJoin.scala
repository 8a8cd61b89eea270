package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Jaccard set-similarity self-join with PREFIX FILTERING (the
  * SSJoin/PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008): two
  * sets with `J ≥ t` must share at least one token in their rare-first
  * prefixes of length `|A| − ⌈t·|A|⌉ + 1` under any fixed global token
  * order, so candidates come from an inverted index over PREFIX tokens
  * only — the index shrinks by the factor `t` and, because prefixes are
  * rare-first, the hottest tokens never enter it. On top of the prefix
  * bound, the candidate join carries the PPJoin LENGTH filter
  * (`min(|A|,|B|)/max(|A|,|B|) ≥ t`, Xiao et al. 2008 §3): a hot prefix
  * token no longer pairs every holder regardless of hopeless size
  * mismatch. Both filters are LOSSLESS:
  * the oracle recomputes the join from the FULL inverted index and the
  * result sets must hash-match exactly (a per-round proof of the prefix
  * bound, not just a spot check).
  *
  * This is the itemset twin of [[TextDedup.jaccardPairs]] (shingles →
  * items): near-identical customer baskets, co-purchase templates,
  * duplicate orders.
  *
  * Scale shape: one frequency aggregate, one per-set window bounded by
  * set size (rank items rare-first), an equi-join on prefix tokens, then
  * exact verification by counting shared items per candidate pair —
  * every join keyed, no cross product, candidate volume bounded by
  * Σ_token df(token-in-prefix)². All arithmetic exact integers until the
  * final Jaccard ratio. */
object SetJoin {

  /** Candidate pairs from the prefix inverted index. `lengthFilter` adds
    * the PPJoin POSITIONAL bound (Xiao et al. 2008 §3.2), which subsumes
    * the length filter: a token matched at rare-first positions
    * `(r_a, r_b)` caps the overlap at
    * `ub = min(|A|−r_a, |B|−r_b) + 1` (every shared token sorts ≥ the
    * FIRST shared token, whose row is guaranteed to be in both prefixes
    * with accumulated overlap 0), so the pair can only reach
    * `J ≥ t` if `ub / (|A|+|B|−ub) ≥ t`. At `r_a = r_b = 1` this is
    * exactly the length bound `min/max ≥ t`; at later positions it is
    * strictly tighter. LOSSLESS bit-for-bit: the predicate is the same
    * double division as the final Jaccard filter, `x/(S−x)` is monotone
    * in `x`, double division of exact small ints is correctly rounded
    * (rounding preserves ≤), and the first-shared-token row always
    * passes for a true pair, so the pair survives the per-row filter +
    * distinct. Exposed for the spec, which asserts candidate-count
    * shrinkage on a skewed-size corpus. */
  private[ext] def candidates(items: DataFrame, size: DataFrame,
      minJaccard: Double, lengthFilter: Boolean,
      dedup: Boolean = true, hotDf: Int = 4096): DataFrame = {
    val freq = items.groupBy("item").agg(count(lit(1)).as("f"))
    val prefix = items
      .join(freq, "item")
      .join(size, "id")
      .withColumn("__r", row_number().over(
        Window.partitionBy("id").orderBy(col("f"), col("item"))))
      .where(col("__r") <=
        col("sz") - ceil(lit(minJaccard) * col("sz")).cast("long") + 1)
      .select(col("id"), col("item"), col("sz"), col("__r"))
    val ub = least(col("a.sz") - col("a.__r"), col("b.sz") - col("b.__r")) + lit(1L)
    val posOk =
      if (lengthFilter)
        ub.cast("double") / (col("a.sz") + col("b.sz") - ub) >= lit(minJaccard)
      else lit(true)
    // pair generation from ONE computed copy of the prefix index: group
    // the postings per token and double-explode within the list, instead
    // of equi-joining the index with itself. A DataFrame self-join plans
    // the whole upstream (scan → dedup → freq → size → window) TWICE —
    // exchange reuse does not survive AQE's broadcast rewrites here — so
    // the grouped form halves the candidate stage's input work at
    // identical candidate volume (one (a,b) row per shared prefix token,
    // exactly the join's multiplicity). Rare-first ranking keeps prefix
    // tokens low-df by construction, but that is a TENDENCY, not a bound:
    // a set made entirely of hot tokens still pushes a hot token into its
    // prefix, and collect_list partials cannot spill mid-row — so a token
    // whose prefix-postings exceed `hotDf` is routed to a keyed SELF-JOIN
    // instead (streams and spills per-row; same (a,b) multiplicity). The
    // hot-token list is ≤ |prefix| / hotDf entries — broadcastable at any
    // corpus size — so the split costs one broadcast anti/semi join pair;
    // the grouped path's arrays are then ≤ hotDf DURING the aggregate,
    // the invariant the 100 TB argument actually needs. */
    val entry = struct(col("id"), col("sz"), col("__r"))
    // FOUR subplans consume the item-partitioned prefix index (the
    // hot-token census, the grouped left_anti arm, and both sides of the
    // hot self-join); AQE's runtime exchange reuse recovers only part of
    // that duplication (measured on q141's final adaptive plan: 2
    // ReusedExchange against 7 planned copies of the scan→dedup→freq→
    // size→window upstream; regression-guarded in PlanSpec).
    // `spark.graft.setjoin.reusePrefix=true` materializes the index ONCE
    // as a lazy local checkpoint (executor blocks, memory+disk — the
    // iterative graph operators' device, [[graft.graph.Checkpointer]])
    // and every consumer reads the blocks. The crossover was MEASURED on
    // the e-axis volume arms (alternating-sample A/B so host tide
    // cancels; every sample disclosed in SCALE.md): checkpoint is 1.13×
    // (13% SLOWER) at sf0.1 (block write+read and the broken whole-stage
    // pipeline cost more than the partially-reused recompute),
    // break-even 0.96× at 10×, and at 100× it is the VARIANCE-REDUCING
    // choice — on-samples span 173–241 s where off-samples span
    // 164–368 s across identical runs (the redundant upstream shuffles
    // multiply ambient contention): quiet-window floor 5% slower, median
    // ~18% faster, loaded-window 35% faster. Default "auto" encodes
    // that: checkpoint iff the optimizer's size estimate of the (pruned)
    // items input exceeds `spark.graft.setjoin.reuseAutoBytes` (64 MB —
    // between the measured break-even ~15 MB and robust-win ~136 MB
    // estimates), so bench-scale corpora keep the recompute path and
    // large corpora — which in the 100 TB context run on shared
    // clusters, where the robust plan IS the fast plan — get
    // checkpoint-once without anyone flipping a knob.
    val pfxP0 = prefix.repartition(col("item"))
    val conf = items.sparkSession.conf
    val reuse = conf.get("spark.graft.setjoin.reusePrefix", "auto") match {
      case "auto" =>
        val threshold = BigInt(conf
          .get("spark.graft.setjoin.reuseAutoBytes", (64L << 20).toString))
        items.queryExecution.optimizedPlan.stats.sizeInBytes > threshold
      case v => v.toBoolean
    }
    val pfxP = if (reuse) pfxP0.localCheckpoint(false) else pfxP0
    val hotToks = pfxP.groupBy("item").agg(count(lit(1)).as("__pc"))
      .where(col("__pc") > hotDf).select("item")
    val grouped = pfxP.join(broadcast(hotToks), Seq("item"), "left_anti")
      .groupBy("item").agg(collect_list(entry).as("__ps"))
      .select(explode(col("__ps")).as("a"), col("__ps"))
      .select(col("a"), explode(col("__ps")).as("b"))
      .select(col("a"), col("b"))
    val hotL = pfxP.join(broadcast(hotToks), Seq("item"), "left_semi")
    val hotPairs = hotL.select(col("item"), entry.as("a"))
      .join(hotL.select(col("item"), entry.as("b")), "item")
      .select(col("a"), col("b"))
    val raw = grouped.unionAll(hotPairs)
      .where(col("a.id") < col("b.id") && posOk)
      .select(col("a.id").as("id_l"), col("b.id").as("id_r"))
    // dedup = false defers pair dedup to AFTER verification: a pair occurs
    // once per shared prefix token (small constant), so verifying the few
    // duplicates costs less than a full exchange of the candidate set —
    // the post-verification dedup then runs on the (far smaller) passing
    // pairs. Identical rows verify identically, so the result set is
    // unchanged (a pair survives iff ANY of its occurrences passed the
    // positional bound — exactly the pre-distinct semantics).
    if (dedup) raw.distinct() else raw
  }

  def jaccardPairs(df: DataFrame, idCol: String, itemCol: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "minJaccard must be in (0, 1]")
    // one explicit hash-partitioning on id serves every id-keyed step:
    // HashPartitioning(id) satisfies the clustering required by the
    // (id, item) dedup, the per-set size aggregate, AND the rare-first
    // prefix window — all three run partial→final with no further
    // exchange, vs the planner's default of one shuffle each
    val items = df.select(col(idCol).as("id"), col(itemCol).as("item"))
      .repartition(col("id"))
      .dropDuplicates("id", "item")
    // whole-set array per id rides the SAME id partitioning (no exchange):
    // verification then needs only the two cand→set joins and a per-pair
    // `size(array_intersect)` — vs the exploded shared-item join (rows ×
    // set size), a pair-keyed count aggregate, and two more size joins.
    // A set is one record's items (a basket, a document) — bounded per
    // row by construction, so the array column is 100 TB-safe the same
    // way every PPJoin implementation's in-record token list is.
    val sets = items.groupBy("id")
      .agg(collect_list(col("item")).as("arr"), count(lit(1)).as("sz"))
    val cand = candidates(items, sets.select("id", "sz"), minJaccard,
      lengthFilter = true, dedup = false)
    cand
      .join(sets.select(col("id").as("id_l"), col("arr").as("__al"),
        col("sz").as("sz_l")), "id_l")
      .join(sets.select(col("id").as("id_r"), col("arr").as("__ar"),
        col("sz").as("sz_r")), "id_r")
      .withColumn("common", size(array_intersect(col("__al"), col("__ar")))
        .cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sz_l") + col("sz_r") - col("common")))
      .where(col("jaccard") >= minJaccard)
      // pair dedup deferred past verification (see candidates): runs on
      // the passing pairs only, not the full candidate volume
      .dropDuplicates("id_l", "id_r")
      .select(col("id_l"), col("id_r"), col("common"),
        col("sz_l").cast("long").as("sz_l"), col("sz_r").cast("long").as("sz_r"),
        col("jaccard"))
  }

  /** DIRECTED set-containment self-join: pairs (l, r), `l ≠ r`, with
    * `|L ∩ R| / |L| ≥ t` — "basket/document L is mostly inside R". The
    * asymmetric twin of [[jaccardPairs]] and the general form of
    * benchmark decontamination ([[TextDedup]]'s 13-gram check is the
    * `t`-of-fixed-shingles special case): R may be arbitrarily larger
    * than L, so Jaccard would miss every true sub-document.
    *
    * Prefix filtering under containment (Chaudhuri et al. 2006 §4): a
    * pair can only qualify if R holds one of L's rare-first prefix
    * tokens of length `|L| − ⌈t·|L|⌉ + 1` — but since containment is
    * one-sided, the R side must index ALL its tokens (the overlap can
    * sit anywhere in R's order). Candidates join L's PREFIX index (rare
    * tokens only — hot tokens never enter the probe side) against the
    * full index under the lossless size bound `|R| ≥ ⌈t·|L|⌉` (R must
    * hold at least the required overlap; with t = 0.5 the ceiling of
    * 0.5·n is exact in doubles, so no rounding subtlety). Verification
    * is exact: `size(array_intersect)` per surviving pair, one
    * correctly-rounded double division — bit-stable, no rounding.
    *
    * Shape: the R-side index is the per-set array
    * RE-EXPLODED from the `sets` aggregate with `(arr, sz)` carried
    * inline — no frequency join, no rank window, and no second
    * verification join for the R side; only L's array joins in
    * afterwards. vs the symmetric two-ranked-sides + two-array-joins
    * formulation this halves the candidate-stage upstream and one of
    * the two verification shuffles. The query is OUTPUT-BOUND: at
    * sf0.1 / t=0.5 it emits 1.64M true containment pairs, and the
    * measured cost is ~4.8 µs/pair (7.9 s best-of-3, local[32], 4g
    * heap, 2026-08-15 — absolute wall time swings ±40% with ambient
    * host load across rounds; the per-pair figure is the stable
    * metric, see SCALE.md). The carried
    * array is one record's own items — bounded per row by construction,
    * the same 100 TB argument as [[jaccardPairs]]'s verification
    * arrays. Candidate volume Σ_token df_prefix(token)·df(token);
    * every join keyed. The R-side positional cap is deliberately
    * dropped: it needs the rank window on the full index, which costs
    * more than the candidates it removes (measured). */
  def containmentPairs(df: DataFrame, idCol: String, itemCol: String,
      minContainment: Double): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      "minContainment must be in (0, 1]")
    val items = df.select(col(idCol).as("id"), col(itemCol).as("item"))
      .repartition(col("id"))
      .dropDuplicates("id", "item")
    val sets = items.groupBy("id")
      .agg(collect_list(col("item")).as("arr"), count(lit(1)).as("sz"))
    val freq = items.groupBy("item").agg(count(lit(1)).as("f"))
    val ranked = items
      .join(freq, "item")
      .join(sets.select("id", "sz"), "id")
      .withColumn("__r", row_number().over(
        Window.partitionBy("id").orderBy(col("f"), col("item"))))
      .select(col("id"), col("item"), col("sz"), col("__r"))
    val need = ceil(lit(minContainment) * col("l.sz")).cast("long")
    val prefix = ranked.where(col("__r") <=
      col("sz") - ceil(lit(minContainment) * col("sz")).cast("long") + 1)
    val rside = sets.select(col("id").as("id_r"), col("arr").as("__ar"),
      col("sz").as("sz_r"), explode(col("arr")).as("item"))
    val cand = prefix.as("l").join(rside.as("r"),
        col("l.item") === col("r.item") && col("l.id") =!= col("r.id_r") &&
          col("r.sz_r") >= need)
      .select(col("l.id").as("id_l"), col("r.id_r").as("id_r"),
        col("r.__ar").as("__ar"), col("r.sz_r").as("sz_r"))
    cand
      .join(sets.select(col("id").as("id_l"), col("arr").as("__al"),
        col("sz").as("sz_l")), "id_l")
      .withColumn("common", size(array_intersect(col("__al"), col("__ar")))
        .cast("long"))
      .withColumn("containment",
        col("common").cast("double") / col("sz_l").cast("double"))
      .where(col("containment") >= minContainment)
      // pair dedup deferred past verification, as in jaccardPairs
      .dropDuplicates("id_l", "id_r")
      .select(col("id_l"), col("id_r"), col("common"),
        col("sz_l").cast("long").as("sz_l"),
        col("sz_r").cast("long").as("sz_r"), col("containment"))
  }
}
