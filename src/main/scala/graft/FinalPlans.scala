package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Repo tooling: EXECUTE registered queries and dump their FINAL adaptive
  * plans — PLANS.md's main table records initial plans at sf0.01, where
  * every AQE decision (exchange reuse, shuffle-read coalescing, runtime
  * join downgrades) is still a guess. This runs each query's own
  * QueryExecution to completion (`toRdd.foreach`, the exact plan — a
  * count() or noop write would wrap it in a new execution) and then
  * counts the markers in the now-finalized AdaptiveSparkPlan, so claims
  * like "2-of-7 upstream copies reused on q141" are regenerable facts.
  *
  * Iterative operators (Louvain, SCC, HyperBall…) run many INTERNAL jobs
  * whose plans are not the terminal DataFrame's; for those the row
  * records the final assembly stage only — the per-iteration shape is
  * PlanSpec/SCALE.md territory. Streaming-contract queries are excluded
  * (their work happens in the micro-batch engine, not the terminal
  * sink-table read).
  *
  * Run: `sbt "runMain graft.FinalPlans [q141_basket_jaccard ...]"`
  * (no args = the top-cost bench queries); env SPARK_GRAFT_SF_DIR
  * (default sf0.1 — the bench scale the claims are made at). Prints one
  * markdown row per query; paste into PLANS.md's final-plans section.
  */
object FinalPlans {
  /** Splits a formatted explain of an EXECUTED adaptive plan into
    * (final-plan section, initial-plan section). The final section is
    * everything before the FIRST "== Initial Plan ==" marker; the initial
    * section is truncated at "===== Subqueries" because adaptively-executed
    * subqueries print their own Final/Initial pairs after the main plan —
    * counting their detail rows as the main plan's planned exchanges would
    * silently inflate the "planned N" column. Shared with PlanSpec's
    * final-plan regression test so both parse one way. */
  def sections(p: String): (String, String) = {
    val iInit = p.indexOf("== Initial Plan ==")
    val (fin, rest) = if (iInit >= 0) p.splitAt(iInit) else (p, "")
    val iSub = rest.indexOf("===== Subqueries")
    (fin, if (iSub >= 0) rest.take(iSub) else rest)
  }

  // the consistently-slowest batch queries across BENCH_r0{6,7,8}
  private val DefaultQueries = Seq(
    "q162_basket_containment", "q141_basket_jaccard", "q156_louvain_full",
    "q60_scc", "q91_minhash_chained", "q94_text_dedup_clusters",
    "q108_hyperball_components", "q45_motif_roundtrip4", "q48_incremental_cc",
    "q150_msf_boruvka", "q105_ivfpq_topk", "q118_tfidf_cosine")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val qe = df.queryExecution
      qe.toRdd.foreach(_ => ()) // execute THIS plan; AQE finalizes in place
      val p = qe.explainString(FormattedMode)
      val (fin, init) = FinalPlans.sections(p)
      def c(part: String, m: String) = part.linesIterator.count(_.contains(m))
      // count shuffle Exchange NODES in the initial-plan TREE (header line
      // to the first blank line), not "(N) Exchange" detail headers —
      // formatted explain prints detail sections for every numbered node
      // after the tree (final-plan query-stage internals included), so a
      // detail-header count can pick up final-plan Exchanges that carry
      // distinct operator ids from the initial tree
      def exch(part: String) = part.linesIterator
        .dropWhile(!_.startsWith("== Initial Plan ==")).drop(1)
        .takeWhile(_.trim.nonEmpty)
        .count(_.dropWhile(ch => ch == '+' || ch == '-' || ch == ':' ||
          ch == '*' || ch == ' ').startsWith("Exchange ("))
      assert(p.contains("isFinalPlan=true"),
        s"$name: plan did not finalize (no AQE? empty input?)")
      // final-plan shuffles materialize as ShuffleQueryStage (each holds
      // one Exchange); codegen spans are not annotated in this formatted
      // rendering, so no codegen column — PLANS.md's main table covers
      // whole-stage coverage from the initial plans
      val stages = c(fin, "ShuffleQueryStage")
      println(s"FINAL| $name | ${exch(init)} | $stages | " +
        s"${c(fin, "ReusedExchange")} | ${c(fin, "AQEShuffleRead")} | " +
        s"${c(fin, "BroadcastHashJoin")} | ${c(fin, "SortMergeJoin")} |")
    }
    spark.stop()
  }
}
