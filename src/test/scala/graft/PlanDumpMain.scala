package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps the PLANS.md marker row for one registered query. Exists because
  * `tools/plans.sc` runs in the sbt console REPL, whose wrapper classloader
  * cannot serialize the PCA kernel's closure (q142: "Prohibited package
  * name: java.sql") — an artifact of the REPL, not of the plan. Run:
  * `sbt "Test/runMain graft.PlanDumpMain q142_scatter_matrix"`.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val p = SparkEntry.queries(name)(s, "/root/testdata/sf0.01")
        .queryExecution.explainString(FormattedMode)
      def c(m: String) = p.linesIterator.count(_.contains(m))
      val pushed = p.linesIterator
        .filter(_.contains("PushedFilters: ["))
        .map(_.trim.stripPrefix("PushedFilters: "))
        .find(_ != "[]").getOrElse("[]").take(60)
      val exch = p.linesIterator.count(l => l.trim.matches("\\(\\d+\\) Exchange"))
      println(s"ROW| $name | ${c("BroadcastHashJoin")} | ${c("SortMergeJoin")} | " +
        s"${c("BroadcastNestedLoopJoin")} | ${c("CartesianProduct")} | $exch | `$pushed` |")
    }
    s.stop()
  }
}
