package graft.queries

import graft.SparkTestBase

/** Config-perturbation self-consistency gate over the committed fuzz corpus
  * (`tools/fuzz_corpus.tsv`, 240 seeded queries: filtered aggregates with
  * optional HAVING, LEFT/FULL outer joins with ON-clause predicates,
  * ROWS-framed window functions, correlated scalar/EXISTS subqueries,
  * UNION/INTERSECT/EXCEPT [ALL] set operations, and CASE-WHEN grouping
  * keys — see tools/fuzz_gen.py).
  *
  * Every query must return identical rows under default session confs and
  * under a perturbed planner/runtime (AQE off, whole-stage codegen off, a
  * different shuffle partitioning). The corpus dialect is integer-exact or
  * min/max aggregates with a total ORDER BY, so any difference is an engine
  * bug (planner, codegen, or partitioning nondeterminism), never fp
  * reassociation. The same corpus runs cross-engine against DuckDB via
  * tools/fuzz_run.sc + tools/fuzz_check.py (240/240 at sf0.01).
  */
class FuzzSpec extends SparkTestBase {

  private val corpusPath = java.nio.file.Paths.get("tools/fuzz_corpus.tsv")

  test("240 fuzz queries are invariant under AQE/codegen/partitioning changes") {
    assume(java.nio.file.Files.exists(corpusPath), s"missing $corpusPath")
    graft.engine.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val cases = {
      val lines = java.nio.file.Files.readAllLines(corpusPath)
      (0 until lines.size).map { i =>
        val Array(name, sql) = lines.get(i).split("\t", 2)
        (name, sql)
      }
    }
    assert(cases.size >= 200, s"corpus too small: ${cases.size}")

    val baseline = cases.map { case (name, sql) =>
      name -> spark.sql(sql).collect().toSeq
    }.toMap

    val perturb = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.shuffle.partitions" -> "7")
    val saved = perturb.map { case (k, _) => k -> spark.conf.getOption(k) }
    perturb.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val diverged = cases.flatMap { case (name, sql) =>
        val got = spark.sql(sql).collect().toSeq
        val exp = baseline(name)
        if (got == exp) None
        else {
          val firstDiff = got.zip(exp).indexWhere { case (a, b) => a != b }
          Some(s"$name: ${exp.size} vs ${got.size} rows, first diff at row " +
            s"$firstDiff\n  sql: ${sql.take(160)}")
        }
      }
      assert(diverged.isEmpty,
        s"${diverged.size} config-dependent queries:\n${diverged.mkString("\n")}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
