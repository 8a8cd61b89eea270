// Cross-engine SQL fuzzer, Spark step: run via `sbt console < tools/fuzz_run.sc`
// after tools/fuzz_gen.py. Reads /tmp/fuzz_queries.tsv, executes each query
// with spark.sql over the registered testdata views, dumps one parquet dir
// per query to /tmp/fuzz_out.
val s = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.extensions","graft.GraftExtensions").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
s.sparkContext.setLogLevel("ERROR")
graft.engine.Tables.registerAll(s, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/tmp/fuzz_queries.tsv"))
var failed = 0
lines.forEach { line =>
  val Array(name, sql) = line.split("\t", 2)
  try s.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"/tmp/fuzz_out/$name")
  catch { case e: Throwable => failed += 1; println(s"FUZZ_FAIL $name: ${e.getMessage.take(120)}") }
}
println(s"FUZZ_RAN ${lines.size} failed $failed")
sys.exit(0)
