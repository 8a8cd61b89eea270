package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.engine.{Catalog, Sources}

class PipelinesSpec extends SparkTestBase {

  test("all six reference pipelines run end-to-end and persist tables") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = new AmlPipelines(spark, "/root/testdata/sf0.001", wh)
    val counts = p.runAll().toMap
    assert(counts.keySet == Set("synth_scores", "structuring_levels",
      "roundtrips", "risk_propagation", "streetview", "dedupe_scored"))
    assert(counts.values.forall(_ > 0), s"empty pipeline output: $counts")
    // derived tables are readable back through the catalog (view re-registration)
    assert(p.catalog.table("risk_propagation").columns.contains("risk_score"))
    assert(spark.table("synth_scores").count() == counts("synth_scores"))
  }
}

class SourcesSpec extends SparkTestBase {

  test("csv with header + inferSchema matches the reference surface") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("dedupe.csv"),
      "org_name,address,country,amount\nacme,1 main st,US,10.5\nacme inc,1 main st,US,3.0\n")
    val df = Sources.csv(spark, dir.toString)
    assert(df.columns.toSeq == Seq("org_name", "address", "country", "amount"))
    assert(df.schema("amount").dataType.typeName == "double") // inferred
    assert(df.count() == 2)
  }

  test("binary file source reads blobs with metadata") {
    val dir = Files.createTempDirectory("graft_bin")
    Files.write(dir.resolve("img1.bin"), Array[Byte](1, 2, 3))
    val df = Sources.binaryFiles(spark, dir.toString, "*.bin")
    val row = df.select("length", "content").head()
    assert(row.getLong(0) == 3L)
    assert(row.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("text source reads per line or whole file") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("a.txt"), "line one\nline two\n")
    val lines = Sources.text(spark, dir.toString)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.count() == 2)
    val whole = Sources.text(spark, dir.toString, wholeFile = true)
    assert(whole.count() == 1)
    assert(whole.head().getString(0).startsWith("line one\nline two"))
  }

  test("upsert merges by key with update-wins semantics and versioned swap") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_upsert").toString
    val cat = new Catalog(spark, wh)
    cat.save("accounts", Seq((1L, "alice", 10.0), (2L, "bob", 20.0))
      .toDF("id", "name", "bal"))
    cat.upsert("accounts",
      Seq((2L, "bob", 25.0), (3L, "carol", 5.0)).toDF("id", "name", "bal"),
      Seq("id"))
    val got = cat.table("accounts")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "alice", 10.0), (2L, "bob", 25.0), (3L, "carol", 5.0)))
    // a second merge stacks on the first snapshot
    cat.upsert("accounts", Seq((1L, "alice", 0.0)).toDF("id", "name", "bal"), Seq("id"))
    assert(cat.table("accounts").where($"id" === 1L)
      .select("bal").as[Double].head() == 0.0)
    assert(cat.table("accounts").count() == 3)
  }

  test("a fresh Catalog over an existing warehouse continues version numbering") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_upsert_restart").toString
    val cat1 = new Catalog(spark, wh)
    cat1.save("t", Seq((1L, "a")).toDF("id", "v"))
    cat1.upsert("t", Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    // new instance, same warehouse: must NOT regenerate __v1 (the
    // errorifexists write would throw) — version derives from disk
    val cat2 = new Catalog(spark, wh)
    cat2.upsert("t", Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    assert(cat2.table("t").count() == 3)
    val vdirs = new java.io.File(s"$wh/t").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("__v")).map(_.getName).sorted
    assert(vdirs.toSeq == Seq("__v1", "__v2"))
  }

  test("vacuum drops superseded snapshots and keeps the newest") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_vacuum").toString
    val cat = new Catalog(spark, wh)
    cat.save("t", Seq((1L, "a")).toDF("id", "v"))
    cat.upsert("t", Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    cat.upsert("t", Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    cat.upsert("t", Seq((4L, "d")).toDF("id", "v"), Seq("id"))
    cat.vacuum("t", keep = 1)
    val vdirs = new java.io.File(s"$wh/t").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("__v")).map(_.getName).toSeq
    assert(vdirs == Seq("__v3"))
    // the live view still reads the surviving snapshot
    assert(cat.table("t").count() == 4)
    intercept[IllegalArgumentException](cat.vacuum("t", keep = 0))
  }

  test("time travel reads any surviving snapshot; history lists them oldest-first") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_timetravel").toString
    val cat = new Catalog(spark, wh)
    cat.save("t", Seq((1L, "a")).toDF("id", "v"))
    cat.upsert("t", Seq((1L, "a2"), (2L, "b")).toDF("id", "v"), Seq("id"))
    cat.upsert("t", Seq((3L, "c")).toDF("id", "v"), Seq("id"))
    assert(cat.history("t") == Seq(1L, 2L))
    // version 1 = the first upsert's snapshot, before key 3 existed
    assert(cat.tableVersion("t", 1).as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b")))
    assert(cat.tableVersion("t", 2).count() == 3)
    // never-existed and vacuumed versions both fail like Delta post-VACUUM
    intercept[IllegalArgumentException](cat.tableVersion("t", 9))
    cat.vacuum("t", keep = 1)
    intercept[IllegalArgumentException](cat.tableVersion("t", 1))
    assert(cat.history("t") == Seq(2L))
  }

  test("csv and json-lines sinks round-trip through their matching sources") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sinks")
    val df = Seq((1L, "a,b", 1.5), (2L, "c\"d", -2.0)).toDF("id", "s", "x")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/jsonl")
    val backCsv = Sources.csv(spark, s"$dir/csv", Some("id LONG, s STRING, x DOUBLE"))
      .as[(Long, String, Double)].collect().toSet
    val backJson = Sources.jsonLines(spark, s"$dir/jsonl", Some("id LONG, s STRING, x DOUBLE"))
      .as[(Long, String, Double)].collect().toSet
    assert(backCsv == Set((1L, "a,b", 1.5), (2L, "c\"d", -2.0)))
    assert(backJson == backCsv)
  }

  test("compact rewrites a many-file table into the target file count") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_compact").toString
    val cat = new Catalog(spark, wh)
    cat.save("shards", (1L to 100L).toDF("id").repartition(8))
    cat.compact("shards", 2)
    assert(cat.table("shards").count() == 100)
    assert(cat.table("shards").inputFiles.length <= 2)
  }

  test("observe() collects pipeline metrics without a second pass") {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation("stats")
    val df = (1L to 50L).toDF("id")
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"),
        org.apache.spark.sql.functions.sum($"id").as("total"))
      .filter($"id" % 2 === 0)
    assert(df.count() == 25)
    // metrics reflect the observed point in the plan (before the filter)
    assert(obs.get("rows") == 50L && obs.get("total") == 1275L)
  }

  test("co-bucketed tables join without an exchange") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_bucket").toString
    val cat = new Catalog(spark, wh)
    val facts = (1L to 1000L).map(i => (i % 97, s"f$i")).toDF("k", "payload")
    val dims = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "attr")
    cat.saveBucketed("b_facts", facts, "k", 8)
    cat.saveBucketed("b_dims", dims, "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the fact-fact (sort-merge) path: broadcast would bypass
      // bucketing for this tiny test fixture
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE b_facts"); spark.sql("DROP TABLE b_dims")
  }

  test("json-lines and orc sources round-trip with schema control") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(dir.resolve("docs.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "spark reads jsonl"}
        |""".stripMargin)
    val inferred = Sources.jsonLines(spark, dir.toString)
    assert(inferred.count() == 2 && inferred.columns.toSet == Set("doc_id", "text"))
    val typed = Sources.jsonLines(spark, dir.toString,
      Some("doc_id BIGINT, text STRING"))
    assert(typed.schema("doc_id").dataType.typeName == "long")
    // orc round-trip keeps values and vectorized-scan pushdown
    val orcDir = Files.createTempDirectory("graft_orc").toString + "/t"
    typed.write.orc(orcDir)
    val back = Sources.orc(spark, orcDir).filter(col("doc_id") === 2)
    assert(back.select("text").as[String].head() == "spark reads jsonl")
    val plan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(doc_id,2)"),
      s"orc scan must push the filter:\n$plan")
  }

  test("partitioned writes lay out per-value dirs and prune at read time") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_part").toString
    val cat = new Catalog(spark, wh)
    val docs = Seq((1L, "en", "hi"), (2L, "en", "yo"), (3L, "de", "hallo"))
      .toDF("doc_id", "lang", "text")
    cat.savePartitioned("p_docs", docs, "lang")
    // hive-style layout: one directory per partition value
    val dirs = new java.io.File(s"$wh/p_docs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("lang=en", "lang=de"))
    val pruned = spark.table("p_docs").filter(col("lang") === "en")
    assert(pruned.count() == 2)
    // the partition filter prunes directories instead of scanning them
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") &&
        "lang#\\d+ = en".r.findFirstIn(plan).nonEmpty,
      s"lang filter must be a partition filter:\n$plan")
  }

  test("catalog overwrite + re-register round-trips") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_cat").toString
    val cat = new Catalog(spark, wh)
    cat.save("t1", Seq((1, "a")).toDF("id", "v"))
    assert(cat.table("t1").count() == 1)
    cat.save("t1", Seq((1, "a"), (2, "b")).toDF("id", "v")) // overwrite
    assert(spark.table("t1").count() == 2)
    assert(cat.listTables().contains("t1")) // SHOW TABLES surface
    cat.drop("t1")
  }
}
