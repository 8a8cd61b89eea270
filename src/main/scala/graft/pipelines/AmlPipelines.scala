package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}
import graft.er._
import graft.ext.Multimodal
import graft.graph.Pregel
import graft.queries.GraphQueries

/** The six reference pipelines (SURVEY.md §0) re-expressed end-to-end over
  * the testdata schemas, each persisting its derived table through the
  * [[Catalog]] — the reference's `df.write.mode('overwrite').saveAsTable`
  * flow (`/root/reference/01_aml_network_analysis.py:245,322,358,378,461`,
  * `02_aml_address_verification.py:152`, `03_aml_entity_resolution.py:68`).
  *
  * Mirrors `RUNME.py`'s linear task DAG (`RUNME.py:19-92`) as one
  * SparkSession running the stages sequentially.
  */
final class AmlPipelines(spark: SparkSession, sfDir: String, warehouseDir: String) {
  val catalog = new Catalog(spark, warehouseDir)

  /** Pipeline 1 — synthetic-identity detection (`01_…py:22-245`):
    * identity graph → degrees → degree-1 shrink → connected components →
    * per-component score. */
  def runSyntheticIdentity(): DataFrame = {
    val g = GraphQueries.sharedAttrGraph(spark, sfDir)
    val deg = g.degrees
    val keepV = g.vertices.join(deg, Seq("id"), "left_outer")
      .where(col("type") === "Person" || coalesce(col("degree"), lit(0L)) > 1)
      .drop("degree")
    val keepIds = keepV.select(col("id"))
    val keepE = g.edges
      .join(keepIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keepIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    val scored = graft.graph.ConnectedComponents
      .run(graft.graph.PropertyGraph(keepV, keepE))
      .groupBy(col("component"))
      .agg(
        count(when(col("type") === "Person", 1)).as("person_ct"),
        count(when(col("type") === "Attr", 1)).as("attr_ct"))
      .withColumn("synth_score", col("attr_ct").cast("double") / col("person_ct"))
      .filter(col("person_ct") > 1)
    catalog.save("synth_scores", scored)
    catalog.table("synth_scores")
  }

  /** Pipeline 2 — structuring/smurfing (`01_…py:250-362`): fan-in motif +
    * threshold, then entity-name resolution joins against the dimension. */
  def runStructuring(): DataFrame = {
    val g = GraphQueries.txnGraph(spark, sfDir)
    val alerts = g.find("(a)-[e1]->(m); (b)-[e2]->(m)")
      .filter(col("a.id") < col("b.id") &&
        (col("e1.amount") + col("e2.amount")) > 300000)
      .select(
        col("a.name").as("l0_name"), col("b.name").as("l1_name"),
        col("m.name").as("beneficiary_name"),
        (col("e1.amount") + col("e2.amount")).as("total_amount"))
    catalog.save("structuring_levels", alerts)
    catalog.table("structuring_levels")
  }

  /** Pipeline 3 — round-tripping (`01_…py:366-405`): cycle motif + amount
    * aggregation across the legs. */
  def runRoundTripping(): DataFrame = {
    val g = GraphQueries.txnGraph(spark, sfDir)
    val rt = g.find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(a)")
      .filter(col("a.id") < col("b.id") && col("a.id") < col("c.id"))
      .select(
        col("a.name").as("origin"), col("b.name").as("hop1"), col("c.name").as("hop2"),
        (col("e1.amount") + col("e2.amount") + col("e3.amount")).as("roundtrip_amount"))
    catalog.save("roundtrips", rt)
    catalog.table("roundtrips")
  }

  /** Pipeline 4 — risk propagation (`01_…py:410-480`): 3 Pregel supersteps. */
  def runRiskPropagation(): DataFrame = {
    val out = GraphQueries.txnGraph(spark, sfDir)
      .pregel
      .withVertexColumn("risk_score", col("risk"),
        coalesce(Pregel.msg + col("risk"), col("risk_score")))
      .sendMsgToDst(Pregel.src("risk_score"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(3)
      .run()
      .select(col("id"), col("risk"), col("risk_score"))
    catalog.save("risk_propagation", out)
    catalog.table("risk_propagation")
  }

  /** Pipeline 5 — address verification (`02_aml_address_verification.py`):
    * address normalization (translate), media fetch replaced by the binary
    * stub codec, classification labels persisted, envelopes filtered. */
  def runAddressVerification(): DataFrame = {
    val addresses = Tables.load(spark, sfDir, "customer")
      .select(
        col("c_custkey").as("entity_id"),
        translate(translate(col("c_name"), ",", ""), " ", "+").as("address_url"))
      .filter(col("address_url").isNotNull)
    val media = Multimodal.withMedia(
        addresses.withColumn("address_url",
          concat(col("address_url"), lit("+id+"), col("entity_id"))), "address_url")
      .withColumn("meta", Multimodal.decodeStubSql(col("media")))
      .withColumn("label", Multimodal.classifyStubSql(col("meta")))
      .select(col("entity_id"), col("address_url"), col("label"))
    catalog.save("streetview", media)
    catalog.table("streetview")
  }

  /** Pipeline 6 — entity resolution (`03_aml_entity_resolution.py`): the
    * config-driven dedupe, run like the reference's second pass. */
  def runEntityResolution(): DataFrame = {
    val dirty = Tables.load(spark, sfDir, "customer").select(
      col("c_custkey").as("unique_id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 100).cast("long").as("bucket"))
    val settings = ErSettings(
      uniqueId = "unique_id",
      blockingRules = Seq("l.bucket = r.bucket"),
      comparisons = Seq(
        ComparisonColumn("name", fuzzy = Some(JaroWinklerLevel(0.9))),
        ComparisonColumn("segment", termFrequency = true)),
      maxIter = 10)
    // materialize the gamma pass once: EM fit and final scoring both
    // consume it, and recomputing means a second JaroWinkler pass over
    // every blocked pair — measured ~2s of the pipeline at sf0.1
    val (scored, _) = EntityResolver.scoredComparisons(dirty, settings,
      materializePairs = true)
    catalog.save("dedupe_scored",
      scored.select(col("unique_id_l"), col("unique_id_r"),
        col("gamma_name"), col("gamma_segment"), col("match_probability")))
    catalog.table("dedupe_scored")
  }

  /** The full linear DAG; returns per-stage row counts. */
  def runAll(): Seq[(String, Long)] = Seq(
    "synth_scores" -> runSyntheticIdentity().count(),
    "structuring_levels" -> runStructuring().count(),
    "roundtrips" -> runRoundTripping().count(),
    "risk_propagation" -> runRiskPropagation().count(),
    "streetview" -> runAddressVerification().count(),
    "dedupe_scored" -> runEntityResolution().count())
}
