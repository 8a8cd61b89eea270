package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.graph.ConnectedComponents

/** Repo tooling (test scope): phase-level timings of the q181 sink fold —
  * replicates [[graft.streaming.IncrementalNearDupSink.update]] with a
  * timer around each materialization so the per-micro-batch cost
  * attribution (banding, verification, CC, store appends) is a measured
  * fact, not a guess. Run: `sbt "Test/runMain graft.tools.Q181Profile"`;
  * env `SPARK_GRAFT_SF_DIR` as in Bench. */
object Q181Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs0 = graft.engine.Tables.load(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val mx = docs0.agg(max(col("id"))).head().getLong(0)
    val cuts = Seq(mx / 3, 2 * mx / 3)
    val batches = Seq(
      docs0.where(col("id") <= cuts(0)),
      docs0.where(col("id") > cuts(0) && col("id") <= cuts(1)),
      docs0.where(col("id") > cuts(1)))
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"Q181 $label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    var shKept: Option[DataFrame] = None
    var bkKept: Option[DataFrame] = None
    var acc: Option[DataFrame] = None
    for ((b0, bi) <- batches.zipWithIndex) t(s"batch$bi-total") {
      val batch = t(s"batch$bi-ckpt-batch")(
        b0.dropDuplicates("id").localCheckpoint())
      val (shB, bkB0) = TextDedup.minhashBuckets(
        batch, "id", "text", 5, 16, 4, TextDedup.MirrorMode)
      val bkB = t(s"batch$bi-ckpt-buckets")(bkB0.localCheckpoint())
      val storeCands = bkKept match {
        case Some(bk) => bkB.as("nb").join(bk.as("kb"),
            col("nb.band") === col("kb.band") &&
              col("nb.bucket") === col("kb.bucket"))
          .select(col("kb.id").as("id_l"), col("nb.id").as("id_r"))
          .dropDuplicates("id_l", "id_r")
        case None => batch.sparkSession.emptyDataFrame
          .withColumn("id_l", lit(null).cast("long"))
          .withColumn("id_r", lit(null).cast("long")).limit(0)
      }
      val cands = storeCands.unionByName(TextDedup.chainCandidates(bkB))
        .dropDuplicates("id_l", "id_r")
      val shAll = shKept.map(_.unionByName(shB)).getOrElse(shB)
      // mirrors the sink's candidate-filtered verification (round 11)
      val candIds = cands.select(col("id_l").as("id"))
        .unionByName(cands.select(col("id_r").as("id")))
        .dropDuplicates("id")
      val shCand = shAll.join(candIds, Seq("id"), "left_semi")
        .localCheckpoint(false)
      val edges = t(s"batch$bi-verify-edges")(
        TextDedup.jaccardFromCounts(shCand,
            TextDedup.candidateCommonCounts(shCand, cands), 0.5)
          .select(col("id_l").as("src"), col("id_r").as("dst"))
          .localCheckpoint())
      val cc = t(s"batch$bi-cc")(
        ConnectedComponents.runOnEdges(edges).localCheckpoint())
      val keptCanon = bkKept match {
        case Some(bk) => cc.join(bk.select("id").distinct(), Seq("id"))
          .groupBy("component").agg(min("id").as("kept_canon"))
        case None => cc.limit(0).select(col("component"),
          col("id").as("kept_canon"))
      }
      val batchCc = cc.join(batch.select("id"), Seq("id"))
      val compMin = batchCc.groupBy("component").agg(min("id").as("comp_min"))
      val resolved = batchCc
        .join(compMin, Seq("component"))
        .join(keptCanon, Seq("component"), "left")
        .select(col("id"), coalesce(col("kept_canon"), col("comp_min")).as("canon"))
      val verdictB = t(s"batch$bi-verdict")(batch.select("id")
        .join(resolved, Seq("id"), "left")
        .select(col("id"),
          when(col("canon").isNotNull && col("canon") =!= col("id"), col("canon"))
            .as("dup_of"))
        .localCheckpoint())
      val newKeep = verdictB.where(col("dup_of").isNull).select("id")
      t(s"batch$bi-stores") {
        def appendKept(store: Option[DataFrame], batchSide: DataFrame): Option[DataFrame] = {
          val kept = batchSide.join(newKeep, Seq("id"), "left_semi")
          Some(store.map(_.unionByName(kept)).getOrElse(kept).localCheckpoint())
        }
        shKept = appendKept(shKept, shB)
        bkKept = appendKept(bkKept, bkB)
        acc = Some(acc.map(_.unionByName(verdictB)).getOrElse(verdictB)
          .localCheckpoint())
      }
    }
    s.stop()
  }
}
