package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native Pregel: a driver-coordinated superstep loop where each
  * superstep is one declarative Spark job (triplet join → message aggregate →
  * vertex update). Mirrors the GraphFrames builder the reference uses for
  * risk propagation (`/root/reference/01_aml_network_analysis.py:450-459`):
  *
  * {{{
  * g.pregel
  *   .withVertexColumn("risk_score", col("risk"),
  *     coalesce(Pregel.msg + col("risk"), col("risk_score")))
  *   .sendMsgToDst(Pregel.src("risk_score"))
  *   .aggMsgs(sum(Pregel.msg))
  *   .setMaxIter(3)
  *   .run()
  * }}}
  *
  * Message expressions reference triplet sides via `Pregel.src("col")` /
  * `Pregel.dst("col")` / `Pregel.edge("col")`; the aggregate and update
  * expressions reference the combined message via `Pregel.msg`.
  *
  * Scale design: per superstep — edges join vertex state on src (and dst
  * only when a dst-referencing message needs it), messages hash-aggregate on
  * the target id (map-side partial agg), vertex state left-joins the
  * aggregated messages. State lineage is truncated per superstep with
  * `localCheckpoint` (the reference's checkpoint pattern, `:122,145`);
  * nothing materializes on the driver.
  */
final class Pregel private[graph] (g: PropertyGraph) {
  private var maxIter = 1
  private var vcName: String = _
  private var vcInit: Column = _
  private var vcUpdate: Column = _
  private var msgToDst: Option[Column] = None
  private var msgToSrc: Option[Column] = None
  private var aggExpr: Column = sum(Pregel.msg)
  private var checkpointDir: Option[String] = None

  def withVertexColumn(name: String, init: Column, update: Column): Pregel = {
    vcName = name; vcInit = init; vcUpdate = update; this
  }
  def sendMsgToDst(msg: Column): Pregel = { msgToDst = Some(msg); this }
  def sendMsgToSrc(msg: Column): Pregel = { msgToSrc = Some(msg); this }
  def aggMsgs(agg: Column): Pregel = { aggExpr = agg; this }
  def setMaxIter(n: Int): Pregel = { maxIter = n; this }

  /** Use a reliable checkpoint directory (HDFS/S3 on a cluster) for the
    * per-superstep lineage truncation instead of the default
    * `localCheckpoint`. Local checkpoints store blocks on executors — an
    * executor loss mid-iteration kills the job on a real cluster — so set
    * this for cluster runs, mirroring the reference's `setCheckpointDir`
    * (`01_aml_network_analysis.py:122,145`). */
  def setCheckpointDir(dir: String): Pregel = { checkpointDir = Some(dir); this }

  def run(): DataFrame = {
    require(vcName != null, "withVertexColumn is required")
    require(msgToDst.nonEmpty || msgToSrc.nonEmpty,
      "at least one of sendMsgToDst/sendMsgToSrc is required")

    val ckpt = Checkpointer(g.vertices.sparkSession, checkpointDir)
    val eCols = g.edges.columns.toSeq
    // lazy checkpoints throughout: supersteps are fixed-count with no
    // per-round action, so each round only MARKS its state for caching and
    // the caller's first action materializes the whole cascade — one job
    // instead of one per superstep, same bounded plan depth/stats
    var v = ckpt.lazily(g.vertices.withColumn(vcName, vcInit))

    // Join only the triplet sides the message expressions actually read —
    // skipping an unused dst-state join halves the per-superstep shuffle.
    // Spark 4's Column hides its expression tree, so detection matches the
    // reserved `__pregel_src__`/`__pregel_dst__` struct aliases in the
    // printed unresolved form. The marker names are internal: user columns
    // cannot collide with them short of deliberately naming a column
    // `__pregel_src__.x`, unlike the bare `src.`/`dst.` prefixes.
    def references(marker: String): Boolean =
      (msgToDst.toSeq ++ msgToSrc.toSeq).exists(_.toString.contains(marker))
    val (needSrc, needDst) =
      (references(Pregel.SrcMarker), references(Pregel.DstMarker))

    for (i <- 1 to maxIter) {
      val vCols = v.columns.toSeq
      val vs = v.select(struct(vCols.map(col): _*).as(Pregel.SrcMarker))
      val vd = v.select(struct(vCols.map(col): _*).as(Pregel.DstMarker))
      var triplets = g.edges
        .select(struct(eCols.map(col): _*).as(Pregel.EdgeMarker))
      if (needSrc) triplets = triplets.join(vs,
        col(s"${Pregel.EdgeMarker}.src") === col(s"${Pregel.SrcMarker}.id"))
      if (needDst) triplets = triplets.join(vd,
        col(s"${Pregel.EdgeMarker}.dst") === col(s"${Pregel.DstMarker}.id"))
      val sends = Seq(
        msgToDst.map(m => triplets.select(
          col(s"${Pregel.EdgeMarker}.dst").as("__vid"), m.as("_pregel_msg"))),
        msgToSrc.map(m => triplets.select(
          col(s"${Pregel.EdgeMarker}.src").as("__vid"), m.as("_pregel_msg")))
      ).flatten.reduce(_ union _)
      val msgs = sends.groupBy("__vid").agg(aggExpr.as("_pregel_msg"))
      // periodic stats reset: each superstep joins the vertex state against
      // messages derived from itself, so inherited sizeInBytes estimates
      // grow ~3x per superstep — see [[Checkpointer.fresh]] for the
      // BigInt-stall failure mode this bounds
      val step = v.join(msgs, v("id") === msgs("__vid"), "left_outer")
        .withColumn(vcName, vcUpdate)
        .drop("__vid", "_pregel_msg")
      v = if (i % 4 == 0) ckpt.lazyFresh(step) else ckpt.lazily(step)
    }
    v
  }
}

/** One-shot message round (GraphFrames `aggregateMessages` surface): join
  * triplets, send expressions to src/dst, aggregate per recipient — a
  * single Pregel superstep without the update loop. Message/agg expressions
  * use the same [[Pregel.src]]/[[Pregel.dst]]/[[Pregel.edge]]/[[Pregel.msg]]
  * accessors. Returns `(id, <agg alias>)` for every vertex that received at
  * least one message. Same scale shape as a superstep: edges join only the
  * referenced vertex sides, one hash aggregate on the recipient id. */
final class AggregateMessages private[graph] (g: PropertyGraph) {
  private var toDst: Option[Column] = None
  private var toSrc: Option[Column] = None

  def sendToDst(msg: Column): AggregateMessages = { toDst = Some(msg); this }
  def sendToSrc(msg: Column): AggregateMessages = { toSrc = Some(msg); this }

  def agg(aggExpr: Column): DataFrame = {
    require(toDst.nonEmpty || toSrc.nonEmpty,
      "at least one of sendToDst/sendToSrc is required")
    val eCols = g.edges.columns.toSeq
    val vCols = g.vertices.columns.toSeq
    def references(marker: String): Boolean =
      (toDst.toSeq ++ toSrc.toSeq).exists(_.toString.contains(marker))
    val vs = g.vertices.select(struct(vCols.map(col): _*).as(Pregel.SrcMarker))
    val vd = g.vertices.select(struct(vCols.map(col): _*).as(Pregel.DstMarker))
    var triplets = g.edges
      .select(struct(eCols.map(col): _*).as(Pregel.EdgeMarker))
    if (references(Pregel.SrcMarker)) triplets = triplets.join(vs,
      col(s"${Pregel.EdgeMarker}.src") === col(s"${Pregel.SrcMarker}.id"))
    if (references(Pregel.DstMarker)) triplets = triplets.join(vd,
      col(s"${Pregel.EdgeMarker}.dst") === col(s"${Pregel.DstMarker}.id"))
    val sends = Seq(
      toDst.map(m => triplets.select(
        col(s"${Pregel.EdgeMarker}.dst").as("id"), m.as("_pregel_msg"))),
      toSrc.map(m => triplets.select(
        col(s"${Pregel.EdgeMarker}.src").as("id"), m.as("_pregel_msg")))
    ).flatten.reduce(_ union _)
    sends.groupBy("id").agg(aggExpr)
  }
}

object Pregel {
  private[graph] val SrcMarker = "__pregel_src__"
  private[graph] val DstMarker = "__pregel_dst__"
  private[graph] val EdgeMarker = "__pregel_edge__"

  /** The combined (post-aggregation) message in update expressions, or the
    * raw message in `aggMsgs` expressions. NULL for vertices that received
    * no message — the reference handles this with `coalesce` (`:456`). */
  val msg: Column = col("_pregel_msg")
  def src(colName: String): Column = col(s"$SrcMarker.$colName")
  def dst(colName: String): Column = col(s"$DstMarker.$colName")
  def edge(colName: String): Column = col(s"$EdgeMarker.$colName")
}
