package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property graph over two DataFrames, mirroring the reference's
  * `GraphFrame(vertices, edges)` construction
  * (`/root/reference/01_aml_network_analysis.py:109,292,441`).
  *
  * Column contract: `vertices` has an `id` column (plus attributes);
  * `edges` has `src` and `dst` columns (plus attributes). Both stay
  * distributed DataFrames throughout — every graph operator below is a
  * declarative Spark plan (joins/aggregations), so Catalyst handles
  * pushdown, broadcast selection and AQE at any scale.
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {
  require(vertices.columns.contains("id"), "vertices must have an 'id' column")
  require(edges.columns.contains("src") && edges.columns.contains("dst"),
    "edges must have 'src' and 'dst' columns")

  /** Per-vertex edge count over both endpoints (undirected degree), the
    * reference's `g.degrees` (`01_aml_network_analysis.py:123`).
    * One explode + one hash aggregation: a single shuffle on the vertex id,
    * partial map-side combine for free. */
  def degrees: DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** In-degree (edges arriving at each vertex). */
  def inDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))

  /** Out-degree (edges leaving each vertex). */
  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))

  /** Graph pattern matching, the reference's `g.find("(a)-[e]->(b); …")`
    * (`01_aml_network_analysis.py:308-311,376-377`). See [[Motif]]. */
  def find(pattern: String): DataFrame = Motif.find(this, pattern)

  /** Connected components with ids normalized to `min(member id)`
    * (`01_aml_network_analysis.py:144-147`). See [[ConnectedComponents]]. */
  def connectedComponents(maxIter: Int = 25,
      assumeDistinctEdges: Boolean = false): DataFrame =
    ConnectedComponents.run(this, maxIter, assumeDistinctEdges)

  /** Superstep message-passing builder (`01_aml_network_analysis.py:450-459`).
    * See [[Pregel]]. */
  def pregel: Pregel = new Pregel(this)

  /** One-shot message round (GraphFrames `aggregateMessages` surface).
    * See [[AggregateMessages]]. */
  def aggregateMessages: AggregateMessages = new AggregateMessages(this)

  /** Per-vertex triangle count (direction-ignored, each triangle counted
    * once per member, GraphFrames `triangleCount` semantics): canonicalize
    * edges undirected, enumerate ordered triangles a<b<c via two joins,
    * explode members, count. */
  def triangleCount: DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val counts = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("count"))
    vertices.select(col("id"))
      .join(counts, Seq("id"), "left_outer")
      .withColumn("count", coalesce(col("count"), lit(0L)))
  }

  /** Per-vertex local clustering coefficient
    * `2·tri(v) / (deg(v)·(deg(v)−1))` over the canonical undirected
    * simple graph (Watts–Strogatz 1998) — triangles from the same ordered
    * a<b<c enumeration as [[triangleCount]], degree over the DISTINCT
    * undirected edge set (multi-edges collapse, so the denominator counts
    * neighbors, matching the numerator's simple-graph triangles). The
    * coefficient is one double division of exact integers — bit-identical
    * on any engine/partitioning. Vertices with deg < 2 score 0.0. */
  def clusteringCoefficient: DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    vertices.select(col("id"))
      .join(deg, Seq("id"), "left_outer")
      .join(tri, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
  }

  /** Degree assortativity coefficient (Newman 2002): the Pearson
    * correlation of endpoint degrees over the canonical undirected simple
    * graph, both orientations of every edge (the standard symmetric form).
    * Every sum (Σx, Σx², Σxy over the directed endpoint list) is an EXACT
    * integer aggregate — order-independent — and the coefficient is one
    * fixed double expression over those longs, so the result is
    * bit-identical on any engine/partitioning. One row out; the only
    * shuffles are the degree aggregate and two broadcast-ready joins.
    * (At extreme scale Σd·d' can approach Long range — switch the three
    * product sums to DECIMAL(38,0) past ~10¹² edge-endpoint products.) */
  def assortativity: DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val xy = sym
      .join(deg.select(col("id").as("u"), col("d").as("x")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("y")), "v")
    val s = xy.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    // symmetric form: y-marginals equal x-marginals by construction.
    // try_divide: a regular (all-degrees-equal) graph has zero degree
    // variance — assortativity is undefined there, so emit NULL instead
    // of ANSI's divide-by-zero error
    s.select(col("m").cast("long").as("m"),
      try_divide(col("m") * col("sxy") - col("sx") * col("sx"),
        col("m") * col("sxx") - col("sx") * col("sx"))
        .as("assortativity"))
  }

  /** Landmark BFS hop distances over undirected edges (GraphFrames
    * `shortestPaths` surface, relational output). See [[ShortestPaths]]. */
  def shortestPaths(landmarks: Seq[Long], maxIter: Int = 20): DataFrame =
    ShortestPaths.run(this, landmarks, maxIter)

  /** PageRank with damping 0.85 as a [[Pregel]] composition (out-degree
    * weighted push, fixed iterations — the GraphFrames/GraphX formulation;
    * dangling mass is not redistributed). */
  def pageRank(maxIter: Int, resetProb: Double = 0.15): DataFrame = {
    val withDeg = vertices.select(col("id"))
      .join(outDegrees, Seq("id"), "left_outer")
      .withColumn("outDegree", coalesce(col("outDegree"), lit(0L)))
    PropertyGraph(withDeg, edges).pregel
      .withVertexColumn("pagerank", lit(1.0),
        lit(resetProb) + lit(1.0 - resetProb) * coalesce(Pregel.msg, lit(0.0)))
      .sendMsgToDst(Pregel.src("pagerank") / Pregel.src("outDegree"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(maxIter)
      .run()
      .select(col("id"), col("pagerank"))
  }

  /** Strongly connected components with min-member-id normalization
    * (GraphFrames `stronglyConnectedComponents` surface). See
    * [[StronglyConnectedComponents]]. */
  def stronglyConnectedComponents(maxIter: Int = 25): DataFrame =
    StronglyConnectedComponents.run(this, maxIter)

  /** Community detection via synchronous label propagation (GraphFrames
    * `labelPropagation` surface, smallest-label tie-break). See
    * [[LabelPropagation]]. */
  def labelPropagation(maxIter: Int): DataFrame =
    LabelPropagation.run(this, maxIter)

  /** Directed BFS between vertex sets (GraphFrames `bfs` surface,
    * relational minimal-hops output). See [[Bfs]]. */
  def bfs(fromCond: org.apache.spark.sql.Column,
      toCond: org.apache.spark.sql.Column, maxHops: Int): DataFrame =
    Bfs.run(this, fromCond, toCond, maxHops)

  /** Personalized PageRank for many sources at once (GraphFrames
    * `parallelPersonalizedPageRank` surface, sparse relational output).
    * See [[PersonalizedPageRank]]. */
  def parallelPersonalizedPageRank(sources: Seq[Long], maxIter: Int,
      resetProb: Double = 0.15): DataFrame =
    PersonalizedPageRank.run(this, sources, maxIter, resetProb)

  /** Keep only vertices satisfying `cond`, dropping edges touching removed
    * vertices (the reference's degree-1 shrink keeps the subgraph valid,
    * `01_aml_network_analysis.py:119-127`). Two semi-joins against the kept
    * vertex set — broadcast-able when the kept set is small. */
  def filterVertices(cond: org.apache.spark.sql.Column): PropertyGraph = {
    val keep = vertices.filter(cond)
    val ids = keep.select(col("id"))
    val e = edges
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    PropertyGraph(keep, e)
  }

  /** Keep only edges satisfying `cond` (vertices untouched — GraphFrames
    * `filterEdges` semantics). */
  def filterEdges(cond: org.apache.spark.sql.Column): PropertyGraph =
    PropertyGraph(vertices, edges.filter(cond))
}
