package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.graph.{ConnectedComponents, Motif, Pregel, PropertyGraph}

/** Graph operator coverage (SURVEY.md §2.7) over the driver testdata.
  *
  * Two graphs are derived deterministically from the TPC-H-ish tables:
  *
  *  - the **shared-attribute identity graph**: bipartite Person↔Attr, where
  *    an Attr node is a hundred-dollar account-balance bucket — transposing
  *    the reference's identity graph of shared address/email/phone
  *    (`/root/reference/01_aml_network_analysis.py:91-107`);
  *  - the **pseudo-transaction graph**: directed customer→customer edges
  *    derived from orders (beneficiary = deterministic hash of the order
  *    key), carrying `txn_id` and `amount` — transposing the transaction
  *    graph of `01_aml_network_analysis.py:264-292`.
  *
  * Component ids are normalized to min(member id) and every output is
  * totally ordered, so the DuckDB oracle (recursive-CTE reachability /
  * unrolled supersteps) matches bit-for-bit (SURVEY.md §7.4).
  */
object GraphQueries {

  private final val AttrBase = 10000000L

  /** Bipartite identity graph: customers + acctbal-bucket attribute nodes. */
  private[graft] def sharedAttrGraph(s: SparkSession, dir: String): PropertyGraph = {
    val c = Tables.load(s, dir, "customer")
    val persons = c.select(
      col("c_custkey").cast("long").as("id"),
      col("c_name").as("name"),
      lit("Person").as("type"))
    val attrs = c.select(
      (lit(AttrBase) + floor(col("c_acctbal") / 100)).as("id"),
      lit(null).cast("string").as("name"),
      lit("Attr").as("type")).distinct()
    val edges = c.select(
      col("c_custkey").cast("long").as("src"),
      (lit(AttrBase) + floor(col("c_acctbal") / 100)).as("dst"))
    PropertyGraph(persons.union(attrs), edges)
  }

  private val sharedAttrEdgesSql =
    """SELECT CAST(c_custkey AS BIGINT) AS src,
       CAST(10000000 + floor(c_acctbal/100) AS BIGINT) AS dst FROM customer"""

  /** Directed pseudo-transaction graph derived from orders. The beneficiary
    * key is `1 + (o_orderkey*7919) mod max(c_custkey)` — deterministic and
    * SQL-expressible on both engines. */
  // one driver-side scalar per dataset dir (txnGraph is built by several
  // registered queries; without the memo each build re-runs a max() scan)
  private val nCustCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  private[graft] def txnGraph(s: SparkSession, dir: String): PropertyGraph = {
    val c = Tables.load(s, dir, "customer")
    val nCust: Long = nCustCache.getOrElseUpdate(dir,
      c.agg(max(col("c_custkey"))).head().getLong(0))
    val verts = c.select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      floor(col("c_acctbal")).cast("long").as("risk"))
    val edges = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("src"),
        (lit(1L) + (col("o_orderkey") * lit(7919L)) % lit(nCust)).as("dst"),
        col("o_orderkey").as("txn_id"),
        col("o_totalprice").as("amount"))
      .where(col("src") =!= col("dst"))
    PropertyGraph(verts, edges)
  }

  private[queries] val txnEdgesSql =
    """SELECT * FROM (
         SELECT o_custkey AS src,
                1 + (o_orderkey * 7919) % (SELECT max(c_custkey) FROM customer) AS dst,
                o_orderkey AS txn_id, o_totalprice AS amount
         FROM orders) WHERE src <> dst"""

  /** Undirected degrees (`g.degrees`, reference `:123-124`): one explode +
    * one hash agg — a single shuffle regardless of scale. */
  private val q15 = QDef(
    "q15_degrees",
    (s, dir) => sharedAttrGraph(s, dir).degrees.orderBy("id"),
    Some(s"""WITH e AS ($sharedAttrEdgesSql)
             SELECT id, CAST(count(*) AS BIGINT) AS degree
             FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
             GROUP BY id ORDER BY id"""))

  /** Connected components with min-id normalization (reference `:144-147`).
    * Oracle: recursive-CTE reachability + min over the reachable set. */
  private val q16 = QDef(
    "q16_connected_components",
    (s, dir) => sharedAttrGraph(s, dir)
      .connectedComponents(assumeDistinctEdges = true)
      .select(col("id"), col("component"))
      .orderBy("id"),
    Some(s"""WITH RECURSIVE
             e AS ($sharedAttrEdgesSql),
             eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             nodes AS (SELECT DISTINCT src AS id FROM eb),
             reach(root, node) AS (
               SELECT id, id FROM nodes
               UNION
               SELECT r.root, eb.dst FROM reach r JOIN eb ON r.node = eb.src),
             comp AS (SELECT root AS id, min(node) AS component
                      FROM reach GROUP BY root)
             SELECT id, component FROM comp ORDER BY id"""))

  /** Incremental connected components (streaming-native variant of q16):
    * the same identity-graph edges arrive in three deterministic batches
    * (`src mod 3`) and are folded through
    * [[graft.graph.IncrementalCC.step]] — contracted-graph CC per batch, no
    * full rebuild. Min-member normalization makes the fold exactly equal to
    * one batch CC over the union, so the oracle is q16's recursive CTE
    * verbatim. */
  private val q48 = QDef(
    "q48_incremental_cc",
    (s, dir) => {
      val g = sharedAttrGraph(s, dir)
      val batches = (0 until 3).map(i =>
        g.edges.where(pmod(col("src"), lit(3)) === i))
      val assign = graft.graph.IncrementalCC.runBatches(batches)
      g.vertices
        .join(assign, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
        .orderBy("id")
    },
    q16.oracle)

  /** q177: [[graft.graph.IncrementalCC]] driven through a REAL Structured
    * Streaming source and sink — q48 folds the same three edge batches in
    * a batch loop; this row runs them as a file-source STREAM
    * (`maxFilesPerTrigger = 1`, so each batch file is its own
    * micro-batch) into [[graft.streaming.Streams.IncrementalCCSink]] via
    * `foreachBatch`, the "persist the assignment per micro-batch" path
    * the operator's scaladoc prescribes for production. The terminal
    * assignment is read from the sink after `AvailableNow` termination.
    * Min-member normalization makes the fold equal to one batch CC over
    * the union REGARDLESS of micro-batch order, so file-discovery order
    * does not matter and the oracle is q16's recursive CTE verbatim.
    * Batch inputs are staged to a per-run temp dir (three single-file
    * parquet batches split by `src mod 3` — the q48 split); at scale the
    * source is simply the edge landing directory. The sink runs with
    * `stateDir` — the DURABLE path (atomic per-batch assignment commits,
    * restart-restore, replayed-batchId skip; StreamsSpec drives the
    * actual restart) — so the contract exercises the production
    * configuration, not the single-lifecycle one. */
  private val q177 = QDef(
    "q177_stream_incremental_cc",
    (s, dir) => StreamSession(s) { ss =>
      val g = sharedAttrGraph(ss, dir)
      val edges = g.edges.select(col("src"), col("dst"))
      // staged batches / checkpoint / sink state stay on disk until the
      // returned frame has been fully consumed (it plans over the
      // committed state parquet), so cleanup rides JVM exit via the
      // single shared reaper — one small dir per run, deleted even when
      // Bench loops the query
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q177_").toString)
      stageEdgeBatches(edges, tmp, 0 until 3)
      val sink = new graft.streaming.Streams.IncrementalCCSink(
        stateDir = Some(s"$tmp/state"))
      runCcLifecycle(ss, edges.schema, tmp, sink)
      val assign = sink.current
        .getOrElse(sys.error("stream produced no micro-batches"))
      g.vertices
        .join(assign, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
        .orderBy("id")
    },
    q16.oracle)

  /** Stage each `src mod 3 == i` edge slice (the q48 batch split) as one
    * parquet file `<tmp>/in/batch_<i>.parquet` via [[Staging.stageBatches]]
    * — single-file batches so `maxFilesPerTrigger = 1` makes each slice its
    * own micro-batch. `ids` must be contiguous (file names follow them). */
  private def stageEdgeBatches(edges: DataFrame, tmp: String,
      ids: Seq[Int]): Unit = {
    Staging.stageBatches(
      ids.map(i => edges.where(pmod(col("src"), lit(3)) === i)),
      tmp, startIndex = ids.head)
    ()
  }

  /** One stream lifecycle of the incremental-CC pipeline: file source over
    * `<tmp>/in` (one file per micro-batch) → `foreachBatch` fold into
    * `sink`, `AvailableNow` so the lifecycle terminates once caught up.
    * The checkpoint lives at `<tmp>/ckpt` — a SECOND call over the same
    * tmp resumes from the offset log, exactly like a restarted job. */
  private def runCcLifecycle(ss: SparkSession,
      schema: org.apache.spark.sql.types.StructType, tmp: String,
      sink: graft.streaming.Streams.IncrementalCCSink): Unit = {
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => sink.update(b, id))
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** q178: q177's durable incremental-CC pipeline with a RESTART BOUNDARY
    * inside the contract row itself — the execution spans TWO stream
    * lifecycles over ONE `checkpointLocation` + sink `stateDir`:
    *
    *  1. batches 0 and 1 are staged; lifecycle 1 (`AvailableNow`) folds
    *     them through a first [[graft.streaming.Streams.IncrementalCCSink]]
    *     and terminates — two assignment commits on disk;
    *  2. batch 2 lands; a NEW sink instance (fresh JVM state, same
    *     stateDir) and a NEW query over the SAME checkpoint resume:
    *     the offset log yields only the unseen file, and the sink
    *     restores the committed assignment before folding it.
    *
    * The terminal assignment therefore hash-matches q16's batch-CC oracle
    * ONLY if both recovery paths work: a sink that failed to restore
    * would miss every batch-0/1 edge, and an offset log that replayed
    * from scratch would exercise the replayed-batchId skip. StreamsSpec
    * proves the same recovery at unit level; this row makes it a
    * driver-contract fact (round-9 verdict top-next). */
  private val q178 = QDef(
    "q178_stream_cc_restart",
    (s, dir) => StreamSession(s) { ss =>
      val g = sharedAttrGraph(ss, dir)
      val edges = g.edges.select(col("src"), col("dst"))
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q178_").toString)
      val stateDir = s"$tmp/state"
      // lifecycle 1: two batches, then clean termination
      stageEdgeBatches(edges, tmp, 0 to 1)
      val sink1 = new graft.streaming.Streams.IncrementalCCSink(
        stateDir = Some(stateDir))
      runCcLifecycle(ss, edges.schema, tmp, sink1)
      assert(sink1.current.isDefined, "lifecycle 1 produced no micro-batches")
      // the restart boundary: new data lands, then a fresh sink + query
      // resume over the same checkpoint and state
      stageEdgeBatches(edges, tmp, Seq(2))
      val sink2 = new graft.streaming.Streams.IncrementalCCSink(
        stateDir = Some(stateDir))
      runCcLifecycle(ss, edges.schema, tmp, sink2)
      val assign = sink2.currentOrRestore(ss)
        .getOrElse(sys.error("no committed assignment after restart"))
      g.vertices
        .join(assign, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
        .orderBy("id")
    },
    q16.oracle)

  /** q192: q178's restart boundary in DELTA-COMMIT mode (`snapshotEvery =
    * 2`) — the snapshot+delta roll-forward restore path under the
    * contract (q177/q178 run `snapshotEvery = 1`, where restore reads one
    * parquet snapshot). Lifecycle 1 commits a FULL snapshot for batch 0
    * (the first-ever commit always does — restore needs a base) and an
    * O(batch) DELTA for batch 1; the restarted sink must therefore roll
    * the snapshot forward through the delta before folding batch 2 — a
    * restore that ignored deltas would miss every batch-1 edge, one that
    * replayed batch 0 would hit the batchId skip, and a wrong
    * `sinceSnapshot` restore would mis-schedule the next snapshot; any of
    * these diverges from q16's batch-CC oracle and hash-fails. */
  private val q192 = QDef(
    "q192_stream_cc_delta_restart",
    (s, dir) => StreamSession(s) { ss =>
      val g = sharedAttrGraph(ss, dir)
      val edges = g.edges.select(col("src"), col("dst"))
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q192_").toString)
      val stateDir = s"$tmp/state"
      stageEdgeBatches(edges, tmp, 0 to 1)
      val sink1 = new graft.streaming.Streams.IncrementalCCSink(
        stateDir = Some(stateDir), snapshotEvery = 2)
      runCcLifecycle(ss, edges.schema, tmp, sink1)
      require(sink1.current.isDefined, "lifecycle 1 produced no micro-batches")
      stageEdgeBatches(edges, tmp, Seq(2))
      val sink2 = new graft.streaming.Streams.IncrementalCCSink(
        stateDir = Some(stateDir), snapshotEvery = 2)
      runCcLifecycle(ss, edges.schema, tmp, sink2)
      val assign = sink2.currentOrRestore(ss)
        .getOrElse(sys.error("no committed assignment after restart"))
      g.vertices
        .join(assign, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("component"))
        .orderBy("id")
    },
    q16.oracle)

  /** Landmark shortest paths (GraphFrames `shortestPaths` surface) on the
    * identity graph: BFS hop distance from every reachable vertex to
    * landmarks 1 and 7. Oracle: bounded recursive-CTE walk + min per
    * (node, landmark) — both engines cap depth at 20 hops, far above the
    * graph's diameter. */
  private val q50 = QDef(
    "q50_shortest_paths",
    (s, dir) => graft.graph.ShortestPaths
      .run(sharedAttrGraph(s, dir), Seq(1L, 7L), maxIter = 20)
      .orderBy("id", "landmark"),
    Some(s"""WITH RECURSIVE
             e AS ($sharedAttrEdgesSql),
             eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             walk(landmark, node, d) AS (
               SELECT CAST(landmark AS BIGINT), CAST(landmark AS BIGINT), 0
               FROM (VALUES (1), (7)) t(landmark)
               UNION
               SELECT w.landmark, eb.dst, w.d + 1
               FROM walk w JOIN eb ON w.node = eb.src WHERE w.d < 20)
             SELECT node AS id, landmark, CAST(min(d) AS BIGINT) AS dist
             FROM walk GROUP BY node, landmark
             ORDER BY id, landmark"""))

  /** Structuring/smurfing fan-in motif (reference 5-edge motif + threshold,
    * `:308-319`): two senders into one beneficiary with combined amount over
    * a threshold. Compiled to ordinary equi-joins; no rounding — both
    * engines sum identical doubles. */
  private val q17 = QDef(
    "q17_motif_fanin",
    (s, dir) => txnGraph(s, dir)
      .find("(a)-[e1]->(m); (b)-[e2]->(m)")
      .filter(col("a.id") < col("b.id") &&
        (col("e1.amount") + col("e2.amount")) > 300000)
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"), col("m.id").as("m_id"),
        col("e1.txn_id").as("txn1"), col("e2.txn_id").as("txn2"),
        (col("e1.amount") + col("e2.amount")).as("total"))
      .orderBy("a_id", "b_id", "txn1", "txn2"),
    Some(s"""WITH e AS ($txnEdgesSql)
             SELECT x.src AS a_id, y.src AS b_id, x.dst AS m_id,
                    x.txn_id AS txn1, y.txn_id AS txn2,
                    x.amount + y.amount AS total
             FROM e x JOIN e y ON x.dst = y.dst
             WHERE x.src < y.src AND x.amount + y.amount > 300000
             ORDER BY a_id, b_id, txn1, txn2"""))

  /** Round-tripping cycle motif (reference 4-cycle `:376-399`, here a
    * 3-cycle): money returning to its origin. The repeated vertex names bind
    * via join predicates, not re-scans (SURVEY.md §7.4 risk 3). */
  private val q18 = QDef(
    "q18_motif_cycle",
    (s, dir) => txnGraph(s, dir)
      .find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(a)")
      .filter(col("a.id") < col("b.id") && col("a.id") < col("c.id"))
      .select(
        col("a.id").as("a_id"), col("b.id").as("b_id"), col("c.id").as("c_id"),
        col("e1.txn_id").as("txn1"), col("e2.txn_id").as("txn2"),
        col("e3.txn_id").as("txn3"),
        (col("e1.amount") + col("e2.amount") + col("e3.amount")).as("total"))
      .orderBy("a_id", "b_id", "c_id", "txn1", "txn2", "txn3"),
    Some(s"""WITH e AS ($txnEdgesSql)
             SELECT x.src AS a_id, y.src AS b_id, z.src AS c_id,
                    x.txn_id AS txn1, y.txn_id AS txn2, z.txn_id AS txn3,
                    x.amount + y.amount + z.amount AS total
             FROM e x
             JOIN e y ON x.dst = y.src
             JOIN e z ON y.dst = z.src AND z.dst = x.src
             WHERE x.src < y.src AND x.src < z.src
             ORDER BY a_id, b_id, c_id, txn1, txn2, txn3"""))

  /** Risk propagation: 3 Pregel supersteps, sum-combined messages,
    * `coalesce(msg + risk, old)` update — the exact shape of reference
    * `:450-459`. Integer risk keeps both engines bit-exact (no float
    * summation order issues). Oracle: 3 unrolled join+agg supersteps. */
  private val q19 = QDef(
    "q19_pregel_risk",
    (s, dir) => txnGraph(s, dir)
      .pregel
      .withVertexColumn("risk_score", col("risk"),
        coalesce(Pregel.msg + col("risk"), col("risk_score")))
      .sendMsgToDst(Pregel.src("risk_score"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(3)
      .run()
      .select(col("id"), col("risk"), col("risk_score"))
      .orderBy("id"),
    Some(s"""WITH e AS ($txnEdgesSql),
             v0 AS (SELECT c_custkey AS id,
                           CAST(floor(c_acctbal) AS BIGINT) AS risk,
                           CAST(floor(c_acctbal) AS BIGINT) AS rs
                    FROM customer),
             m1 AS (SELECT e.dst AS id, CAST(sum(v0.rs) AS BIGINT) AS s
                    FROM e JOIN v0 ON e.src = v0.id GROUP BY e.dst),
             v1 AS (SELECT v0.id, v0.risk, coalesce(m1.s + v0.risk, v0.rs) AS rs
                    FROM v0 LEFT JOIN m1 ON v0.id = m1.id),
             m2 AS (SELECT e.dst AS id, CAST(sum(v1.rs) AS BIGINT) AS s
                    FROM e JOIN v1 ON e.src = v1.id GROUP BY e.dst),
             v2 AS (SELECT v1.id, v1.risk, coalesce(m2.s + v1.risk, v1.rs) AS rs
                    FROM v1 LEFT JOIN m2 ON v1.id = m2.id),
             m3 AS (SELECT e.dst AS id, CAST(sum(v2.rs) AS BIGINT) AS s
                    FROM e JOIN v2 ON e.src = v2.id GROUP BY e.dst),
             v3 AS (SELECT v2.id, v2.risk, coalesce(m3.s + v2.risk, v2.rs) AS rs
                    FROM v2 LEFT JOIN m3 ON v2.id = m3.id)
             SELECT id, risk, rs AS risk_score FROM v3 ORDER BY id"""))

  /** Full synthetic-identity pipeline (reference `:119-228`): degrees →
    * prune attribute nodes of degree 1 → connected components → per-component
    * Person/Attr counts, keeping multi-person components (`having
    * person_ct > 1`, `:173`). */
  private val q20 = QDef(
    "q20_synth_identity",
    (s, dir) => {
      val g = sharedAttrGraph(s, dir)
      val deg = g.degrees
      val keepV = g.vertices.join(deg, Seq("id"), "left_outer")
        .where(col("type") === "Person" || coalesce(col("degree"), lit(0L)) > 1)
        .drop("degree")
      val keepIds = keepV.select(col("id"))
      val keepE = g.edges
        .join(keepIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keepIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      ConnectedComponents.run(PropertyGraph(keepV, keepE), assumeDistinctEdges = true)
        .groupBy(col("component"))
        .agg(
          count(when(col("type") === "Person", 1)).as("person_ct"),
          count(when(col("type") === "Attr", 1)).as("attr_ct"))
        .filter(col("person_ct") > 1)
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE
             e AS ($sharedAttrEdgesSql),
             ep AS (SELECT src, dst FROM e WHERE dst IN
                      (SELECT dst FROM e GROUP BY dst HAVING count(*) > 1)),
             eb AS (SELECT src, dst FROM ep UNION ALL SELECT dst, src FROM ep),
             nodes AS (SELECT src AS id FROM eb
                       UNION SELECT CAST(c_custkey AS BIGINT) FROM customer),
             reach(root, node) AS (
               SELECT id, id FROM nodes
               UNION
               SELECT r.root, eb.dst FROM reach r JOIN eb ON r.node = eb.src),
             comp AS (SELECT root AS id, min(node) AS component
                      FROM reach GROUP BY root)
             SELECT component,
                    CAST(count(CASE WHEN id < 1000000 THEN 1 END) AS BIGINT) AS person_ct,
                    CAST(count(CASE WHEN id >= 1000000 THEN 1 END) AS BIGINT) AS attr_ct
             FROM comp GROUP BY component
             HAVING count(CASE WHEN id < 1000000 THEN 1 END) > 1
             ORDER BY component"""))

  /** Per-vertex triangle count on the (direction-ignored) pseudo-txn graph
    * — GraphFrames `triangleCount` semantics, compiled to two joins. */
  private val q42 = QDef(
    "q42_triangle_count",
    (s, dir) => txnGraph(s, dir).triangleCount.orderBy("id"),
    Some(s"""WITH e0 AS ($txnEdgesSql),
             und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                     FROM e0 WHERE src <> dst),
             tri AS (
               SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM und e1
               JOIN und e2 ON e1.b = e2.a
               JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
             m AS (SELECT x AS id FROM tri UNION ALL
                   SELECT y FROM tri UNION ALL
                   SELECT z FROM tri),
             cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS count
                     FROM m GROUP BY id)
             SELECT c.c_custkey AS id, coalesce(cnt.count, 0) AS count
             FROM customer c LEFT JOIN cnt ON c.c_custkey = cnt.id
             ORDER BY id"""))

  /** The reference's exact 5-edge structuring motif
    * (`01_aml_network_analysis.py:308-311`): two 2-hop chains (a→b→c and
    * d→f→c) converging on c, which forwards to g — run over the high-value
    * slice of the pseudo-txn graph, then self-joined on g where the
    * combined final-hop amounts are large (`:317-319`), consumed
    * `selectExpr("graph1.*")`-style (`:321`), and resolved back to entity
    * names as the reference's two UNION ALL DISTINCT chains (`:331-358`;
    * a `chain` tag replaces the reference's positional union so the output
    * is totally ordered for hashing). Vertex names in the motif may
    * coincide (GraphFrames semantics — no implicit distinctness), which the
    * oracle mirrors. */
  private val q44 = QDef(
    "q44_motif_structuring5",
    (s, dir) => {
      val g0 = txnGraph(s, dir)
      val g = PropertyGraph(g0.vertices, g0.edges.filter(col("amount") > 450000))
      val m = g.find("(a)-[e1]->(b); (b)-[e2]->(c); (d)-[e3]->(f); (f)-[e5]->(c); (c)-[e6]->(g)")
      val joined = m.as("graph1")
        .join(m.as("graph2"), col("graph1.g.id") === col("graph2.g.id"))
        .filter(col("graph1.e6.amount") + col("graph2.e6.amount") > 900000)
        .selectExpr("graph1.*")
      // each motif row carries both name chains (a,b,c,g) and (d,f,c,g):
      // explode it into the two tagged 4-tuples IN-PLAN, so the 5-way motif
      // join appears exactly once in one visible plan (no eager checkpoint
      // hiding scan pushdown — PlanSpec asserts this), and name resolution
      // is a single shared 4-join pass instead of one per arm
      val chains = joined.select(explode(array(
          struct(lit("abcg").as("chain"), col("a.id").as("i0"),
            col("b.id").as("i1"), col("c.id").as("i2"), col("g.id").as("i3")),
          struct(lit("dfcg").as("chain"), col("d.id").as("i0"),
            col("f.id").as("i1"), col("c.id").as("i2"), col("g.id").as("i3"))))
          .as("t"))
        .select(col("t.*"))
      val names = g.vertices.select(col("id"), col("name"))
      chains
        .join(names.select(col("id").as("__i0"), col("name").as("l0_name")),
          col("i0") === col("__i0"))
        .join(names.select(col("id").as("__i1"), col("name").as("l1_name")),
          col("i1") === col("__i1"))
        .join(names.select(col("id").as("__i2"), col("name").as("l2_name")),
          col("i2") === col("__i2"))
        .join(names.select(col("id").as("__i3"), col("name").as("l3_name")),
          col("i3") === col("__i3"))
        .select(col("chain"), col("l0_name"), col("l1_name"), col("l2_name"),
          col("l3_name"))
        .distinct()
        .orderBy("chain", "l0_name", "l1_name", "l2_name", "l3_name")
    },
    Some(s"""WITH e0 AS ($txnEdgesSql),
             e AS (SELECT * FROM e0 WHERE amount > 450000),
             m AS (SELECT e1.src a, e1.dst b, e2.dst c, e3.src d, e3.dst f,
                          e6.dst g, e6.amount am6
                   FROM e e1
                   JOIN e e2 ON e2.src = e1.dst
                   JOIN e e5 ON e5.dst = e2.dst
                   JOIN e e3 ON e3.dst = e5.src
                   JOIN e e6 ON e6.src = e2.dst),
             j AS (SELECT g1.* FROM m g1 JOIN m g2 ON g1.g = g2.g
                   WHERE g1.am6 + g2.am6 > 900000),
             nm AS (SELECT c_custkey AS id, c_name AS name FROM customer)
             SELECT * FROM (
               SELECT DISTINCT 'abcg' AS chain, n0.name AS l0_name,
                      n1.name AS l1_name, n2.name AS l2_name, n3.name AS l3_name
               FROM j JOIN nm n0 ON j.a = n0.id JOIN nm n1 ON j.b = n1.id
                      JOIN nm n2 ON j.c = n2.id JOIN nm n3 ON j.g = n3.id
               UNION ALL
               SELECT DISTINCT 'dfcg', n0.name, n1.name, n2.name, n3.name
               FROM j JOIN nm n0 ON j.d = n0.id JOIN nm n1 ON j.f = n1.id
                      JOIN nm n2 ON j.c = n2.id JOIN nm n3 ON j.g = n3.id)
             ORDER BY chain, l0_name, l1_name, l2_name, l3_name"""))

  /** The reference's exact 4-cycle round-tripping motif
    * (`01_aml_network_analysis.py:376-377`) with its name-resolution +
    * aggregated-amount consumption (`:389-399`): original entity, three
    * intermediates, and `int(e1)+int(e2)+int(e3)+int(e4)` as
    * agg_txn_amount. All rotations of a cycle appear, as in GraphFrames;
    * txn ids are carried so the output is totally ordered. */
  private val q45 = QDef(
    "q45_motif_roundtrip4",
    (s, dir) => txnGraph(s, dir)
      .find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(d); (d)-[e4]->(a)")
      .join(broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("__i0"), col("c_name").as("original_entity"))),
        col("a.id") === col("__i0"))
      .join(broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("__i1"), col("c_name").as("intermediate_entity_1"))),
        col("b.id") === col("__i1"))
      .join(broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("__i2"), col("c_name").as("intermediate_entity_2"))),
        col("c.id") === col("__i2"))
      .join(broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("__i3"), col("c_name").as("intermediate_entity_3"))),
        col("d.id") === col("__i3"))
      .select(
        col("original_entity"), col("intermediate_entity_1"),
        col("intermediate_entity_2"), col("intermediate_entity_3"),
        col("e1.txn_id").as("txn1"), col("e2.txn_id").as("txn2"),
        col("e3.txn_id").as("txn3"), col("e4.txn_id").as("txn4"),
        (col("e1.amount").cast("int") + col("e2.amount").cast("int") +
          col("e3.amount").cast("int") + col("e4.amount").cast("int"))
          .cast("long").as("agg_txn_amount"))
      .orderBy("txn1", "txn2", "txn3", "txn4"),
    Some(s"""WITH e AS ($txnEdgesSql),
             cyc AS (SELECT e1.src a, e1.dst b, e2.dst c, e3.dst d,
                            e1.txn_id txn1, e2.txn_id txn2, e3.txn_id txn3, e4.txn_id txn4,
                            CAST(CAST(trunc(e1.amount) AS INTEGER) + CAST(trunc(e2.amount) AS INTEGER) +
                                 CAST(trunc(e3.amount) AS INTEGER) + CAST(trunc(e4.amount) AS INTEGER) AS BIGINT)
                              AS agg_txn_amount
                     FROM e e1
                     JOIN e e2 ON e2.src = e1.dst
                     JOIN e e3 ON e3.src = e2.dst
                     JOIN e e4 ON e4.src = e3.dst AND e4.dst = e1.src),
             nm AS (SELECT c_custkey AS id, c_name AS name FROM customer)
             SELECT n0.name AS original_entity, n1.name AS intermediate_entity_1,
                    n2.name AS intermediate_entity_2, n3.name AS intermediate_entity_3,
                    txn1, txn2, txn3, txn4, agg_txn_amount
             FROM cyc JOIN nm n0 ON cyc.a = n0.id JOIN nm n1 ON cyc.b = n1.id
                      JOIN nm n2 ON cyc.c = n2.id JOIN nm n3 ON cyc.d = n3.id
             ORDER BY txn1, txn2, txn3, txn4"""))

  private val sharedAttrVerticesSql =
    """SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       UNION
       SELECT DISTINCT CAST(10000000 + floor(c_acctbal/100) AS BIGINT) FROM customer"""

  /** Community detection via 2 rounds of synchronous label propagation
    * (GraphFrames `labelPropagation` surface) on the identity graph —
    * smallest-label tie-break makes every round deterministic, so the
    * oracle unrolls the rounds as count + row_number argmax CTEs (the q19
    * pattern for Pregel). */
  private val q58 = QDef(
    "q58_label_propagation",
    (s, dir) => sharedAttrGraph(s, dir).labelPropagation(2).orderBy("id"),
    Some(s"""WITH e AS ($sharedAttrEdgesSql),
             eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             v AS ($sharedAttrVerticesSql),
             l0 AS (SELECT id, id AS label FROM v),
             m1 AS (SELECT eb.dst AS id, l0.label, count(*) AS cnt
                    FROM eb JOIN l0 ON eb.src = l0.id GROUP BY eb.dst, l0.label),
             n1 AS (SELECT id, label FROM (
                      SELECT id, label, row_number() OVER (PARTITION BY id
                        ORDER BY cnt DESC, label) AS rn FROM m1) WHERE rn = 1),
             l1 AS (SELECT v.id, coalesce(n1.label, v.id) AS label
                    FROM v LEFT JOIN n1 ON v.id = n1.id),
             m2 AS (SELECT eb.dst AS id, l1.label, count(*) AS cnt
                    FROM eb JOIN l1 ON eb.src = l1.id GROUP BY eb.dst, l1.label),
             n2 AS (SELECT id, label FROM (
                      SELECT id, label, row_number() OVER (PARTITION BY id
                        ORDER BY cnt DESC, label) AS rn FROM m2) WHERE rn = 1),
             l2 AS (SELECT v.id, coalesce(n2.label, v.id) AS label
                    FROM v LEFT JOIN n2 ON v.id = n2.id)
             SELECT id, label FROM l2 ORDER BY id"""))

  /** Directed BFS between vertex sets (GraphFrames `bfs` surface): minimal
    * hop counts from three origin customers to every high-risk vertex
    * within 3 hops of the pseudo-txn graph. Oracle: bounded recursive-CTE
    * walk + min depth per (origin, node). */
  private val q59 = QDef(
    "q59_bfs",
    (s, dir) => txnGraph(s, dir)
      .bfs(col("id") <= 3, col("risk") >= 9000, maxHops = 3)
      .orderBy("from_id", "to_id"),
    Some(s"""WITH RECURSIVE e AS ($txnEdgesSql),
             v AS (SELECT CAST(c_custkey AS BIGINT) AS id,
                          CAST(floor(c_acctbal) AS BIGINT) AS risk FROM customer),
             walk(origin, node, d) AS (
               SELECT id, id, 0 FROM v WHERE id <= 3
               UNION
               SELECT w.origin, e.dst, w.d + 1
               FROM walk w JOIN e ON w.node = e.src WHERE w.d < 3),
             md AS (SELECT origin, node, min(d) AS hops
                    FROM walk GROUP BY origin, node)
             SELECT origin AS from_id, node AS to_id, CAST(hops AS BIGINT) AS hops
             FROM md JOIN v ON md.node = v.id WHERE v.risk >= 9000
             ORDER BY from_id, to_id"""))

  /** Strongly connected components of the directed pseudo-txn graph
    * (GraphFrames `stronglyConnectedComponents` surface): trim +
    * forward-backward coloring, min-member-id components. Oracle: mutual
    * reachability via a recursive walk — min over the co-reachable set. */
  private val q60 = QDef(
    "q60_scc",
    (s, dir) => txnGraph(s, dir).stronglyConnectedComponents().orderBy("id"),
    Some(s"""WITH RECURSIVE e AS ($txnEdgesSql),
             v AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
             reach(u, w) AS (
               SELECT id, id FROM v
               UNION
               SELECT r.u, e.dst FROM reach r JOIN e ON r.w = e.src),
             scc AS (
               SELECT a.u AS id, min(a.w) AS component
               FROM reach a JOIN reach b ON a.u = b.w AND a.w = b.u
               GROUP BY a.u)
             SELECT id, component FROM scc ORDER BY id"""))

  /** k-core peeling (fixed 3 rounds, k=3) on the pseudo-txn graph — the
    * fixpoint generalization of the reference's one-shot degree-1 shrink
    * (`01_aml_network_analysis.py:119-127`). Fixed-round form so the
    * oracle unrolls identically (the q19 fixed-superstep pattern); the
    * fixpoint variant with convergence detection is spec-covered in
    * GraphSpec. Output: surviving (id, degree) in the 3×-peeled subgraph. */
  private val q69 = QDef(
    "q69_kcore",
    (s, dir) => graft.graph.KCore.pruneRounds(txnGraph(s, dir), k = 3, rounds = 3)
      .orderBy("id"),
    Some(s"""WITH e AS ($txnEdgesSql),
             u0 AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                    FROM e WHERE src <> dst),
             d0 AS (SELECT id, count(*) AS deg FROM
                      (SELECT a AS id FROM u0 UNION ALL SELECT b FROM u0)
                    GROUP BY id),
             k0 AS (SELECT id FROM d0 WHERE deg >= 3),
             u1 AS (SELECT u.a, u.b FROM u0 u
                    JOIN k0 x ON u.a = x.id JOIN k0 y ON u.b = y.id),
             d1 AS (SELECT id, count(*) AS deg FROM
                      (SELECT a AS id FROM u1 UNION ALL SELECT b FROM u1)
                    GROUP BY id),
             k1 AS (SELECT id FROM d1 WHERE deg >= 3),
             u2 AS (SELECT u.a, u.b FROM u1 u
                    JOIN k1 x ON u.a = x.id JOIN k1 y ON u.b = y.id),
             d2 AS (SELECT id, count(*) AS deg FROM
                      (SELECT a AS id FROM u2 UNION ALL SELECT b FROM u2)
                    GROUP BY id),
             k2 AS (SELECT id FROM d2 WHERE deg >= 3),
             u3 AS (SELECT u.a, u.b FROM u2 u
                    JOIN k2 x ON u.a = x.id JOIN k2 y ON u.b = y.id)
             SELECT id, CAST(count(*) AS BIGINT) AS degree FROM
               (SELECT a AS id FROM u3 UNION ALL SELECT b FROM u3)
             GROUP BY id ORDER BY id"""))

  /** Weighted single-source shortest paths as a Pregel MIN-combiner loop
    * (Bellman–Ford over the min-plus semiring; q19 exercises the SUM
    * combiner, this the other half of the builder surface). Fixed 4
    * supersteps, so dist(v) = cheapest cost over paths of ≤ 4 edges from
    * customer 1 — exactly unrollable as a bounded recursive-CTE walk.
    * Weights are integer transaction cents: min over exact integer path
    * sums is deterministic on both engines. NULL plays infinity (min and
    * least both skip nulls), so unreached vertices never surface. */
  private val q85 = QDef(
    "q85_weighted_sssp",
    (s, dir) => {
      val g = txnGraph(s, dir)
      val weighted = PropertyGraph(g.vertices,
        g.edges.select(col("src"), col("dst"),
          floor(col("amount") * 100).cast("long").as("w")))
      weighted.pregel
        .withVertexColumn("dist",
          when(col("id") === 1L, lit(0L)).otherwise(lit(null).cast("long")),
          least(col("dist"), Pregel.msg))
        .sendMsgToDst(Pregel.src("dist") + Pregel.edge("w"))
        .aggMsgs(min(Pregel.msg))
        .setMaxIter(4)
        .run()
        .where(col("dist").isNotNull)
        .select(col("id"), col("dist"))
        .orderBy("id")
    },
    Some(s"""WITH RECURSIVE e AS (
               SELECT src, dst, CAST(floor(amount*100) AS BIGINT) AS w
               FROM ($txnEdgesSql)),
             walk(node, d, hops) AS (
               SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
               UNION ALL
               SELECT e.dst, w.d + e.w, w.hops + 1
               FROM walk w JOIN e ON e.src = w.node WHERE w.hops < 4)
             SELECT node AS id, min(d) AS dist
             FROM walk GROUP BY node ORDER BY id"""))

  /** One-shot `aggregateMessages` round (the GraphFrames surface q19's
    * Pregel loop generalizes): per beneficiary, the exact cents inflow
    * from HIGH-RISK senders only — a conditional message over the src
    * vertex state, sum-aggregated at the recipient. One triplet join +
    * one hash aggregate; vertices with no qualifying inflow drop out
    * (sum of all-null messages is null, mirroring the oracle's pre-filter). */
  private val q86 = QDef(
    "q86_aggregate_messages",
    (s, dir) => txnGraph(s, dir).aggregateMessages
      .sendToDst(when(Pregel.src("risk") >= 5000,
        floor(Pregel.edge("amount") * 100).cast("long")))
      .agg(sum(Pregel.msg).as("risky_in_cents"))
      .where(col("risky_in_cents").isNotNull)
      .orderBy("id"),
    Some(s"""WITH e AS ($txnEdgesSql)
             SELECT e.dst AS id,
                    CAST(sum(CAST(floor(e.amount*100) AS BIGINT)) AS BIGINT)
                      AS risky_in_cents
             FROM e JOIN customer c ON e.src = c.c_custkey
             WHERE floor(c.c_acctbal) >= 5000
             GROUP BY e.dst ORDER BY id"""))

  /** q107: landmark-sampled harmonic/closeness centrality
    * ([[graft.graph.Centrality]], Eppstein–Wang estimator over q50's BFS) —
    * the "short hop from everything" intermediary score. 1/d terms are
    * exact integers via lcm(1..20) scaling, so the only doubles are two
    * final divisions, mirrored verbatim. */
  private val q107 = QDef(
    "q107_harmonic_centrality",
    (s, dir) => graft.graph.Centrality
      .harmonic(sharedAttrGraph(s, dir), Seq(1L, 7L), maxIter = 20)
      .orderBy("id"),
    Some(s"""WITH RECURSIVE
             e AS ($sharedAttrEdgesSql),
             eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             walk(landmark, node, d) AS (
               SELECT CAST(landmark AS BIGINT), CAST(landmark AS BIGINT), 0
               FROM (VALUES (1), (7)) t(landmark)
               UNION
               SELECT w.landmark, eb.dst, w.d + 1
               FROM walk w JOIN eb ON w.node = eb.src WHERE w.d < 20),
             dist AS (SELECT node AS id, landmark, min(d) AS dist
                      FROM walk GROUP BY node, landmark)
             SELECT id, CAST(count(*) AS BIGINT) AS n_reached,
                    CAST(SUM(232792560 // dist) AS DOUBLE) / 232792560 AS harmonic,
                    CAST(count(*) AS DOUBLE) / SUM(dist) AS closeness
             FROM dist WHERE dist > 0
             GROUP BY id ORDER BY id"""))

  /** q108: HyperBall all-vertex neighborhood sketches
    * ([[graft.graph.HyperBall]]), cross-validated against exact connected
    * components: on a bidirectional graph the converged out-ball IS the
    * vertex's component, so every ball-size estimate must land within the
    * sketch's error bound of the exact component size (p=8 → rsd ~6.5%;
    * measured max relative error 0.20 at sf0.01 / 0.13 at sf0.1 —
    * deterministic per corpus, bound 0.35 leaves margin). The oracle pins
    * the exact per-component member counts (q16's recursive CTE) and the
    * provable TRUE; sketch values themselves are xxhash64-dependent and
    * spec-gated in HyperBallSpec. */
  private val q108 = QDef(
    "q108_hyperball_components",
    (s, dir) => {
      val g = sharedAttrGraph(s, dir)
      val bi = g.edges.select(col("src"), col("dst"))
        .union(g.edges.select(col("dst").as("src"), col("src").as("dst")))
      val vs = bi.select(explode(array(col("src"), col("dst"))).as("id")).distinct()
      val hb = graft.graph.HyperBall.run(
        graft.graph.PropertyGraph(vs, bi), p = 8, maxIter = 64)
      val cc = g.connectedComponents(assumeDistinctEdges = true)
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("csize"))
      hb.join(cc.select("id", "component"), Seq("id"))
        .join(sizes, Seq("component"))
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          (min(when(abs(col("ball_size") - col("csize")) / col("csize") <= 0.35,
            1).otherwise(0)) === 1).as("within_bound"))
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE
             e AS ($sharedAttrEdgesSql),
             eb AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             nodes AS (SELECT DISTINCT src AS id FROM eb),
             reach(root, node) AS (
               SELECT id, id FROM nodes
               UNION
               SELECT r.root, eb.dst FROM reach r JOIN eb ON r.node = eb.src),
             comp AS (SELECT root AS id, min(node) AS component
                      FROM reach GROUP BY root)
             SELECT component, CAST(count(*) AS BIGINT) AS n_members,
                    TRUE AS within_bound
             FROM comp GROUP BY component ORDER BY component"""))

  /** q135: Louvain phase-1 community summary — two synchronous
    * exact-integer modularity-gain move rounds from singletons
    * ([[graft.graph.Louvain]]), reported per community (members, internal
    * edges, degree mass, modularity contribution). Oracle unrolls both
    * rounds (the q126 fixed-round pattern). */
  private val q135 = QDef(
    "q135_louvain",
    (s, dir) => {
      val edges = txnGraph(s, dir).edges
      graft.graph.Louvain
        .communityStats(edges, graft.graph.Louvain.phase1(edges, rounds = 2))
        .orderBy("community")
    },
    Some {
      def round(r: Int): String = {
        val l = if (r == 1) "l0" else s"l${r - 1}"
        val dir = if (r % 2 == 1) "<=" else ">="
        s"""kic$r AS (SELECT adj.u, $l.c, CAST(count(*) AS BIGINT) AS kic
                      FROM adj JOIN $l ON $l.v = adj.v GROUP BY adj.u, $l.c),
            cand$r AS (SELECT u, c, max(kic) AS kic FROM (
                         SELECT u, c, kic FROM kic$r
                         UNION ALL SELECT v AS u, c, 0 AS kic FROM $l)
                       GROUP BY u, c),
            sig$r AS (SELECT $l.c, CAST(sum(d.k) AS BIGINT) AS sig
                      FROM $l JOIN deg d ON d.u = $l.v GROUP BY $l.c),
            sc$r AS (SELECT cand$r.u, cand$r.c,
                       2 * m.m * cand$r.kic -
                         (CASE WHEN cand$r.c = lo.c THEN sig$r.sig - d.k
                               ELSE sig$r.sig END) * d.k AS score
                     FROM cand$r
                     JOIN sig$r ON sig$r.c = cand$r.c
                     JOIN deg d ON d.u = cand$r.u
                     JOIN $l lo ON lo.v = cand$r.u AND cand$r.c $dir lo.c
                     CROSS JOIN m),
            l$r AS (SELECT u AS v, c FROM (
                      SELECT sc$r.*, row_number() OVER
                        (PARTITION BY u ORDER BY score DESC, c ASC) AS r
                      FROM sc$r) WHERE r = 1)"""
      }
      s"""WITH e AS ($txnEdgesSql),
          und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                  FROM e WHERE src <> dst),
          adj AS (SELECT a AS u, b AS v FROM und
                  UNION ALL SELECT b AS u, a AS v FROM und),
          deg AS (SELECT u, CAST(count(*) AS BIGINT) AS k
                  FROM adj GROUP BY u),
          m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
          l0 AS (SELECT DISTINCT u AS v, u AS c FROM adj),
          ${round(1)}, ${round(2)},
          internal AS (SELECT la.c, CAST(count(*) AS BIGINT) AS ie
                       FROM und JOIN l2 la ON la.v = und.a
                                JOIN l2 lb ON lb.v = und.b
                       WHERE la.c = lb.c GROUP BY la.c),
          stats AS (SELECT l2.c, CAST(count(*) AS BIGINT) AS n_members,
                           CAST(sum(d.k) AS BIGINT) AS degree_sum
                    FROM l2 JOIN deg d ON d.u = l2.v GROUP BY l2.c)
          SELECT s.c AS community, s.n_members,
                 CAST(coalesce(i.ie, 0) AS BIGINT) AS internal_edges,
                 s.degree_sum,
                 round(CAST(coalesce(i.ie, 0) AS DOUBLE) / m.m -
                   (CAST(s.degree_sum AS DOUBLE) / (2 * m.m)) *
                   (CAST(s.degree_sum AS DOUBLE) / (2 * m.m)), 8)
                   AS modularity_part
          FROM stats s LEFT JOIN internal i ON i.c = s.c CROSS JOIN m
          ORDER BY community"""
    })

  /** q156: FULL multi-level Louvain — two levels of (two synchronous
    * weighted move rounds, contract) per Blondel 2008 §2
    * ([[graft.graph.Louvain.run]]), reported as the q135 community
    * summary over the ORIGINAL graph under the final mapping. The oracle
    * unrolls both levels: the weighted move rounds (kic/σ as weight
    * sums, self-loops contributing 2w to degree mass), the community
    * contraction (inter-community weight sums, internal mass to the
    * super-vertex self-loop), and the original-vertex remap. */
  private val q156 = QDef(
    "q156_louvain_full",
    (s, dir) => {
      val edges = txnGraph(s, dir).edges
      graft.graph.Louvain
        .communityStats(edges,
          graft.graph.Louvain.run(edges, roundsPerLevel = 2, levels = 2))
        .orderBy("community")
    },
    Some {
      // weighted level prelude: adjacency, self-loops, degree mass
      // (2w per self-loop), total weight, singleton seed labels
      def level(lv: Int): String =
        s"""adj_$lv AS MATERIALIZED (SELECT a AS u, b AS v, w FROM und_$lv WHERE a <> b
                        UNION ALL
                        SELECT b AS u, a AS v, w FROM und_$lv WHERE a <> b),
            self_$lv AS MATERIALIZED (SELECT a AS u, w FROM und_$lv WHERE a = b),
            deg_$lv AS MATERIALIZED (SELECT u, CAST(sum(w) AS BIGINT) AS k FROM (
                          SELECT u, w FROM adj_$lv
                          UNION ALL SELECT u, 2 * w AS w FROM self_$lv)
                        GROUP BY u),
            m_$lv AS MATERIALIZED (SELECT CAST(sum(w) AS BIGINT) AS m FROM und_$lv),
            l0_$lv AS MATERIALIZED (SELECT DISTINCT v, v AS c FROM (
                         SELECT u AS v FROM adj_$lv
                         UNION ALL SELECT u AS v FROM self_$lv))"""
      // one weighted synchronous move round (the q135 round with counts
      // generalized to weight sums)
      def round(lv: Int, r: Int): String = {
        val l = s"l${r - 1}_$lv"
        val dir = if (r % 2 == 1) "<=" else ">="
        s"""kic${r}_$lv AS MATERIALIZED (SELECT adj.u, $l.c, CAST(sum(adj.w) AS BIGINT) AS kic
                            FROM adj_$lv adj JOIN $l ON $l.v = adj.v
                            GROUP BY adj.u, $l.c),
            cand${r}_$lv AS MATERIALIZED (SELECT u, c, max(kic) AS kic FROM (
                               SELECT u, c, kic FROM kic${r}_$lv
                               UNION ALL SELECT v AS u, c, 0 AS kic FROM $l)
                             GROUP BY u, c),
            sig${r}_$lv AS MATERIALIZED (SELECT $l.c, CAST(sum(d.k) AS BIGINT) AS sig
                            FROM $l JOIN deg_$lv d ON d.u = $l.v GROUP BY $l.c),
            sc${r}_$lv AS MATERIALIZED (SELECT cand.u, cand.c,
                             2 * m.m * cand.kic -
                               (CASE WHEN cand.c = lo.c THEN sig.sig - d.k
                                     ELSE sig.sig END) * d.k AS score
                           FROM cand${r}_$lv cand
                           JOIN sig${r}_$lv sig ON sig.c = cand.c
                           JOIN deg_$lv d ON d.u = cand.u
                           JOIN $l lo ON lo.v = cand.u AND cand.c $dir lo.c
                           CROSS JOIN m_$lv m),
            l${r}_$lv AS MATERIALIZED (SELECT u AS v, c FROM (
                            SELECT sc.u, sc.c, row_number() OVER
                              (PARTITION BY sc.u
                               ORDER BY sc.score DESC, sc.c ASC) AS rn
                            FROM sc${r}_$lv sc) WHERE rn = 1)"""
      }
      s"""WITH e AS MATERIALIZED ($txnEdgesSql),
          und_1 AS MATERIALIZED (SELECT a, b, CAST(1 AS BIGINT) AS w FROM (
                      SELECT DISTINCT least(src,dst) AS a,
                                      greatest(src,dst) AS b
                      FROM e WHERE src <> dst)),
          ${level(1)}, ${round(1, 1)}, ${round(1, 2)},
          und_2 AS MATERIALIZED (SELECT least(la.c, lb.c) AS a, greatest(la.c, lb.c) AS b,
                           CAST(sum(u1.w) AS BIGINT) AS w
                    FROM und_1 u1 JOIN l2_1 la ON la.v = u1.a
                                  JOIN l2_1 lb ON lb.v = u1.b
                    GROUP BY 1, 2),
          ${level(2)}, ${round(2, 1)}, ${round(2, 2)},
          map AS MATERIALIZED (SELECT l1.v, l2.c FROM l2_1 l1 JOIN l2_2 l2 ON l2.v = l1.c),
          internal AS MATERIALIZED (SELECT la.c, CAST(count(*) AS BIGINT) AS ie
                       FROM und_1 JOIN map la ON la.v = und_1.a
                                  JOIN map lb ON lb.v = und_1.b
                       WHERE la.c = lb.c GROUP BY la.c),
          stats AS MATERIALIZED (SELECT map.c, CAST(count(*) AS BIGINT) AS n_members,
                           CAST(sum(d.k) AS BIGINT) AS degree_sum
                    FROM map JOIN deg_1 d ON d.u = map.v GROUP BY map.c)
          SELECT s.c AS community, s.n_members,
                 CAST(coalesce(i.ie, 0) AS BIGINT) AS internal_edges,
                 s.degree_sum,
                 round(CAST(coalesce(i.ie, 0) AS DOUBLE) / m_1.m -
                   (CAST(s.degree_sum AS DOUBLE) / (2 * m_1.m)) *
                   (CAST(s.degree_sum AS DOUBLE) / (2 * m_1.m)), 8)
                   AS modularity_part
          FROM stats s LEFT JOIN internal i ON i.c = s.c CROSS JOIN m_1
          ORDER BY community"""
    })

  /** q136: HITS hubs & authorities, two fixed power-iteration rounds with
    * integer max-normalization ([[graft.graph.Centrality.hits]]) — exact
    * long floor-divisions, so the oracle unrolls both rounds verbatim. */
  private val q136 = QDef(
    "q136_hits",
    (s, dir) => graft.graph.Centrality
      .hits(txnGraph(s, dir).edges, rounds = 2)
      .orderBy("id"),
    Some {
      def round(r: Int): String = {
        val h = if (r == 1) "h0" else s"h${r - 1}"
        s"""ar$r AS (SELECT e.dst AS id, CAST(sum($h.h) AS BIGINT) AS ar
                     FROM e JOIN $h ON $h.id = e.src GROUP BY e.dst),
            am$r AS (SELECT max(ar) AS am FROM ar$r),
            a$r AS (SELECT v.id,
                      CAST(coalesce((ar * 10000) // am, 0) AS BIGINT) AS a
                    FROM verts v LEFT JOIN ar$r ON ar$r.id = v.id
                    CROSS JOIN am$r),
            hr$r AS (SELECT e.src AS id, CAST(sum(a$r.a) AS BIGINT) AS hr
                     FROM e JOIN a$r ON a$r.id = e.dst GROUP BY e.src),
            hm$r AS (SELECT max(hr) AS hm FROM hr$r),
            h$r AS (SELECT v.id,
                      CAST(coalesce((hr * 10000) // hm, 0) AS BIGINT) AS h
                    FROM verts v LEFT JOIN hr$r ON hr$r.id = v.id
                    CROSS JOIN hm$r)"""
      }
      s"""WITH e0 AS ($txnEdgesSql),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
          verts AS (SELECT DISTINCT id FROM
                      (SELECT src AS id FROM e
                       UNION ALL SELECT dst AS id FROM e)),
          h0 AS (SELECT id, CAST(10000 AS BIGINT) AS h FROM verts),
          ${round(1)}, ${round(2)}
          SELECT h2.id, h2.h AS hub, a2.a AS authority
          FROM h2 JOIN a2 ON a2.id = h2.id ORDER BY h2.id"""
    })

  /** q137: integer-scale PageRank, two fixed rounds
    * ([[graft.graph.Centrality.pageRankInt]]) — exact long floor
    * divisions make plain PageRank hash-gatable (the float formulation
    * is shuffle-order-dependent and stayed spec-only). */
  private val q137 = QDef(
    "q137_pagerank",
    (s, dir) => graft.graph.Centrality
      .pageRankInt(txnGraph(s, dir).edges, rounds = 2)
      .orderBy("id"),
    Some {
      def round(r: Int): String = {
        val p = if (r == 1) "p0" else s"p${r - 1}"
        s"""ct$r AS (SELECT e.dst AS id,
                       CAST(sum($p.pr // od.od) AS BIGINT) AS inmass
                     FROM e JOIN $p ON $p.id = e.src
                            JOIN od ON od.id = e.src
                     GROUP BY e.dst),
            p$r AS (SELECT v.id,
                      CAST((15 * 1000000 + 85 * coalesce(ct$r.inmass, 0))
                           // 100 AS BIGINT) AS pr
                    FROM verts v LEFT JOIN ct$r ON ct$r.id = v.id)"""
      }
      s"""WITH e0 AS ($txnEdgesSql),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
          verts AS (SELECT DISTINCT id FROM
                      (SELECT src AS id FROM e
                       UNION ALL SELECT dst AS id FROM e)),
          od AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS od
                 FROM e GROUP BY src),
          p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM verts),
          ${round(1)}, ${round(2)}
          SELECT id, pr FROM p2 ORDER BY id"""
    })

  /** q165: personalized PageRank from a seed watchlist, two fixed rounds
    * ([[graft.graph.Centrality.personalizedPageRankInt]]) — restart mass
    * returns only to seeds (custkey % 97 = 0), same exact-long floor
    * arithmetic as q137, so the oracle unrolls the rounds verbatim with
    * the seed indicator riding the vertex frame. */
  private val q165 = QDef(
    "q165_personalized_pagerank",
    (s, dir) => {
      val g = txnGraph(s, dir)
      graft.graph.Centrality
        .personalizedPageRankInt(g.edges,
          g.vertices.select(col("id")).where(col("id") % 97 === 0),
          rounds = 2)
        .orderBy("id")
    },
    Some {
      def round(r: Int): String = {
        val p = if (r == 1) "p0" else s"p${r - 1}"
        s"""ct$r AS (SELECT e.dst AS id,
                       CAST(sum($p.pr // od.od) AS BIGINT) AS inmass
                     FROM e JOIN $p ON $p.id = e.src
                            JOIN od ON od.id = e.src
                     GROUP BY e.dst),
            p$r AS (SELECT v.id,
                      CAST((15 * v.seed * 1000000
                            + 85 * coalesce(ct$r.inmass, 0))
                           // 100 AS BIGINT) AS pr
                    FROM verts v LEFT JOIN ct$r ON ct$r.id = v.id)"""
      }
      s"""WITH e0 AS ($txnEdgesSql),
          e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
          verts AS (SELECT id, CASE WHEN id % 97 = 0 THEN 1 ELSE 0 END AS seed
                    FROM (SELECT DISTINCT id FROM
                      (SELECT src AS id FROM e
                       UNION ALL SELECT dst AS id FROM e))),
          od AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS od
                 FROM e GROUP BY src),
          p0 AS (SELECT id, CAST(seed * 1000000 AS BIGINT) AS pr FROM verts),
          ${round(1)}, ${round(2)}
          SELECT id, pr FROM p2 ORDER BY id"""
    })

  /** q138: derandomized maximal matching, three rounds
    * ([[graft.graph.Matching.maximalMatching]]) — both-endpoint local-
    * minimum hash edges per round; the oracle replays each round with
    * per-vertex `row_number` minima and NOT-IN endpoint removal. */
  private val q138 = QDef(
    "q138_maximal_matching",
    (s, dir) => graft.graph.Matching
      .maximalMatching(txnGraph(s, dir).edges, rounds = 3)
      .orderBy("a", "b"),
    Some {
      def round(r: Int): String = {
        val l = if (r == 1) "lh0" else s"lh${r - 1}"
        s"""ends$r AS (SELECT a AS v, h, a, b FROM $l
                       UNION ALL SELECT b AS v, h, a, b FROM $l),
            vm$r AS (SELECT v, h AS mh, a AS ea, b AS eb FROM (
                       SELECT ends$r.*, row_number() OVER
                         (PARTITION BY v ORDER BY h, a, b) AS r
                       FROM ends$r) WHERE r = 1),
            w$r AS (SELECT l.a, l.b FROM $l l
                    JOIN vm$r ma ON ma.v = l.a AND ma.mh = l.h
                                AND ma.ea = l.a AND ma.eb = l.b
                    JOIN vm$r mb ON mb.v = l.b AND mb.mh = l.h
                                AND mb.ea = l.a AND mb.eb = l.b),
            lh$r AS (SELECT l.a, l.b, l.h FROM $l l
                     WHERE l.a NOT IN (SELECT a FROM w$r
                                       UNION ALL SELECT b FROM w$r)
                       AND l.b NOT IN (SELECT a FROM w$r
                                       UNION ALL SELECT b FROM w$r))"""
      }
      s"""WITH e0 AS ($txnEdgesSql),
          l0 AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                 FROM e0 WHERE src <> dst),
          lh0 AS (SELECT a, b,
                    ((a * 1000003 + b) % 1000000007 + 17) * 2654435761
                      % 1000000007 AS h
                  FROM l0),
          ${round(1)}, ${round(2)}, ${round(3)}
          SELECT a, b FROM (SELECT a, b FROM w1
                            UNION ALL SELECT a, b FROM w2
                            UNION ALL SELECT a, b FROM w3)
          ORDER BY a, b"""
    })

  /** q139: landmark betweenness centrality, bounded-horizon Brandes with
    * integer-quantized dependencies ([[graft.graph.Centrality
    * .betweennessInt]]) — landmarks (1, 7), horizon 4, the q107
    * estimator family one rung up (path COUNTS and dependency flow, not
    * just distances). Oracle unrolls 4 forward BFS levels with σ sums
    * and 3 backward dependency levels with the same floor divisions. */
  private val q139 = QDef(
    "q139_betweenness",
    (s, dir) => graft.graph.Centrality
      .betweennessInt(sharedAttrGraph(s, dir).edges, Seq(1L, 7L),
        maxLevels = 4)
      .orderBy("id"),
    Some {
      def fwd(d: Int): String = {
        val p = s"f${d - 1}"; val sp = s"s${d - 1}"
        s"""f$d AS (SELECT $p.landmark, adj.v,
                      CAST(sum($p.sigma) AS BIGINT) AS sigma
                    FROM $p JOIN adj ON adj.u = $p.v
                    WHERE NOT EXISTS (SELECT 1 FROM $sp
                      WHERE $sp.landmark = $p.landmark AND $sp.v = adj.v)
                    GROUP BY $p.landmark, adj.v),
            s$d AS (SELECT * FROM $sp
                    UNION ALL SELECT landmark, v FROM f$d)"""
      }
      def bwd(d: Int): String = {
        val w = s"f${d + 1}"; val dw = s"d${d + 1}"
        s"""c$d AS (SELECT f$d.landmark, f$d.v,
                      CAST(sum((f$d.sigma * (10000 + $dw.delta)) // $w.sigma)
                           AS BIGINT) AS delta
                    FROM f$d JOIN adj ON adj.u = f$d.v
                    JOIN $w ON $w.landmark = f$d.landmark AND $w.v = adj.v
                    JOIN $dw ON $dw.landmark = f$d.landmark AND $dw.v = adj.v
                    GROUP BY f$d.landmark, f$d.v),
            d$d AS (SELECT f$d.landmark, f$d.v,
                      CAST(coalesce(c$d.delta, 0) AS BIGINT) AS delta
                    FROM f$d LEFT JOIN c$d
                      ON c$d.landmark = f$d.landmark AND c$d.v = f$d.v)"""
      }
      s"""WITH e AS ($sharedAttrEdgesSql),
          und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                  FROM e WHERE src <> dst),
          adj AS (SELECT a AS u, b AS v FROM und
                  UNION ALL SELECT b AS u, a AS v FROM und),
          f0 AS (SELECT CAST(landmark AS BIGINT) AS landmark,
                        CAST(landmark AS BIGINT) AS v,
                        CAST(1 AS BIGINT) AS sigma
                 FROM (VALUES (1), (7)) t(landmark)),
          s0 AS (SELECT landmark, v FROM f0),
          ${fwd(1)}, ${fwd(2)}, ${fwd(3)}, ${fwd(4)},
          d4 AS (SELECT landmark, v, CAST(0 AS BIGINT) AS delta FROM f4),
          ${bwd(3)}, ${bwd(2)}, ${bwd(1)}
          SELECT v AS id, CAST(sum(delta) AS BIGINT) AS betweenness_q
          FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2
                UNION ALL SELECT * FROM d3)
          GROUP BY v ORDER BY id"""
    })

  /** q143: maximal independent set, two Luby rounds
    * ([[graft.graph.Matching.maximalIndependentSet]]) — hash-priority
    * local minima; the oracle replays both rounds with per-vertex
    * `row_number` neighbor minima and NOT-IN removals. */
  private val q143 = QDef(
    "q143_mis",
    (s, dir) => graft.graph.Matching
      .maximalIndependentSet(txnGraph(s, dir).edges, rounds = 2)
      .orderBy("v"),
    Some {
      def round(r: Int): String = {
        val lv = s"lv${r - 1}"; val ad = s"adj${r - 1}"
        s"""p$r AS (SELECT v, ((v * 1000003 + 17) % 1000000007)
                           * 2654435761 % 1000000007 AS p
                    FROM $lv),
            nm$r AS (SELECT u, p AS np, v AS nv FROM (
                       SELECT $ad.u, pp.p, $ad.v, row_number() OVER
                         (PARTITION BY $ad.u ORDER BY pp.p, $ad.v) AS r
                       FROM $ad JOIN p$r pp ON pp.v = $ad.v) WHERE r = 1),
            s$r AS (SELECT p$r.v FROM p$r
                    LEFT JOIN nm$r ON nm$r.u = p$r.v
                    WHERE nm$r.u IS NULL OR p$r.p < nm$r.np
                       OR (p$r.p = nm$r.np AND p$r.v < nm$r.nv)),
            dead$r AS (SELECT v FROM s$r
                       UNION SELECT $ad.v FROM $ad
                             JOIN s$r ON s$r.v = $ad.u),
            lv$r AS (SELECT v FROM $lv
                     WHERE v NOT IN (SELECT v FROM dead$r)),
            adj$r AS (SELECT u, v FROM $ad
                      WHERE u IN (SELECT v FROM lv$r)
                        AND v IN (SELECT v FROM lv$r))"""
      }
      s"""WITH e0 AS ($txnEdgesSql),
          und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                  FROM e0 WHERE src <> dst),
          adj0 AS (SELECT a AS u, b AS v FROM und
                   UNION ALL SELECT b AS u, a AS v FROM und),
          lv0 AS (SELECT DISTINCT u AS v FROM adj0),
          ${round(1)}, ${round(2)}
          SELECT v FROM (SELECT v FROM s1 UNION ALL SELECT v FROM s2)
          ORDER BY v"""
    })

  /** q144: time-respecting reachability over the timestamped transaction
    * graph ([[graft.graph.TemporalGraph.earliestArrival]]) — money moves
    * forward in time, so static reachability overcounts layering chains;
    * earliest arrival per (source, vertex) after 4 hops, exact epoch-day
    * integers relaxed by `min`. */
  private val q144 = QDef(
    "q144_temporal_reachability",
    (s, dir) => {
      val nCust = Tables.load(s, dir, "customer")
        .agg(max(col("c_custkey"))).head().getLong(0)
      val te = Tables.load(s, dir, "orders").select(
          col("o_custkey").as("src"),
          (lit(1L) + (col("o_orderkey") * lit(7919L)) % lit(nCust)).as("dst"),
          // o_orderdate reads as TIMESTAMP_NTZ; session is UTC-pinned so
          // the cast is wall-clock-identity, matching DuckDB's epoch_ms
          expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
            .as("t"))
        .where(col("src") =!= col("dst"))
      graft.graph.TemporalGraph.earliestArrival(te, Seq(1L, 7L), rounds = 4)
        .orderBy("source", "v")
    },
    Some {
      def round(r: Int): String = {
        val p = s"a${r - 1}"
        s"""a$r AS (SELECT source, v, min(arrival) AS arrival FROM (
                      SELECT source, v, arrival FROM $p
                      UNION ALL
                      SELECT $p.source, te.dst AS v, te.t AS arrival
                      FROM $p JOIN te ON te.src = $p.v
                      WHERE te.t >= $p.arrival)
                    GROUP BY source, v)"""
      }
      s"""WITH te AS (SELECT DISTINCT o_custkey AS src,
                        1 + (o_orderkey * 7919) %
                          (SELECT max(c_custkey) FROM customer) AS dst,
                        CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS t
                      FROM orders
                      WHERE o_custkey <> 1 + (o_orderkey * 7919) %
                        (SELECT max(c_custkey) FROM customer)),
          a0 AS (SELECT CAST(s AS BIGINT) AS source, CAST(s AS BIGINT) AS v,
                        CAST(-9223372036854775808 AS BIGINT) AS arrival
                 FROM (VALUES (1), (7)) t(s)),
          ${round(1)}, ${round(2)}, ${round(3)}, ${round(4)}
          SELECT source, v, CAST(arrival AS BIGINT) AS arrival FROM a4
          ORDER BY source, v"""
    })

  /** q150: two Borůvka rounds of the minimum spanning forest over the
    * transaction graph ([[graft.graph.MinSpanningForest.boruvka]]) —
    * weights are exact cents of the cheapest parallel transaction, total
    * order (w, a, b) makes the picks unique. Round-unrolled oracle (the
    * q135–q139 convention): per-component argmin via a ranked window,
    * contraction via q16's recursive-CTE components over the PICKED
    * edges only. Full-convergence equivalence to Kruskal is spec-gated
    * (MsfSpec) — the sequential union-find has no SQL mirror. */
  private val q150 = QDef(
    "q150_msf_boruvka",
    (s, dir) => {
      val e = txnGraph(s, dir).edges
        .select(col("src"), col("dst"),
          round(col("amount") * 100).cast("long").as("w"))
      graft.graph.MinSpanningForest.boruvka(e, "w", rounds = 2)
        .orderBy("a", "b")
    },
    Some(s"""WITH RECURSIVE
            e0 AS ($txnEdgesSql),
            ew AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                          min(CAST(round(amount * 100) AS BIGINT)) AS w
                   FROM e0 GROUP BY 1, 2),
            cand1 AS (SELECT a AS c, w, a, b FROM ew
                      UNION ALL SELECT b AS c, w, a, b FROM ew),
            pick1 AS (SELECT DISTINCT a, b, w FROM (
                        SELECT c, w, a, b, row_number() OVER (
                          PARTITION BY c ORDER BY w, a, b) AS rn
                        FROM cand1) WHERE rn = 1),
            pb1 AS (SELECT a AS src, b AS dst FROM pick1
                    UNION ALL SELECT b, a FROM pick1),
            n1 AS (SELECT DISTINCT src AS id FROM pb1),
            reach1(root, node) AS (
              SELECT id, id FROM n1
              UNION
              SELECT r.root, p.dst FROM reach1 r JOIN pb1 p ON r.node = p.src),
            comp1 AS (SELECT root AS id, min(node) AS comp
                      FROM reach1 GROUP BY root),
            live2 AS (SELECT * FROM (
                        SELECT ew.a, ew.b, ew.w,
                               coalesce(ca.comp, ew.a) AS ca,
                               coalesce(cb.comp, ew.b) AS cb
                        FROM ew LEFT JOIN comp1 ca ON ca.id = ew.a
                                LEFT JOIN comp1 cb ON cb.id = ew.b)
                      WHERE ca <> cb),
            cand2 AS (SELECT ca AS c, w, a, b FROM live2
                      UNION ALL SELECT cb AS c, w, a, b FROM live2),
            pick2 AS (SELECT DISTINCT a, b, w FROM (
                        SELECT c, w, a, b, row_number() OVER (
                          PARTITION BY c ORDER BY w, a, b) AS rn
                        FROM cand2) WHERE rn = 1)
            SELECT a, b, w FROM
              (SELECT * FROM pick1 UNION ALL SELECT * FROM pick2)
            ORDER BY a, b"""))

  /** q152: 3-hop layering chains over the transaction graph
    * ([[graft.graph.TemporalGraph.layeringChains]]) — simple paths where
    * each hop is strictly later but within 30 days of the previous and
    * passes on 50–100% of the amount received (exact epoch-day/cent
    * gates riding the joins). The FATF layering typology the reference's
    * static motifs (q44/q45) cannot time-gate. */
  private val q152 = QDef(
    "q152_layering_chains",
    (s, dir) => {
      val nCust = Tables.load(s, dir, "customer")
        .agg(max(col("c_custkey"))).head().getLong(0)
      val te = Tables.load(s, dir, "orders").select(
          col("o_custkey").as("src"),
          (lit(1L) + (col("o_orderkey") * lit(7919L)) % lit(nCust)).as("dst"),
          expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
            .as("t"),
          round(col("o_totalprice") * 100).cast("long").as("amt"))
      graft.graph.TemporalGraph
        .layeringChains(te, hops = 3, windowT = 30L, decayPermille = 500)
        .orderBy("v0", "vk", "t0", "tk", "amt0", "amtk")
    },
    Some(s"""WITH e AS (SELECT DISTINCT * FROM (
                 SELECT o_custkey AS src,
                        1 + (o_orderkey * 7919) %
                          (SELECT max(c_custkey) FROM customer) AS dst,
                        CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS t,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS amt
                 FROM orders) WHERE src <> dst),
            c2 AS (SELECT e1.src AS v0, e2.dst AS head,
                          e1.t AS t0, e2.t AS t_last,
                          e1.amt AS amt0, e2.amt AS amt_last,
                          e1.dst AS p1
                   FROM e e1 JOIN e e2 ON e2.src = e1.dst
                   WHERE e2.t > e1.t AND e2.t <= e1.t + 30
                     AND e2.amt <= e1.amt
                     AND e2.amt * 1000 >= e1.amt * 500
                     AND e2.dst <> e1.src AND e2.dst <> e1.dst),
            c3 AS (SELECT c2.v0, e3.dst AS vk, c2.t0, e3.t AS tk,
                          c2.amt0, e3.amt AS amtk
                   FROM c2 JOIN e e3 ON e3.src = c2.head
                   WHERE e3.t > c2.t_last AND e3.t <= c2.t_last + 30
                     AND e3.amt <= c2.amt_last
                     AND e3.amt * 1000 >= c2.amt_last * 500
                     AND e3.dst <> c2.v0 AND e3.dst <> c2.p1
                     AND e3.dst <> c2.head)
            SELECT v0, vk, t0, tk, amt0, amtk FROM c3
            ORDER BY v0, vk, t0, tk, amt0, amtk"""))

  val all: Seq[QDef] =
    Seq(q15, q16, q17, q18, q19, q20, q42, q44, q45, q48, q50, q58, q59, q60,
      q69, q85, q86, q107, q108, q135, q136, q137, q138, q139, q143, q144,
      q150, q152, q156, q165, q177, q178, q192)
}
