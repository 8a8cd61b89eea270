package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.ext.{FeatureEncoding, MarketBasket, Sampling, TfIdf, TimeSeries}
import graft.graph.LinkPrediction

/** Behavioral / affinity analytics over the event log and baskets, plus
  * the lexical similarity join — q112–q118. Each operator's scale shape is
  * documented on its implementation ([[TimeSeries]], [[MarketBasket]],
  * [[LinkPrediction]], [[TfIdf]], [[Sampling.prioritySample]]); every
  * query here is a thin registration with a full DuckDB oracle.
  */
object AnalyticsQueries {

  /** q112: link prediction on the transaction graph — common-neighbor
    * count + integer-quantized Resource-Allocation index for unobserved
    * pairs (reference graph per `01_aml_network_analysis.py`'s txn shape;
    * scoring per Zhou/Lü/Zhang 2009). Hub centers capped at degree 64
    * before the wedge join — the O(d²) explosion guard. */
  private val q112 = QDef(
    "q112_link_prediction",
    (s, dir) => LinkPrediction
      .resourceAllocation(GraphQueries.txnGraph(s, dir).edges,
        hubCap = 64, minCommon = 3)
      .orderBy("x", "y"),
    Some(s"""WITH e0 AS (${GraphQueries.txnEdgesSql}),
             und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                     FROM e0 WHERE src <> dst),
             adj AS (SELECT a AS u, b AS v FROM und
                     UNION ALL SELECT b AS u, a AS v FROM und),
             deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
             cand AS (SELECT a1.v AS x, a2.v AS y, 1000000000 // sd.d AS w
                      FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
                      JOIN deg sd ON sd.u = a1.u AND sd.d <= 64),
             scored AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cn,
                               CAST(sum(w) AS BIGINT) AS ra_q
                        FROM cand GROUP BY x, y HAVING count(*) >= 3)
             SELECT x, y, cn, ra_q FROM scored s
             WHERE NOT EXISTS (SELECT 1 FROM und
                               WHERE und.a = s.x AND und.b = s.y)
             ORDER BY x, y"""))

  /** q113: ordered conversion funnel view → click → purchase, each step
    * within 24h of the previous step's anchor. */
  private val q113 = QDef(
    "q113_funnel",
    (s, dir) => TimeSeries.funnel(Tables.load(s, dir, "events"),
      steps = Seq("view", "click", "purchase"), windowHours = 24),
    Some("""WITH s1 AS (SELECT user_id AS uid, min(ts) AS anchor FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id AS uid, min(e.ts) AS anchor
                   FROM events e JOIN s1 ON e.user_id = s1.uid
                   WHERE e.event_type = 'click' AND e.ts > s1.anchor
                     AND e.ts <= s1.anchor + INTERVAL 24 HOURS
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id AS uid, min(e.ts) AS anchor
                   FROM events e JOIN s2 ON e.user_id = s2.uid
                   WHERE e.event_type = 'purchase' AND e.ts > s2.anchor
                     AND e.ts <= s2.anchor + INTERVAL 24 HOURS
                   GROUP BY e.user_id),
            counts AS (
              SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                     CAST(count(*) AS BIGINT) AS users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3),
            base AS (SELECT users AS base_users FROM counts WHERE step = 1)
            SELECT step, event_type, users,
                   round(users * 100.0 / base_users, 2) AS conv_pct
            FROM counts CROSS JOIN base ORDER BY step"""))

  /** q114: rolling z-score anomaly detection — each event vs the same
    * user's previous ≤16 values (≥8 required), explicit sum-of-squares
    * variance for cross-engine bit-stability, |z| > 2.5 flagged. */
  /** Shared with the streaming anomaly contract rows (q199/q200). */
  private[queries] def anomalyOracle: Option[String] = q114.oracle

  private val q114 = QDef(
    "q114_anomaly_zscore",
    (s, dir) => TimeSeries.rollingZScore(Tables.load(s, dir, "events"),
        lookback = 16, minObs = 8, threshold = 2.5)
      .orderBy("user_id", "event_id"),
    Some("""WITH o AS (SELECT user_id, ts, event_id, value,
                   count(value) OVER w AS cnt, sum(value) OVER w AS s,
                   sum(value * value) OVER w AS ss
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING)),
            z AS (SELECT user_id, event_id, value,
                         (value - s/cnt) / sqrt((ss - s*s/cnt)/(cnt-1)) AS z
                  FROM o WHERE cnt >= 8 AND (ss - s*s/cnt) > 0)
            SELECT user_id, event_id, value, round(z, 3) AS z
            FROM z WHERE abs(z) > 2.5 ORDER BY user_id, event_id"""))

  /** q115: market-basket pair lift over order lines — co-occurrence
    * counts + lift from exact integer supports. */
  private val q115 = QDef(
    "q115_copurchase_lift",
    (s, dir) => MarketBasket.pairLift(Tables.load(s, dir, "lineitem"),
        basketCol = "l_orderkey", itemCol = "l_partkey", minSupport = 2)
      .orderBy("p1", "p2"),
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                           FROM lineitem),
            n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
            pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS c
                   FROM items GROUP BY pk),
            pairs AS (SELECT i1.pk AS p1, i2.pk AS p2,
                             CAST(count(*) AS BIGINT) AS cab
                      FROM items i1
                      JOIN items i2 ON i1.ok = i2.ok AND i1.pk < i2.pk
                      GROUP BY i1.pk, i2.pk HAVING count(*) >= 2)
            SELECT p1, p2, cab, c1.c AS c1, c2.c AS c2,
                   round(cab * n.n / (c1.c * c2.c), 4) AS lift
            FROM pairs JOIN pc c1 ON p1 = c1.pk JOIN pc c2 ON p2 = c2.pk
            CROSS JOIN n ORDER BY p1, p2"""))

  /** q116: weight-proportional corpus subsample (priority sampling,
    * Duffield-Lund-Thorup) — 100 documents by n_chars weight,
    * deterministic via the SQL-mirrorable arithmetic hash. */
  private val q116 = QDef(
    "q116_priority_sample",
    (s, dir) => Sampling.prioritySample(Tables.load(s, dir, "documents"),
        idCol = "doc_id", weightCol = "n_chars", k = 100, seed = 17)
      .select(col("doc_id"), col("n_chars"), col("priority")),
    Some("""WITH p AS (SELECT doc_id, n_chars,
                 round(n_chars * 1000004.0 /
                   (((doc_id % 1000003 + 17) * 2654435761)
                      % 1000000007 % 1000003 + 1), 4) AS priority
               FROM documents)
            SELECT doc_id, n_chars, priority FROM p
            ORDER BY priority DESC, doc_id LIMIT 100"""))

  /** q117: EWMA(α=1/2) smoothing of each user's value series over the
    * last 8 observations — exact binary weights + fixed-order sums keep
    * the double arithmetic bit-identical across engines. */
  private val q117 = QDef(
    "q117_ewma",
    (s, dir) => TimeSeries.ewmaHalf(Tables.load(s, dir, "events"), terms = 8)
      .select(col("user_id"), col("event_id"), col("value"), col("ewma"))
      .orderBy("user_id", "event_id"),
    Some {
      val terms = (0 until 8).map { k =>
        val w = java.math.BigDecimal.valueOf(math.pow(0.5, k)).toPlainString
        (s"CASE WHEN x$k IS NOT NULL THEN x$k * $w ELSE 0.0 END",
          s"CASE WHEN x$k IS NOT NULL THEN $w ELSE 0.0 END")
      }
      val lagCols = (0 until 8)
        .map(k => s"lag(value, $k) OVER w AS x$k").mkString(", ")
      s"""WITH o AS (SELECT user_id, event_id, value, $lagCols
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT user_id, event_id, value,
                 round((${terms.map(_._1).mkString(" + ")}) /
                       (${terms.map(_._2).mkString(" + ")}), 4) AS ewma
          FROM o ORDER BY user_id, event_id"""
    })

  /** q118: TF-IDF cosine similarity join over the document corpus —
    * inverted-index candidates with the df cut, integer-quantized IDF so
    * dot products and norms are exact. */
  private val q118 = QDef(
    "q118_tfidf_cosine",
    (s, dir) => TfIdf.cosinePairs(Tables.load(s, dir, "documents"),
        minCosine = 0.5, dfCapRatio = 0.5)
      .orderBy("d1", "d2"),
    Some("""WITH tf AS (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+')) AS term
                 FROM documents),
            tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                    FROM tf GROUP BY doc_id, term),
            n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tfc),
            dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                    FROM tfc GROUP BY term),
            kept AS (SELECT tfc.doc_id, tfc.term,
                       tf * CAST(floor(ln(CAST(n.n AS DOUBLE)/df)*1000 + 0.5)
                                 AS BIGINT) AS w
                     FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n
                     WHERE df <= n.n * 0.5),
            norms AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS n2
                      FROM kept GROUP BY doc_id),
            dots AS (SELECT k1.doc_id AS d1, k2.doc_id AS d2,
                            CAST(sum(k1.w * k2.w) AS BIGINT) AS dot
                     FROM kept k1
                     JOIN kept k2 ON k1.term = k2.term
                                 AND k1.doc_id < k2.doc_id
                     GROUP BY k1.doc_id, k2.doc_id),
            cos AS (SELECT d1, d2, dot,
                      dot / (sqrt(CAST(n1.n2 AS DOUBLE)) *
                             sqrt(CAST(n2.n2 AS DOUBLE))) AS cosine
                    FROM dots JOIN norms n1 ON d1 = n1.doc_id
                              JOIN norms n2 ON d2 = n2.doc_id)
            SELECT d1, d2, dot, round(cosine, 4) AS cosine
            FROM cos WHERE cosine >= 0.5 ORDER BY d1, d2"""))

  /** q119: per-vertex local clustering coefficient on the transaction
    * graph (Watts–Strogatz) — exact triangle/degree integers, the
    * coefficient a single division of exact values. */
  private val q119 = QDef(
    "q119_clustering_coeff",
    (s, dir) => GraphQueries.txnGraph(s, dir).clusteringCoefficient
      .orderBy("id"),
    Some(s"""WITH e0 AS (${GraphQueries.txnEdgesSql}),
             und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                     FROM e0 WHERE src <> dst),
             deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM
                       (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
                     GROUP BY id),
             tri AS (
               SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM und e1
               JOIN und e2 ON e1.b = e2.a
               JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
             cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM
                       (SELECT x AS id FROM tri UNION ALL
                        SELECT y FROM tri UNION ALL SELECT z FROM tri)
                     GROUP BY id),
             base AS (SELECT c.c_custkey AS id,
                             coalesce(deg.degree, 0) AS degree,
                             coalesce(cnt.triangles, 0) AS triangles
                      FROM customer c
                      LEFT JOIN deg ON c.c_custkey = deg.id
                      LEFT JOIN cnt ON c.c_custkey = cnt.id)
             SELECT id, degree, triangles,
                    CASE WHEN degree >= 2
                         THEN (2.0 * triangles) / (degree * (degree - 1))
                         ELSE 0.0 END AS coeff
             FROM base ORDER BY id"""))

  /** q120: first-order Markov transition matrix of event types per user —
    * exact transition counts + row-normalized probabilities. */
  private val q120 = QDef(
    "q120_transition_matrix",
    (s, dir) => TimeSeries.transitionMatrix(Tables.load(s, dir, "events"))
      .orderBy("prev_type", "next_type"),
    Some("""WITH pairs AS (
              SELECT prev_type, event_type AS next_type,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT event_type,
                           lag(event_type, 1) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             AS prev_type
                    FROM events)
              WHERE prev_type IS NOT NULL
              GROUP BY prev_type, event_type),
            totals AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS total
                       FROM pairs GROUP BY prev_type)
            SELECT p.prev_type, p.next_type, p.cnt, p.cnt / t.total AS prob
            FROM pairs p JOIN totals t ON p.prev_type = t.prev_type
            ORDER BY p.prev_type, p.next_type"""))

  /** q121: smoothed mean target encoding (m-estimate, m=10) of the
    * document `source` category against the embedding label joined on id
    * — exact per-category counts/sums, prior-shrunk encoding. */
  private val q121 = QDef(
    "q121_target_encoding",
    (s, dir) => {
      val joined = Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("label")), "doc_id")
      graft.ext.FeatureEncoding.targetEncode(joined, "source", "label", m = 10.0)
        .orderBy("source")
    },
    Some("""WITH j AS (SELECT d.source, e.label
                       FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
            per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(label) AS BIGINT) AS sum_y
                    FROM j GROUP BY source),
            g AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                         CAST(sum(label) AS BIGINT) AS sum_all FROM j)
            SELECT source, n, sum_y,
                   (sum_y + 10.0 * (sum_all / n_all)) / (n + 10.0) AS enc
            FROM per CROSS JOIN g ORDER BY source"""))

  /** q122: item-item collaborative-filtering neighbors — cosine over
    * basket-incidence vectors from exact supports, top-5 per item. */
  private val q122 = QDef(
    "q122_item_neighbors",
    (s, dir) => MarketBasket.itemNeighbors(Tables.load(s, dir, "lineitem"),
        basketCol = "l_orderkey", itemCol = "l_partkey",
        k = 5, minSupport = 2)
      .orderBy("item", "rank"),
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                           FROM lineitem),
            pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS c
                   FROM items GROUP BY pk),
            pairs AS (SELECT i1.pk AS p1, i2.pk AS p2,
                             CAST(count(*) AS BIGINT) AS cab
                      FROM items i1
                      JOIN items i2 ON i1.ok = i2.ok AND i1.pk < i2.pk
                      GROUP BY i1.pk, i2.pk HAVING count(*) >= 2),
            wc AS (SELECT p1, p2, cab, c1.c AS c1, c2.c AS c2
                   FROM pairs JOIN pc c1 ON p1 = c1.pk
                              JOIN pc c2 ON p2 = c2.pk),
            sym AS (SELECT p1 AS item, p2 AS neighbor, cab,
                           cab / (sqrt(CAST(c1 AS DOUBLE)) *
                                  sqrt(CAST(c2 AS DOUBLE))) AS cosine
                    FROM wc
                    UNION ALL
                    SELECT p2, p1, cab,
                           cab / (sqrt(CAST(c2 AS DOUBLE)) *
                                  sqrt(CAST(c1 AS DOUBLE))) AS cosine
                    FROM wc),
            r AS (SELECT item, neighbor, cab, cosine,
                         row_number() OVER (PARTITION BY item
                           ORDER BY cosine DESC, neighbor) AS rank
                  FROM sym)
            SELECT item, neighbor, cab, round(cosine, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY item, rank"""))

  /** q123: degree assortativity of the transaction graph (Newman 2002) —
    * exact integer moment sums, one double expression. */
  private val q123 = QDef(
    "q123_assortativity",
    (s, dir) => GraphQueries.txnGraph(s, dir).assortativity,
    Some(s"""WITH e0 AS (${GraphQueries.txnEdgesSql}),
             und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                     FROM e0 WHERE src <> dst),
             deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM
                       (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
                     GROUP BY id),
             sym AS (SELECT a AS u, b AS v FROM und
                     UNION ALL SELECT b AS u, a AS v FROM und),
             xy AS (SELECT dx.d AS x, dy.d AS y
                    FROM sym JOIN deg dx ON sym.u = dx.id
                             JOIN deg dy ON sym.v = dy.id),
             s AS (SELECT CAST(count(*) AS BIGINT) AS m,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(x * x) AS BIGINT) AS sxx,
                          CAST(sum(x * y) AS BIGINT) AS sxy
                   FROM xy)
             SELECT m, (m * sxy - sx * sx) / (m * sxx - sx * sx)
                      AS assortativity
             FROM s"""))

  /** q124: per-entity flow concentration over the transaction graph — the
    * AML money-flow profile (in/out totals, counts, net). Two keyed
    * aggregates + one full-outer join; sums of 2-decimal amounts rounded
    * back to their own grain (safe: the nearest 2-decimal value is
    * unambiguous at ~1e-10 accumulation error). */
  private val q124 = QDef(
    "q124_flow_stats",
    (s, dir) => {
      val e = GraphQueries.txnGraph(s, dir).edges
      val out = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("out_n"), round(sum(col("amount")), 2).as("out_total"))
      val in = e.groupBy(col("dst").as("id"))
        .agg(count(lit(1)).as("in_n"), round(sum(col("amount")), 2).as("in_total"))
      out.join(in, Seq("id"), "full_outer")
        .select(col("id"),
          coalesce(col("out_n"), lit(0L)).cast("long").as("out_n"),
          coalesce(col("out_total"), lit(0.0)).as("out_total"),
          coalesce(col("in_n"), lit(0L)).cast("long").as("in_n"),
          coalesce(col("in_total"), lit(0.0)).as("in_total"),
          round(coalesce(col("in_total"), lit(0.0)) -
            coalesce(col("out_total"), lit(0.0)), 2).as("net"))
        .orderBy("id")
    },
    Some(s"""WITH e AS (${GraphQueries.txnEdgesSql}),
             o AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS out_n,
                          round(sum(amount), 2) AS out_total
                   FROM e GROUP BY src),
             i AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS in_n,
                          round(sum(amount), 2) AS in_total
                   FROM e GROUP BY dst)
             SELECT coalesce(o.id, i.id) AS id,
                    coalesce(out_n, 0) AS out_n,
                    coalesce(out_total, 0.0) AS out_total,
                    coalesce(in_n, 0) AS in_n,
                    coalesce(in_total, 0.0) AS in_total,
                    round(coalesce(in_total, 0.0) - coalesce(out_total, 0.0), 2)
                      AS net
             FROM o FULL OUTER JOIN i ON o.id = i.id
             ORDER BY id"""))

  /** q125: Benford first-digit analysis of transaction amounts — the
    * classic forensic-accounting fraud signal. The leading digit comes
    * from exact integer cents via a CASE ladder (no log10 of the value —
    * immune to ULP flips at powers of ten); expected counts use the nine
    * Benford probabilities as identical literals on both engines. */
  private val q125 = QDef(
    "q125_benford",
    (s, dir) => {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      // ascending fold -> the OUTERMOST case tests the largest power first
      val digit = (0 to 9).foldLeft(lit(0L): org.apache.spark.sql.Column) {
        (els, k) =>
          val p = math.pow(10, k).toLong
          when(cents >= p, (cents / p).cast("long")).otherwise(els)
      }
      val d = Tables.load(s, dir, "orders")
        .select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("obs"))
      // Benford probability as a when-chain literal (identical constants
      // on both engines); corpus total via a window over the 9-row
      // aggregate -- no broadcast cross, no extra table
      val pcol = (1 to 9).foldLeft(lit(Double.NaN): org.apache.spark.sql.Column) {
        (els, i) => when(col("digit") === i, lit(math.log10(1.0 + 1.0 / i)))
          .otherwise(els)
      }
      import org.apache.spark.sql.expressions.Window
      val n = sum(col("obs")).over(Window.partitionBy())
      d.select(col("digit"), col("obs").cast("long").as("obs"),
          round(n * pcol, 2).as("expected"),
          round(col("obs") / (n * pcol), 4).as("ratio"))
        .orderBy("digit")
    },
    Some {
      val pcase = (1 to 9).foldLeft("CAST('NaN' AS DOUBLE)") { (els, i) =>
        s"CASE WHEN digit = $i THEN ${math.log10(1.0 + 1.0 / i)} ELSE $els END"
      }
      val ladder = (0 to 9).foldLeft("0") { (els, k) =>
        val p = math.pow(10, k).toLong
        s"CASE WHEN c >= $p THEN c // $p ELSE $els END"
      }
      s"""WITH cents AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
                         FROM orders),
          d AS (SELECT CAST($ladder AS BIGINT) AS digit FROM cents),
          o AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs
                FROM d GROUP BY digit),
          w AS (SELECT digit, obs, sum(obs) OVER () AS n, $pcase AS p FROM o)
          SELECT digit, obs, round(n * p, 2) AS expected,
                 round(obs / (n * p), 4) AS ratio
          FROM w ORDER BY digit"""
    })

  /** q126: 3-truss peeling of the transaction graph, two fixed rounds
    * (the q69 fixed-round/unrolled-oracle pattern) — the edge-support
    * cohesion kernel; fixpoint form + containment-in-core law are spec'd
    * in KTrussSpec. */
  private val q126 = QDef(
    "q126_ktruss",
    (s, dir) => graft.graph.KTruss
      .peelRounds(GraphQueries.txnGraph(s, dir), k = 3, rounds = 2)
      .orderBy("a", "b"),
    Some {
      def round(i: Int): String = {
        val (u, t, ss) = (s"u$i", s"t$i", s"s$i")
        s"""$t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                   FROM $u e1 JOIN $u e2 ON e1.b = e2.a
                   JOIN $u e3 ON e3.a = e1.a AND e3.b = e2.b),
            $ss AS (SELECT a, b, CAST(count(*) AS BIGINT) AS supp FROM
                      (SELECT x AS a, y AS b FROM $t UNION ALL
                       SELECT y, z FROM $t UNION ALL SELECT x, z FROM $t)
                    GROUP BY a, b)"""
      }
      s"""WITH e AS (${GraphQueries.txnEdgesSql}),
          u0 AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                 FROM e WHERE src <> dst),
          ${round(0)},
          u1 AS (SELECT a, b FROM s0 WHERE supp >= 1),
          ${round(1)},
          u2 AS (SELECT a, b FROM s1 WHERE supp >= 1),
          ${round(2)}
          SELECT u2.a, u2.b, coalesce(s2.supp, 0) AS supp
          FROM u2 LEFT JOIN s2 ON u2.a = s2.a AND u2.b = s2.b
          ORDER BY u2.a, u2.b"""
    })

  /** q127: derandomized walk corpus (DeepWalk input) — one 3-hop
    * hash-walk from every vertex of the transaction graph, unrolled
    * step-by-step in the oracle. */
  private val q127 = QDef(
    "q127_random_walks",
    (s, dir) => graft.graph.RandomWalks
      .walks(GraphQueries.txnGraph(s, dir).edges, steps = 3, seed = 17L)
      .orderBy("start"),
    Some {
      def step(t: Int): String = {
        val prev = if (t == 1) "f0" else s"s${t - 1}"
        val keep = (1 until t).map(i => s"$prev.v$i, ").mkString
        s"""c$t AS (SELECT $prev.start, $keep adj.v,
                 ((($prev.cur * 1000003 + adj.v) % 1000000007
                    + ${t * 7919} + 17) * 2654435761) % 1000000007 AS h
               FROM $prev JOIN adj ON $prev.cur = adj.u),
            s$t AS (SELECT start, ${(1 until t).map(i => s"v$i, ").mkString}
                           v AS v$t, v AS cur
                    FROM (SELECT c$t.*, row_number() OVER
                            (PARTITION BY start ORDER BY h, v) AS r FROM c$t)
                    WHERE r = 1)"""
      }
      s"""WITH e AS (${GraphQueries.txnEdgesSql}),
          und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                  FROM e WHERE src <> dst),
          adj AS (SELECT a AS u, b AS v FROM und
                  UNION ALL SELECT b AS u, a AS v FROM und),
          f0 AS (SELECT DISTINCT u AS start, u AS cur FROM adj),
          ${step(1)}, ${step(2)}, ${step(3)}
          SELECT start, v1, v2, v3 FROM s3 ORDER BY start"""
    })

  /** Shared CTE chain mirroring [[graft.graph.RandomWalks.skipGramPairs]]
    * (steps=3, seed=17, window=2) — ends in `pc(center, context, cnt)`;
    * q128 selects it directly, q130 weights it with PPMI. */
  private def skipGramCte: String = {
    def stepSql(t: Int): String = {
      val prev = if (t == 1) "f0" else s"s${t - 1}"
      val keep = (1 until t).map(i => s"$prev.v$i, ").mkString
      s"""c$t AS (SELECT $prev.start, $keep adj.v,
               ((($prev.cur * 1000003 + adj.v) % 1000000007
                  + ${t * 7919} + 17) * 2654435761) % 1000000007 AS h
             FROM $prev JOIN adj ON $prev.cur = adj.u),
          s$t AS (SELECT start, ${(1 until t).map(i => s"v$i, ").mkString}
                         v AS v$t, v AS cur
                  FROM (SELECT c$t.*, row_number() OVER
                          (PARTITION BY start ORDER BY h, v) AS r FROM c$t)
                  WHERE r = 1)"""
    }
    val posName = (i: Int) => if (i == 0) "start" else s"v$i"
    val pairArms = (for {
      i <- 0 to 3; j <- 0 to 3
      if i != j && math.abs(i - j) <= 2
    } yield s"SELECT ${posName(i)} AS center, ${posName(j)} AS context FROM s3")
      .mkString(" UNION ALL ")
    s"""e AS (${GraphQueries.txnEdgesSql}),
        und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                FROM e WHERE src <> dst),
        adj AS (SELECT a AS u, b AS v FROM und
                UNION ALL SELECT b AS u, a AS v FROM und),
        f0 AS (SELECT DISTINCT u AS start, u AS cur FROM adj),
        ${stepSql(1)}, ${stepSql(2)}, ${stepSql(3)},
        pairs AS ($pairArms),
        pc AS (SELECT center, context, CAST(count(*) AS BIGINT) AS cnt
               FROM pairs GROUP BY center, context)"""
  }

  /** q128: skip-gram training pairs over the q127 walk corpus (word2vec
    * input) — exact pair counts, window 2 over 4 walk positions. */
  private val q128 = QDef(
    "q128_skipgram_pairs",
    (s, dir) => graft.graph.RandomWalks
      .skipGramPairs(GraphQueries.txnGraph(s, dir).edges,
        steps = 3, seed = 17L, window = 2)
      .orderBy("center", "context"),
    Some(s"""WITH $skipGramCte
             SELECT center, context, cnt FROM pc
             ORDER BY center, context"""))

  /** q129: SCD-2 change intervals over the event log — gaps-and-islands
    * collapse of each user's event-type runs into validity intervals
    * (see [[TimeSeries.changeIntervals]] for the scale shape). */
  private val q129 = QDef(
    "q129_scd2_intervals",
    (s, dir) => TimeSeries
      .changeIntervals(Tables.load(s, dir, "events"))
      .orderBy("user_id", "run_id"),
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
                              epoch_ms(ts) AS ms,
                              lag(event_type) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
                       FROM events),
                 m AS (SELECT *, CASE WHEN prev IS NOT NULL
                                       AND prev = event_type
                                      THEN 0 ELSE 1 END AS chg
                       FROM o),
                 r AS (SELECT user_id, event_type, ms,
                              CAST(sum(chg) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS run_id
                       FROM m),
                 iv AS (SELECT user_id, run_id, event_type,
                               min(ms) AS valid_from_ms,
                               max(ms) AS last_seen_ms,
                               CAST(count(*) AS BIGINT) AS n_events
                        FROM r GROUP BY 1, 2, 3)
            SELECT user_id, run_id, event_type, valid_from_ms, last_seen_ms,
                   n_events,
                   lead(valid_from_ms) OVER
                     (PARTITION BY user_id ORDER BY run_id) AS valid_to_ms,
                   CAST(CASE WHEN lead(valid_from_ms) OVER
                          (PARTITION BY user_id ORDER BY run_id) IS NULL
                        THEN 1 ELSE 0 END AS INT) AS is_current
            FROM iv ORDER BY user_id, run_id"""))

  /** q130: PPMI weighting of the q128 co-occurrence matrix — the
    * count-based embedding objective (Levy & Goldberg 2014); see
    * [[graft.graph.RandomWalks.ppmi]] for the scale shape. */
  private val q130 = QDef(
    "q130_ppmi",
    (s, dir) => graft.graph.RandomWalks
      .ppmi(graft.graph.RandomWalks.skipGramPairs(
        GraphQueries.txnGraph(s, dir).edges, steps = 3, seed = 17L,
        window = 2))
      .orderBy("center", "context"),
    Some(s"""WITH $skipGramCte,
                 tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM pc),
                 cc AS (SELECT center, CAST(sum(cnt) AS BIGINT) AS c_cnt
                        FROM pc GROUP BY 1),
                 xc AS (SELECT context, CAST(sum(cnt) AS BIGINT) AS x_cnt
                        FROM pc GROUP BY 1)
             SELECT p.center, p.context, p.cnt,
                    round(greatest(0.0,
                      ln((CAST(p.cnt AS DOUBLE) * tot.n) /
                         (CAST(cc.c_cnt AS DOUBLE) * xc.x_cnt))), 6) AS ppmi
             FROM pc p CROSS JOIN tot
             JOIN cc ON cc.center = p.center
             JOIN xc ON xc.context = p.context
             WHERE round(greatest(0.0,
                     ln((CAST(p.cnt AS DOUBLE) * tot.n) /
                        (CAST(cc.c_cnt AS DOUBLE) * xc.x_cnt))), 6) > 0
             ORDER BY p.center, p.context"""))

  /** q131: equal-frequency quantile binning of the event values — exact
    * `NTILE(8)` semantics via the distributed-rank prefix sum (see
    * [[FeatureEncoding.quantileBins]] — no global single-partition
    * window); output is the discretizer fit table (per-bin count and
    * numeric range). */
  private val q131 = QDef(
    "q131_quantile_bins",
    (s, dir) => FeatureEncoding
      .quantileBins(Tables.load(s, dir, "events")
        .where(col("value").isNotNull), "value", "event_id", 8)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bin"),
    Some("""WITH b AS (SELECT event_id, value,
                              ntile(8) OVER (ORDER BY value, event_id) AS bin
                       FROM events WHERE value IS NOT NULL)
            SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
                   min(value) AS lo, max(value) AS hi
            FROM b GROUP BY bin ORDER BY bin"""))

  /** q134: node2vec second-order biased walks (return factor 4, in-out
    * factor 2) — the BFS/DFS-interpolating refinement of q127; see
    * [[graft.graph.RandomWalks.node2vecWalks]]. Oracle unrolls the three
    * biased steps with the prev-neighborhood LEFT JOIN per step. */
  private val q134 = QDef(
    "q134_node2vec_walks",
    (s, dir) => graft.graph.RandomWalks
      .node2vecWalks(GraphQueries.txnGraph(s, dir).edges, steps = 3,
        seed = 17L, returnFactor = 4, inOutFactor = 2)
      .orderBy("start"),
    Some {
      def step(t: Int): String = {
        val p = if (t == 1) "f0" else s"s${t - 1}"
        val keep = (1 until t).map(i => s"$p.v$i, ").mkString
        val bias =
          if (t == 1) "1"
          else s"""CASE WHEN adj.v = $p.prev THEN 4
                        WHEN a2.v IS NOT NULL THEN 1 ELSE 2 END"""
        val joinPrev =
          if (t == 1) ""
          else s"LEFT JOIN adj a2 ON a2.u = $p.prev AND a2.v = adj.v"
        s"""c$t AS (SELECT $p.start, $keep adj.v, $p.cur AS pcur,
                 (((($p.cur * 1000003 + adj.v) % 1000000007
                    + ${t * 7919} + 17) * 2654435761) % 1000000007)
                   * ($bias) AS s
               FROM $p JOIN adj ON $p.cur = adj.u
               $joinPrev),
            s$t AS (SELECT start, ${(1 until t).map(i => s"v$i, ").mkString}
                           pcur AS prev, v AS v$t, v AS cur
                    FROM (SELECT c$t.*, row_number() OVER
                            (PARTITION BY start ORDER BY s, v) AS r FROM c$t)
                    WHERE r = 1)"""
      }
      s"""WITH e AS (${GraphQueries.txnEdgesSql}),
          und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                  FROM e WHERE src <> dst),
          adj AS (SELECT a AS u, b AS v FROM und
                  UNION ALL SELECT b AS u, a AS v FROM und),
          f0 AS (SELECT DISTINCT u AS start, CAST(NULL AS BIGINT) AS prev,
                        u AS cur FROM adj),
          ${step(1)}, ${step(2)}, ${step(3)}
          SELECT start, v1, v2, v3 FROM s3 ORDER BY start"""
    })

  /** q145: top-20 behavior paths over the event log
    * ([[TimeSeries.topPaths]]) — exact path counts, deterministic
    * ordering; DuckDB mirrors the in-row sort with an ordered list
    * aggregate. */
  private val q145 = QDef(
    "q145_top_paths",
    (s, dir) => TimeSeries
      .topPaths(Tables.load(s, dir, "events"), k = 20),
    Some("""WITH p AS (SELECT user_id,
                              array_to_string(
                                list(event_type ORDER BY ts, event_id),
                                '>') AS path
                       FROM events GROUP BY user_id)
            SELECT path, CAST(count(*) AS BIGINT) AS n_users
            FROM p GROUP BY path
            ORDER BY n_users DESC, path LIMIT 20"""))

  /** q147: chi-square independence cells — event mix vs ISO weekday
    * ([[graft.engine.Stats.chiSquare]]): observed counts, independence-
    * expected counts, per-cell chi² contributions. Exact long counts;
    * fixed-shape per-row double expressions mirrored verbatim (Spark
    * `weekday+1` == DuckDB `isodow`). */
  private val q147 = QDef(
    "q147_chi2_independence",
    (s, dir) => graft.engine.Stats
      .chiSquare(Tables.load(s, dir, "events")
          .select(col("event_type"),
            (weekday(col("ts")) + lit(1)).cast("int").as("dow")),
        "event_type", "dow")
      .orderBy("event_type", "dow"),
    Some("""WITH c AS (SELECT event_type, CAST(isodow(ts) AS INT) AS dow,
                              CAST(count(*) AS BIGINT) AS observed
                       FROM events GROUP BY 1, 2),
                 r AS (SELECT event_type, sum(observed) AS rx FROM c GROUP BY 1),
                 k AS (SELECT dow, sum(observed) AS cy FROM c GROUP BY 1),
                 n AS (SELECT sum(observed) AS n FROM c)
            SELECT c.event_type, c.dow, c.observed,
              round(CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)
                    / CAST(n AS DOUBLE), 6) AS expected,
              round((CAST(observed AS DOUBLE)
                     - CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    * (CAST(observed AS DOUBLE)
                       - CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)
                         / CAST(n AS DOUBLE))
                    / (CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE)
                       / CAST(n AS DOUBLE)), 6) AS chi2
            FROM c JOIN r USING (event_type) JOIN k USING (dow) CROSS JOIN n
            ORDER BY event_type, dow"""))

  /** q149: median/MAD robust outlier screen per event type
    * ([[graft.ext.Robust.madOutliers]]) — the 50%-breakdown counterpart
    * of q114's mean/σ z-score. Lower medians are actual data values
    * (DuckDB `quantile_disc` convention, no interpolation); the cut
    * threshold is the identical two-multiply IEEE product in both
    * engines. */
  private val q149 = QDef(
    "q149_mad_outliers",
    (s, dir) => graft.ext.Robust
      .madOutliers(Tables.load(s, dir, "events"),
        "event_type", "value", "event_id")
      .orderBy("event_type"),
    Some("""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                              quantile_disc(value, 0.5) AS median
                       FROM events GROUP BY 1),
                 d AS (SELECT e.event_type, abs(e.value - m.median) AS dev
                       FROM events e JOIN m USING (event_type)),
                 md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
                        FROM d GROUP BY 1)
            SELECT m.event_type, m.n, m.median, md.mad,
                   CAST(sum(CASE WHEN d.dev > (3.0 * 1.4826) * md.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM d JOIN m USING (event_type) JOIN md USING (event_type)
            GROUP BY m.event_type, m.n, m.median, md.mad
            ORDER BY 1"""))

  /** q151: 10%-trimmed mean of event values per type
    * ([[graft.ext.Robust.trimmedMean]]) — exact integer rank cuts via
    * the grouped distributed rank, kept values averaged on the 1e-4
    * quantization grid (exact long sums, one mirrored IEEE division). */
  private val q151 = QDef(
    "q151_trimmed_mean",
    (s, dir) => graft.ext.Robust
      .trimmedMean(Tables.load(s, dir, "events"),
        "event_type", "value", "event_id")
      .orderBy("event_type"),
    Some("""WITH r AS (SELECT event_type, value, event_id,
                              row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
                              count(*) OVER (PARTITION BY event_type) AS n
                       FROM events),
                 kept AS (SELECT * FROM r
                          WHERE rk > (n * 100) // 1000
                            AND rk <= n - (n * 100) // 1000)
            SELECT event_type, CAST(min(n) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
                     / (CAST(count(*) AS DOUBLE) * 10000.0) AS trimmed_mean
            FROM kept GROUP BY event_type ORDER BY event_type"""))

  /** q153: DAU / trailing-7-day actives per observed day
    * ([[TimeSeries.slidingDistinct]]) — shifted-union window dedup over
    * the daily-distinct table, exact counts. */
  private val q153 = QDef(
    "q153_sliding_actives",
    (s, dir) => TimeSeries
      .slidingDistinct(Tables.load(s, dir, "events"), windowDays = 7)
      .orderBy("day"),
    Some("""WITH du AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
                                        user_id AS u
                        FROM events),
                 days AS (SELECT DISTINCT day FROM du),
                 sh AS (SELECT du.day + k AS day, u
                        FROM du CROSS JOIN (SELECT unnest(range(7)) AS k)),
                 d1 AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT)
                                      AS n_active_1d
                        FROM du GROUP BY 1),
                 w7 AS (SELECT s.day, CAST(count(DISTINCT u) AS BIGINT)
                                        AS n_active_7d
                        FROM sh s JOIN days USING (day) GROUP BY 1)
            SELECT day, n_active_1d, n_active_7d
            FROM d1 JOIN w7 USING (day) ORDER BY day"""))

  /** q155: the sketch path of q153 ([[TimeSeries.slidingDistinctApprox]])
    * — per-day HLL sketches merged across the trailing window, gated
    * like q93: the exact shifted-union counts are the hash-compared
    * columns, and the HLL estimates are asserted within 4×rsd of them
    * genuinely in Spark (DuckDB pins the assertion columns TRUE). */
  private val q155 = QDef(
    "q155_sliding_actives_hll",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val exact = TimeSeries.slidingDistinct(ev, windowDays = 7)
      val approx = TimeSeries.slidingDistinctApprox(ev, windowDays = 7)
      // DataSketches HLL at lgK=12 has rsd ~1.039/sqrt(2^12) ≈ 1.6%;
      // assert within 4×rsd ≈ 6.5% like the q93 device
      exact.join(approx, Seq("day"))
        .select(col("day"), col("n_active_1d"), col("n_active_7d"),
          (abs(col("n_active_1d_approx") - col("n_active_1d")) <=
            lit(0.065) * col("n_active_1d")).as("within_bound_1d"),
          (abs(col("n_active_7d_approx") - col("n_active_7d")) <=
            lit(0.065) * col("n_active_7d")).as("within_bound_7d"))
        .orderBy("day")
    },
    Some("""WITH du AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
                                        user_id AS u
                        FROM events),
                 days AS (SELECT DISTINCT day FROM du),
                 sh AS (SELECT du.day + k AS day, u
                        FROM du CROSS JOIN (SELECT unnest(range(7)) AS k)),
                 d1 AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT)
                                      AS n_active_1d
                        FROM du GROUP BY 1),
                 w7 AS (SELECT s.day, CAST(count(DISTINCT u) AS BIGINT)
                                        AS n_active_7d
                        FROM sh s JOIN days USING (day) GROUP BY 1)
            SELECT day, n_active_1d, n_active_7d,
                   TRUE AS within_bound_1d, TRUE AS within_bound_7d
            FROM d1 JOIN w7 USING (day) ORDER BY day"""))

  /** q154: percent-rank normalization of event values within each type
    * ([[graft.ext.Robust.percentRank]]) — SQL PERCENT_RANK semantics via
    * the grouped distributed rank (no per-group global sort), total
    * order by (value, event_id). */
  private val q154 = QDef(
    "q154_percent_rank",
    (s, dir) => graft.ext.Robust
      .percentRank(Tables.load(s, dir, "events"),
        "event_type", "value", "event_id")
      .orderBy("event_type", "event_id"),
    Some("""SELECT event_type, event_id, value,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS pct
            FROM events ORDER BY event_type, event_id"""))

  /** q157: pairwise audience overlap via HLL inclusion–exclusion — the
    * sketch path of q102's exact-overlap family for DISTINCT-USER overlap
    * across audiences. Audience = users with ≥ 8 events of a type; exact
    * pairwise overlap needs a distinct-pairs self-join (|users|·k² rows at
    * scale), while the sketch path is one scan → k fixed-size register
    * arrays, pairwise-unioned with `zip_with` register max and estimated
    * by inclusion–exclusion |A|+|B|−|A∪B|. Gated like q93/q155: exact
    * counts are the hash-compared columns, the estimate is asserted
    * within-bound genuinely in Spark (error ≤ ~3·rsd·|A∪B| at p=12 →
    * rsd ≈ 1.6%; bound 0.12·|A∪B| leaves ~2.4× margin over the measured
    * max 0.049 at sf0.01 / sf0.1 — sketch values are deterministic per
    * corpus, but the margin keeps the assertion robust to testdata
    * regeneration). */
  private val q157 = QDef(
    "q157_audience_overlap_hll",
    (s, dir) => {
      val aud = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("__n")).where(col("__n") >= 8)
        .select(col("event_type"), col("user_id"))
      val sk = aud.groupBy("event_type")
        .agg(call_function("hll_merge",
            call_function("hll_init", col("user_id"), lit(12))).as("__sk"),
          count(lit(1)).as("__exact"))
      val exactOv = aud.select(col("event_type").as("type_l"), col("user_id"))
        .join(aud.select(col("event_type").as("type_r"), col("user_id")), "user_id")
        .where(col("type_l") < col("type_r"))
        .groupBy("type_l", "type_r").agg(count(lit(1)).as("exact_overlap"))
      val est = sk.select(col("event_type").as("type_l"),
          col("__sk").as("__skl"), col("__exact").as("exact_l"))
        .join(broadcast(sk.select(col("event_type").as("type_r"),
          col("__sk").as("__skr"), col("__exact").as("exact_r"))),
          col("type_l") < col("type_r"))
        .withColumn("__est",
          call_function("hll_count", col("__skl")) +
            call_function("hll_count", col("__skr")) -
            call_function("hll_count",
              zip_with(col("__skl"), col("__skr"), (a, b) => greatest(a, b))))
      est.join(broadcast(exactOv), Seq("type_l", "type_r"))
        .select(col("type_l"), col("type_r"),
          col("exact_l"), col("exact_r"), col("exact_overlap"),
          (abs(col("__est") - col("exact_overlap")) <=
            lit(0.12) * (col("exact_l") + col("exact_r") - col("exact_overlap")))
            .as("within_bound"))
        .orderBy("type_l", "type_r")
    },
    Some("""WITH aud AS (SELECT event_type, user_id
                         FROM events GROUP BY 1, 2 HAVING count(*) >= 8),
                 sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                        FROM aud GROUP BY 1),
                 ov AS (SELECT a.event_type AS type_l, b.event_type AS type_r,
                               CAST(count(*) AS BIGINT) AS exact_overlap
                        FROM aud a JOIN aud b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
                        GROUP BY 1, 2)
            SELECT type_l, type_r, l.n AS exact_l, r.n AS exact_r,
                   exact_overlap, TRUE AS within_bound
            FROM ov JOIN sz l ON l.event_type = type_l
                    JOIN sz r ON r.event_type = type_r
            ORDER BY type_l, type_r"""))

  /** q160: daily gap-fill + linear interpolation per user
    * ([[TimeSeries.gapFillInterpolate]]) — densify each user's daily avg
    * series to its own [min, max] day range, interpolate interior gaps
    * between nearest observed neighbors, forward/backward-fill edges.
    * Daily avgs are rounded at the aggregate (order-dependent double sum),
    * after which interpolation is a fixed-order scalar expression — the
    * filled values hash bit-exact against DuckDB's IGNORE NULLS window
    * mirror. */
  private val q160 = QDef(
    "q160_gapfill_interpolate",
    (s, dir) => TimeSeries
      .gapFillInterpolate(Tables.load(s, dir, "events"))
      .orderBy("user_id", "day"),
    Some("""WITH d AS (SELECT user_id AS k, epoch_ms(ts) // 86400000 AS day,
                              round(avg(value), 6) AS v
                       FROM events GROUP BY 1, 2),
                 spine AS (SELECT k, unnest(range(min(day), max(day) + 1)) AS day
                           FROM d GROUP BY k),
                 j AS (SELECT s.k, s.day, d.v
                       FROM spine s LEFT JOIN d USING (k, day)),
                 f AS (SELECT k, day, v,
                         last_value((CASE WHEN v IS NOT NULL
                             THEN struct_pack(d := day, vv := v) END) IGNORE NULLS)
                           OVER (PARTITION BY k ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                         first_value((CASE WHEN v IS NOT NULL
                             THEN struct_pack(d := day, vv := v) END) IGNORE NULLS)
                           OVER (PARTITION BY k ORDER BY day
                                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
                       FROM j)
            SELECT k AS user_id, day, (v IS NOT NULL) AS observed,
                   CASE WHEN v IS NOT NULL THEN v
                        WHEN p IS NULL THEN n.vv
                        WHEN n IS NULL THEN p.vv
                        ELSE p.vv + (n.vv - p.vv) *
                          (CAST(day - p.d AS DOUBLE) / CAST(n.d - p.d AS DOUBLE))
                   END AS value
            FROM f ORDER BY user_id, day"""))

  /** q161: Kaplan–Meier survival curve of user lifetime
    * ([[TimeSeries.kaplanMeier]]) — lifetime = first→last event day,
    * churned if silent > 14 days before the study horizon, otherwise
    * right-censored. Exact integer risk/death/censor counts are the
    * backbone; the survival product runs as exp(Σ ln(1 − d/n)) in
    * ascending-duration order in both engines, rounded to 6 decimals,
    * with an exact-zero factor short-circuited past ln(0). */
  private val q161 = QDef(
    "q161_kaplan_meier",
    (s, dir) => TimeSeries
      .kaplanMeier(Tables.load(s, dir, "events"), churnGapDays = 14)
      .orderBy("duration"),
    Some("""WITH pu AS (SELECT user_id,
                               min(epoch_ms(ts) // 86400000) AS d0,
                               max(epoch_ms(ts) // 86400000) AS d1
                        FROM events GROUP BY 1),
                 sp AS (SELECT d1 - d0 AS duration,
                               CASE WHEN d1 <= (SELECT max(d1) FROM pu) - 14
                                    THEN 1 ELSE 0 END AS evt
                        FROM pu),
                 bd AS (SELECT duration,
                               CAST(sum(evt) AS BIGINT) AS n_event,
                               CAST(count(*) - sum(evt) AS BIGINT) AS n_censor
                        FROM sp GROUP BY duration),
                 km AS (SELECT duration, n_event, n_censor,
                               (SELECT CAST(count(*) AS BIGINT) FROM sp)
                                 - sum(n_event + n_censor) OVER w
                                 + n_event + n_censor AS n_risk
                        FROM bd
                        WINDOW w AS (ORDER BY duration
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW))
            SELECT duration, CAST(n_risk AS BIGINT) AS n_risk,
                   n_event, n_censor,
                   round(CASE WHEN sum(CASE WHEN n_event = n_risk
                                            THEN 1 ELSE 0 END) OVER w2 > 0
                              THEN 0.0
                              ELSE exp(sum(CASE WHEN n_event < n_risk THEN
                                  ln(1.0 - n_event / CAST(n_risk AS DOUBLE))
                                END) OVER w2)
                         END, 6) AS survival
            FROM km
            WINDOW w2 AS (ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY duration"""))

  /** q164: A/B two-proportion z-test per exposure cohort
    * ([[graft.engine.Stats.twoProportionZ]]) — units are the distinct
    * users exposed to each event type, variant = user_id parity (the
    * deterministic hash-split convention of q51), conversion = the user
    * has ≥ 1 purchase event. Exact long counters in one keyed aggregate;
    * rates and pooled-variance z as fixed-shape rounded doubles;
    * degenerate arms (the purchase cohort itself, where both rates are
    * 1) yield NULL z by the guard rather than NaN. */
  private val q164 = QDef(
    "q164_ab_ztest",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
        .withColumn("__conv", lit(true))
      val units = ev.select(col("event_type"), col("user_id")).distinct()
        .join(conv, Seq("user_id"), "left_outer")
        .select(col("event_type"),
          // null-safe variant derivation: a NULL user_id must land in
          // n_other (the oracle's `CASE WHEN is_a OR NOT is_a` does the
          // same), not fall through `otherwise` into arm B
          when(col("user_id").isNull, lit(null).cast("string"))
            .when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B"))
            .as("variant"),
          coalesce(col("__conv"), lit(false)).as("converted"))
      graft.engine.Stats
        .twoProportionZ(units, Seq("event_type"), "variant", "converted")
        .orderBy("event_type")
    },
    Some("""WITH conv AS (SELECT DISTINCT user_id FROM events
                          WHERE event_type = 'purchase'),
                 units AS (SELECT DISTINCT e.event_type, e.user_id,
                                  (e.user_id % 2 = 0) AS is_a,
                                  (c.user_id IS NOT NULL) AS converted
                           FROM events e LEFT JOIN conv c USING (user_id)),
                 g AS (SELECT event_type,
                              CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END)
                                   AS BIGINT) AS n_a,
                              CAST(sum(CASE WHEN is_a AND converted
                                            THEN 1 ELSE 0 END)
                                   AS BIGINT) AS x_a,
                              CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)
                                   AS BIGINT) AS n_b,
                              CAST(sum(CASE WHEN NOT is_a AND converted
                                            THEN 1 ELSE 0 END)
                                   AS BIGINT) AS x_b,
                              CAST(sum(CASE WHEN is_a OR NOT is_a
                                            THEN 0 ELSE 1 END)
                                   AS BIGINT) AS n_other
                       FROM units GROUP BY 1)
            SELECT event_type, n_a, x_a, n_b, x_b, n_other,
                   CASE WHEN n_a > 0
                        THEN round(CAST(x_a AS DOUBLE) / n_a, 6) END AS p_a,
                   CASE WHEN n_b > 0
                        THEN round(CAST(x_b AS DOUBLE) / n_b, 6) END AS p_b,
                   CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                             AND x_a + x_b < n_a + n_b
                        THEN round((CAST(x_a AS DOUBLE) / n_a
                                    - CAST(x_b AS DOUBLE) / n_b)
                          / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                                 * (1.0 - CAST(x_a + x_b AS DOUBLE)
                                          / (n_a + n_b))
                                 * (1.0 / n_a + 1.0 / n_b)), 6)
                   END AS z
            FROM g ORDER BY event_type"""))

  /** q167: per-event-type user-concentration profile
    * ([[graft.engine.Stats.distributionStats]]) — distinct users, HHI
    * concentration (exact: integer-valued-double Σc² then one division)
    * and Shannon entropy (order-dependent Σ c·ln c, rounded) of each
    * type's per-user volume distribution. */
  private val q167 = QDef(
    "q167_concentration",
    (s, dir) => graft.engine.Stats
      .distributionStats(Tables.load(s, dir, "events"),
        Seq("event_type"), "user_id")
      .orderBy("event_type"),
    Some("""WITH c AS (SELECT event_type, user_id, count(*) AS c
                       FROM events GROUP BY 1, 2),
                 g AS (SELECT event_type,
                              CAST(sum(c) AS BIGINT) AS n,
                              CAST(count(*) AS BIGINT) AS k,
                              sum(CAST(c AS DOUBLE) * c) AS sumsq,
                              sum(CAST(c AS DOUBLE)
                                  * ln(CAST(c AS DOUBLE))) AS slnc
                       FROM c GROUP BY 1)
            SELECT event_type, n, k,
                   sumsq / (CAST(n AS DOUBLE) * n) AS hhi,
                   round(ln(CAST(n AS DOUBLE)) - slnc / n, 6) AS entropy
            FROM g ORDER BY event_type"""))

  val all: Seq[QDef] =
    Seq(q112, q113, q114, q115, q116, q117, q118, q119, q120, q121, q122,
      q123, q124, q125, q126, q127, q128, q129, q130, q131, q134, q145,
      q147, q149, q151, q153, q154, q155, q157, q160, q161, q164, q167)
}
