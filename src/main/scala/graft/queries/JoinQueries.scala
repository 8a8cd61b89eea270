package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.ext.{AsOfJoin, BloomJoin, RangeJoin, SetJoin}

/** Specialized join operators beyond Catalyst's built-in strategies — the
  * temporal/range/runtime-filter joins an analytics engine needs where a
  * naive plan degenerates to a nested-loop product (SURVEY.md §2.3 lists
  * the reference's join inventory; these extend it the way Flink's interval
  * join and DuckDB's ASOF join extend plain SQL).
  */
object JoinQueries {

  /** q63: as-of join — every purchase event matched to the same user's
    * latest click at-or-before it (attribution). Right side is deduped per
    * (user, ts) so the as-of match is unambiguous; misses coalesce to -1 to
    * keep the output columns cleanly BIGINT (left-join semantics proven by
    * purchases with no prior click). DuckDB's native ASOF LEFT JOIN is the
    * oracle. */
  private val q63 = QDef(
    "q63_asof_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOfJoin.backward(
          purchases, AsOfJoin.dedupeRight(clicks, Seq("user_id"), "ts"),
          on = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          rightPrefix = "click_")
        .select(
          col("event_id").as("purchase_id"), col("user_id"),
          unix_millis(col("ts")).as("purchase_ms"),
          coalesce(unix_millis(col("click_ts")), lit(-1L)).as("click_ms"),
          coalesce(col("click_click_id"), lit(-1L)).as("click_id"))
        .orderBy("purchase_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, ts, max(event_id) AS click_id
                       FROM events WHERE event_type = 'click' GROUP BY 1, 2)
            SELECT p.event_id AS purchase_id, p.user_id,
                   epoch_ms(p.ts) AS purchase_ms,
                   coalesce(epoch_ms(c.ts), -1) AS click_ms,
                   coalesce(c.click_id, -1) AS click_id
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY purchase_id"""))

  /** q64: range join — clicks within ±15 minutes of any error event
    * (global temporal proximity, no shared key: the naive Spark plan is a
    * nested-loop over every click x error pair). Bucketed at the window
    * width, so each error expands to <= 3 bucket rows and the match is one
    * equi shuffle join. Aggregated per error to keep the checked output
    * compact; the integer millisecond gaps are engine-portable. */
  private val q64 = QDef(
    "q64_range_join",
    (s, dir) => {
      val halfWin = 900000L // 15 min in ms
      val ev = Tables.load(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts")))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ms").as("error_ms"),
          (col("ms") - halfWin).as("lo"), (col("ms") + halfWin).as("hi"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ms").as("click_ms"))
      RangeJoin.pointInInterval(
          clicks, errors, pointCol = "click_ms",
          loCol = "lo", hiCol = "hi", bucketWidth = halfWin)
        .groupBy("error_id")
        .agg(count(lit(1)).as("n_nearby_clicks"),
          min(abs(col("click_ms") - col("error_ms"))).as("min_gap_ms"))
        .orderBy("error_id")
    },
    Some("""WITH e AS (SELECT event_id AS error_id, epoch_ms(ts) AS ems
                       FROM events WHERE event_type = 'error'),
                 c AS (SELECT event_id AS click_id, epoch_ms(ts) AS cms
                       FROM events WHERE event_type = 'click')
            SELECT e.error_id, CAST(count(*) AS BIGINT) AS n_nearby_clicks,
                   min(abs(c.cms - e.ems)) AS min_gap_ms
            FROM e JOIN c ON c.cms BETWEEN e.ems - 900000 AND e.ems + 900000
            GROUP BY e.error_id ORDER BY e.error_id"""))

  /** q65: Bloom-pruned semi-join — lineitem rows for high-value orders,
    * with a broadcast Bloom probe dropping non-matching rows before the
    * shuffle and the exact semi-join guaranteeing the unpruned result (the
    * oracle is the PLAIN semi-join: Bloom false positives must be
    * invisible). Summary aggregation keeps the gate compact. */
  private val q65 = QDef(
    "q65_bloom_semijoin",
    (s, dir) => {
      val lineitem = Tables.load(s, dir, "lineitem")
      val bigOrders = Tables.load(s, dir, "orders")
        .where(col("o_totalprice") > 450000.0)
      BloomJoin.semiJoin(
          lineitem, "l_orderkey", bigOrders, "o_orderkey",
          expectedItems = 200000L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN
              (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q83: interval-overlap join ([[RangeJoin.intervalOverlap]]) — pairs of
    * 10-minute activity windows (purchase vs error) that intersect,
    * summarized per purchase. Both orientations of the bucketed
    * point-in-interval reduction, unioned without double-counting; the
    * oracle is the naive theta join (`lo1 <= hi2 AND lo2 <= hi1`). */
  private val q83 = QDef(
    "q83_interval_overlap",
    (s, dir) => {
      val win = 600000L // 10 min
      val ev = Tables.load(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts")))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("ms").as("p_lo"), (col("ms") + win).as("p_hi"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"),
          col("ms").as("e_lo"), (col("ms") + win).as("e_hi"))
      RangeJoin.intervalOverlap(purchases, errors,
          leftLo = "p_lo", leftHi = "p_hi", rightLo = "e_lo", rightHi = "e_hi",
          bucketWidth = win)
        .groupBy("purchase_id")
        .agg(count(lit(1)).as("n_overlapping_errors"),
          min(col("error_id")).as("first_error_id"))
        .orderBy("purchase_id")
    },
    Some("""WITH p AS (SELECT event_id AS purchase_id, epoch_ms(ts) AS lo,
                              epoch_ms(ts) + 600000 AS hi
                       FROM events WHERE event_type = 'purchase'),
                 e AS (SELECT event_id AS error_id, epoch_ms(ts) AS lo,
                              epoch_ms(ts) + 600000 AS hi
                       FROM events WHERE event_type = 'error')
            SELECT p.purchase_id, CAST(count(*) AS BIGINT) AS n_overlapping_errors,
                   min(e.error_id) AS first_error_id
            FROM p JOIN e ON p.lo <= e.hi AND e.lo <= p.hi
            GROUP BY p.purchase_id ORDER BY p.purchase_id"""))

  /** q84: the batch twin of [[graft.streaming.Streams.attributionJoin]]
    * (the q36/q37 batch-twin pattern): purchases LEFT OUTER joined to
    * same-user clicks within 30 minutes before, misses null-extended —
    * summarized per purchase so the unmatched rows are visible as
    * n_clicks = 0. StreamsSpec proves the same plan emits identical rows
    * incrementally under watermarks. */
  private val q84 = QDef(
    "q84_attribution",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("txn_id"), col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("txn_id"), col("ts"))
      graft.streaming.Streams
        .attributionJoin(purchases, clicks, within = "30 minutes", streaming = false)
        .groupBy(col("user_id"), col("purchase_id"))
        .agg(count(col("click_id")).as("n_clicks"),
          coalesce(max(col("click_id")), lit(-1L)).as("last_click_id"))
        .orderBy("user_id", "purchase_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pms
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS cms
                       FROM events WHERE event_type = 'click')
            SELECT p.user_id, p.purchase_id,
                   CAST(count(c.click_id) AS BIGINT) AS n_clicks,
                   coalesce(max(c.click_id), -1) AS last_click_id
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id
             AND c.cms >= p.pms - 1800000 AND c.cms <= p.pms
            GROUP BY p.user_id, p.purchase_id
            ORDER BY p.user_id, p.purchase_id"""))

  /** q110: cohort retention over the events stream — the product-analytics
    * staple: users bucketed by first-seen week, activity counted per
    * (cohort, weeks-since-first) cell. All time arithmetic is integer
    * epoch-ms (`div` on both engines), so the matrix is exact: one min
    * aggregate + one broadcast-back join + one distinct count. */
  private val q110 = QDef(
    "q110_cohort_retention",
    (s, dir) => {
      val wk = 604800000L // 7 * 86_400_000 ms
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"))
      val first = ev.groupBy("user_id").agg(min("ms").as("first_ms"))
      ev.join(first, Seq("user_id"))
        .select(col("user_id"),
          expr(s"first_ms div $wk").as("cohort_week"),
          expr(s"(ms - first_ms) div $wk").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
                 f AS (SELECT user_id, min(ms) AS first_ms FROM ev GROUP BY user_id)
            SELECT first_ms // 604800000 AS cohort_week,
                   (ms - first_ms) // 604800000 AS week_offset,
                   CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
            FROM ev JOIN f ON ev.user_id = f.user_id
            GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""))

  /** q111: time-series gap filling — the dense weekly activity grid per
    * user, absent weeks filled with 0 (the resample step before any
    * trend/seasonality computation). The grid is an IN-ROW `sequence`
    * explode per user (no cross join against a calendar table), then one
    * left join back to the sparse counts. */
  private val q111 = QDef(
    "q111_gap_fill",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 604800000").as("week"))
      val act = ev.groupBy("user_id", "week").agg(count(lit(1)).as("n_events"))
      val grid = act.groupBy("user_id")
        .agg(min("week").as("w0"), max("week").as("w1"))
        .select(col("user_id"), explode(sequence(col("w0"), col("w1"))).as("week"))
      grid.join(act, Seq("user_id", "week"), "left")
        .select(col("user_id"), col("week"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("user_id", "week")
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ms(ts) // 604800000 AS week
                        FROM events),
                 act AS (SELECT user_id, week, count(*) AS n
                         FROM ev GROUP BY 1, 2),
                 span AS (SELECT user_id, min(week) AS w0, max(week) AS w1
                          FROM act GROUP BY 1),
                 grid AS (SELECT user_id, unnest(generate_series(w0, w1)) AS week
                          FROM span)
            SELECT g.user_id AS user_id, g.week AS week,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
            FROM grid g LEFT JOIN act a
              ON a.user_id = g.user_id AND a.week = g.week
            ORDER BY g.user_id, g.week"""))

  /** q141: Jaccard set-similarity self-join over order baskets
    * ([[SetJoin.jaccardPairs]], prefix filtering). The oracle recomputes
    * the join from the FULL inverted index — a per-run losslessness
    * proof of the prefix bound, since the two result sets must
    * hash-match. Single-division Jaccard of exact integers: bit-stable
    * without rounding. */
  private val q141 = QDef(
    "q141_basket_jaccard",
    (s, dir) => SetJoin
      .jaccardPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minJaccard = 0.5)
      .orderBy("id_l", "id_r"),
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS id, l_partkey AS item
                        FROM lineitem),
                 sz AS (SELECT id, CAST(count(*) AS BIGINT) AS sz
                        FROM it GROUP BY id),
                 cand AS (SELECT DISTINCT a.id AS id_l, b.id AS id_r
                          FROM it a JOIN it b
                            ON a.item = b.item AND a.id < b.id),
                 inter AS (SELECT c.id_l, c.id_r,
                                  CAST(count(*) AS BIGINT) AS common
                           FROM cand c
                           JOIN it a ON a.id = c.id_l
                           JOIN it b ON b.id = c.id_r AND b.item = a.item
                           GROUP BY c.id_l, c.id_r)
            SELECT i.id_l, i.id_r, i.common, sl.sz AS sz_l, sr.sz AS sz_r,
                   CAST(i.common AS DOUBLE) /
                     (sl.sz + sr.sz - i.common) AS jaccard
            FROM inter i
            JOIN sz sl ON sl.id = i.id_l
            JOIN sz sr ON sr.id = i.id_r
            WHERE CAST(i.common AS DOUBLE) / (sl.sz + sr.sz - i.common) >= 0.5
            ORDER BY id_l, id_r"""))

  /** q162: DIRECTED set-containment self-join over order baskets
    * ([[SetJoin.containmentPairs]]) — pairs where basket L is ≥ half
    * inside basket R, the asymmetric near-duplicate relation Jaccard
    * misses when R is much larger. As with q141, the oracle recomputes
    * the join from the FULL inverted index, so the run is a
    * losslessness proof of the one-sided prefix + size + positional
    * bounds. t = 0.5 keeps every threshold comparison exactly
    * representable (0.5·n and c/n vs 0.5 decide identically in ints
    * and doubles) — single-division containment, bit-stable unrounded. */
  private val q162 = QDef(
    "q162_basket_containment",
    (s, dir) => SetJoin
      .containmentPairs(Tables.load(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minContainment = 0.5)
      .orderBy("id_l", "id_r"),
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS id, l_partkey AS item
                        FROM lineitem),
                 sz AS (SELECT id, CAST(count(*) AS BIGINT) AS sz
                        FROM it GROUP BY id),
                 inter AS (SELECT a.id AS id_l, b.id AS id_r,
                                  CAST(count(*) AS BIGINT) AS common
                           FROM it a JOIN it b
                             ON a.item = b.item AND a.id <> b.id
                           GROUP BY 1, 2)
            SELECT i.id_l, i.id_r, i.common, sl.sz AS sz_l, sr.sz AS sz_r,
                   CAST(i.common AS DOUBLE) / sl.sz AS containment
            FROM inter i
            JOIN sz sl ON sl.id = i.id_l
            JOIN sz sr ON sr.id = i.id_r
            WHERE CAST(i.common AS DOUBLE) / sl.sz >= 0.5
            ORDER BY id_l, id_r"""))

  def all: Seq[QDef] = Seq(q63, q64, q65, q83, q84, q110, q111, q141, q162)
}
