package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.6, §2.9) re-expressed over
  * the driver testdata. Each query cites the reference construct it
  * transposes. All plans are declarative DataFrame chains so Catalyst gets
  * predicate pushdown, column pruning, and join selection for free
  * (SURVEY.md §4); small dimension tables are broadcast explicitly.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q1-shaped pricing summary: scan → filter (pushed to parquet) →
    * hash agg with partial/final → sort. Covers grouped sum/count/avg and
    * arithmetic over columns (reference: grouped counts at
    * `01_aml_network_analysis.py:60-63`, amount arithmetic at `:319`). */
  private val q01 = QDef(
    "q01_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity),2) AS sum_qty,
            round(sum(l_extendedprice),2) AS sum_base_price,
            round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
            round(avg(l_discount),6) AS avg_disc,
            CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** Scalar-function projection in the shape of the reference's address
    * normalization (`02_aml_address_verification.py:29`: chained `translate`)
    * plus `coalesce` (`01_aml_network_analysis.py:456`) and floor/cast
    * (`:396`). Whole-stage-codegen'd projection, no shuffle. */
  private val q02 = QDef(
    "q02_scalar_norm",
    (s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          translate(translate(col("c_name"), "#", " "), "0", "O").as("name_norm"),
          translate(col("c_mktsegment"), " ", "+").as("segment_url"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
          (col("c_acctbal") / 2 + 10).as("half_risk"),
          floor(col("c_acctbal")).cast("long").as("acct_floor"),
          col("c_nationkey").cast("long").as("nation"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
            translate(translate(c_name,'#',' '),'0','O') AS name_norm,
            translate(c_mktsegment,' ','+') AS segment_url,
            coalesce(c_acctbal, 0.0) AS acctbal,
            c_acctbal/2 + 10 AS half_risk,
            CAST(floor(c_acctbal) AS BIGINT) AS acct_floor,
            CAST(c_nationkey AS BIGINT) AS nation
            FROM customer ORDER BY c_custkey"""))

  /** Flagship: "entities sharing an attribute value that occurs more than
    * once" (`01_aml_network_analysis.py:52-68`) — groupBy+HAVING derived set,
    * IN-subquery semi-join (Catalyst: RewritePredicateSubquery → LeftSemi),
    * ordered output. The shared attribute is the hundred-dollar account
    * bucket. */
  private val q03 = QDef(
    "q03_shared_attr",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val bucket = floor(col("c_acctbal") / 100)
      val dups = c.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      c.join(dups, bucket === dups("bucket"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE floor(c_acctbal/100) IN (
              SELECT floor(c_acctbal/100) FROM customer
              GROUP BY 1 HAVING count(*) > 1)
            ORDER BY c_custkey"""))

  /** Multi-way star join with broadcast dimensions (reference: 4-way entity
    * lookups `01_aml_network_analysis.py:331-358`). lineitem⋈orders shuffles
    * on the fact key; customer⋈nation⋈region is broadcast — at 100 TB the
    * fact-fact join is the only shuffle and AQE picks its partitioning. */
  private val q04 = QDef(
    "q04_revenue_by_nation",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1999-01-01"))
      val dims = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .select(col("c_custkey"), col("n_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
            round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
            CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA','EUROPE')
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1999-01-01'
            GROUP BY n_name ORDER BY n_name"""))

  /** Conditional aggregation + HAVING (reference: `count(case when
    * type='Person' then 1 end) … having person_ct > 1`,
    * `01_aml_network_analysis.py:170-173`). */
  private val q05 = QDef(
    "q05_cond_agg",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)), 2).as("open_value"))
        .filter(col("n_orders") > 10)
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            CAST(count(*) AS BIGINT) AS n_orders,
            CAST(count(CASE WHEN o_orderstatus='F' THEN 1 END) AS BIGINT) AS n_finished,
            round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0.0 END),2) AS open_value
            FROM orders GROUP BY o_orderpriority
            HAVING count(*) > 10 ORDER BY o_orderpriority"""))

  /** UNION-with-dedup edge building, exactly the identity-graph construction
    * shape of `01_aml_network_analysis.py:91-107` (SQL UNION dedups; the
    * DataFrame equivalent is union + distinct, SURVEY.md §2.5). Node ids are
    * disambiguated into one long key space. */
  private val q06 = QDef(
    "q06_edges_union",
    (s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("src"),
        (col("c_nationkey").cast("long") + 1000000L).as("dst"),
        lit("cust_nation").as("rel"))
      val sp = t(s, dir, "supplier").select(
        (col("s_suppkey").cast("long") + 2000000L).as("src"),
        (col("s_nationkey").cast("long") + 1000000L).as("dst"),
        lit("supp_nation").as("rel"))
      c.union(sp).distinct().orderBy("src", "dst", "rel")
    },
    Some("""SELECT CAST(c_custkey AS BIGINT) AS src,
                   CAST(c_nationkey + 1000000 AS BIGINT) AS dst,
                   'cust_nation' AS rel FROM customer
            UNION
            SELECT CAST(s_suppkey + 2000000 AS BIGINT),
                   CAST(s_nationkey + 1000000 AS BIGINT),
                   'supp_nation' FROM supplier
            ORDER BY src, dst, rel"""))

  /** Window function: top-3 orders per customer (not used by the reference —
    * SURVEY.md §2.6 notes window fns as engine surface). Single shuffle on
    * the partition key. */
  private val q07 = QDef(
    "q07_window_topk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) t
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Join + groupBy + HAVING + ORDER BY pipeline (reference synth-score shape
    * `01_aml_network_analysis.py:217-228`). */
  private val q08 = QDef(
    "q08_order_stats_having",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name,
            CAST(count(*) AS BIGINT) AS n_orders,
            round(sum(o_totalprice),2) AS total_spend
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            HAVING count(*) >= 12 ORDER BY c_custkey"""))

  /** Global sort + limit (reference: `order by email_addr`
    * `01_aml_network_analysis.py:66`; `head`/`take` driver-side limits,
    * SURVEY.md §2.6). Spark plans this as TakeOrderedAndProject — no full
    * sort at scale. */
  private val q09 = QDef(
    "q09_top10_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** INTERSECT (SURVEY.md §2.5 'free via .intersect'). */
  private val q10 = QDef(
    "q10_intersect",
    (s, dir) => {
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val finished = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
      building.intersect(finished).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus='F'
            ORDER BY c_custkey"""))

  /** EXCEPT (set difference): customers who never placed a 'P' order also
    * doubles as the NOT-EXISTS/anti-join shape (SURVEY.md §2.3). */
  private val q11 = QDef(
    "q11_except_anti",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val p = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "P").select(col("o_custkey").as("c_custkey"))
      c.except(p).orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus='P'
            ORDER BY c_custkey"""))

  /** ROLLUP grouping sets (SURVEY.md §2.4 'free via df.rollup'). Null
    * grouping indicators are coalesced so NULL-ordering differences between
    * engines cannot bite. */
  private val q12 = QDef(
    "q12_rollup",
    (s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .rollup(col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("value"))
        .select(
          coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          col("n"), col("value"))
        .orderBy("segment", "status")
    },
    Some("""SELECT coalesce(c_mktsegment,'(all)') AS segment,
                   coalesce(o_orderstatus,'(all)') AS status,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(o_totalprice),2) AS value
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
            ORDER BY segment, status"""))

  /** DISTINCT projection (reference `:100-106,:277-288`), over two tables. */
  private val q13 = QDef(
    "q13_distinct_proj",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("custkey"), col("o_orderstatus").as("status"))
        .distinct()
        .orderBy("custkey", "status"),
    Some("""SELECT DISTINCT CAST(o_custkey AS BIGINT) AS custkey,
                   o_orderstatus AS status
            FROM orders ORDER BY custkey, status"""))

  /** Per-group stats on part: min/max/avg and BIGINT-cast max over an int32
    * column (cast surface, SURVEY.md §2.2). */
  private val q14 = QDef(
    "q14_part_brand_stats",
    (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("p_retailprice")), 2).as("avg_price"),
          round(min(col("p_retailprice")), 2).as("min_price"),
          round(max(col("p_retailprice")), 2).as("max_price"),
          max(col("p_size")).cast("long").as("max_size"))
        .orderBy("p_brand"),
    Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                   round(avg(p_retailprice),2) AS avg_price,
                   round(min(p_retailprice),2) AS min_price,
                   round(max(p_retailprice),2) AS max_price,
                   CAST(max(p_size) AS BIGINT) AS max_size
            FROM part GROUP BY p_brand ORDER BY p_brand"""))

  /** SQL-text entry path (SURVEY.md §3.1 lifecycle: parser → analyzer
    * resolving registered temp views → RewritePredicateSubquery turns the
    * IN-subquery into a left-semi join). The exact same SQL string runs in
    * DuckDB — parser/analyzer parity, not just result parity. */
  private val q39SqlText =
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
       ORDER BY c_custkey"""

  private val q39 = QDef(
    "q39_sql_entry",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q39SqlText) },
    Some(q39SqlText))

  /** q180: the versioned-catalog surface ([[graft.engine.Catalog]]'s
    * Delta-parity ops, the reference's implicit Delta MERGE/time-travel,
    * `01_aml_network_analysis.py:245`) driven under the oracle — the one
    * engine surface that was spec-only through round 9. A scratch
    * warehouse is built from the customer table, MERGE-upserted twice
    * (updates + inserts, each writing an immutable `__vN` snapshot), then
    * BOTH versions are time-travel-read back and diffed
    * ([[graft.engine.Diff.diffSummary]]), the table is COMPACTED (a new
    * identical snapshot — the diff vs the pre-compact version must count
    * zero changes) and VACUUMED down to the newest two snapshots (history
    * length before/after hashed): per-status row counts plus the version
    * counts. Every count is recomputed by the oracle from the same
    * customer rows (upsert = anti-join ∪ updates), so a broken snapshot
    * write, version resolution, merge, compaction rewrite, or vacuum
    * retention hash-fails. The v1-vs-v2 diff is localCheckpointed BEFORE
    * the vacuum that deletes __v1 — the documented in-flight-reader
    * discipline, exercised here. The scratch dir rides the JVM-exit
    * reaper because the returned frame plans over snapshot parquet
    * lazily. */
  private val q180 = QDef(
    "q180_catalog_time_travel",
    (s, dir) => {
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q180_").toString)
      val cat = new graft.engine.Catalog(s, tmp)
      val view = "cust_v_" + new java.io.File(tmp).getName.replace("q180_", "")
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
      cat.save(view, base)
      // upsert 1 -> __v1: +100 on BUILDING, 50 synthetic inserts
      val updA = base.where(col("segment") === "BUILDING")
        .withColumn("acctbal", col("acctbal") + 100.0)
        .unionByName(s.range(1, 51).select(
          (lit(10000000L) + col("id")).as("id"),
          concat(lit("synthetic_"), col("id")).as("name"),
          (col("id") * 10).cast("double").as("acctbal"),
          lit("NEW").as("segment")))
      cat.upsert(view, updA, Seq("id"))
      // upsert 2 -> __v2: +50 on MACHINERY, re-price even synthetics,
      // 7 late inserts
      val updB = base.where(col("segment") === "MACHINERY")
        .withColumn("acctbal", col("acctbal") + 50.0)
        .unionByName(s.range(1, 26).select(
          (lit(10000000L) + col("id") * 2).as("id"),
          concat(lit("synthetic_"), col("id") * 2).as("name"),
          (col("id") * 2 * 20).cast("double").as("acctbal"),
          lit("NEW").as("segment")))
        .unionByName(s.range(1, 8).select(
          (lit(20000000L) + col("id")).as("id"),
          concat(lit("late_"), col("id")).as("name"),
          col("id").cast("double").as("acctbal"),
          lit("NEW").as("segment")))
      cat.upsert(view, updB, Seq("id"))
      val v1 = cat.tableVersion(view, 1)
      val v2 = cat.tableVersion(view, 2)
      // localCheckpoint BEFORE vacuum: the diff plans over the __v1 dir,
      // which the vacuum below garbage-collects — exactly the in-flight-
      // reader hazard Catalog.vacuum's contract warns about, resolved the
      // way a real pipeline does (materialize, then vacuum)
      val diffRows = graft.engine.Diff.diffSummary(v1, v2, "id").localCheckpoint()
      // compact -> __v3 with identical rows; vacuum then drops __v1 only
      cat.compact(view, targetFiles = 2)
      val compactChanged = graft.engine.Diff
        .diff(cat.tableVersion(view, 2), cat.tableVersion(view, 3), "id")
        .where(col("status") =!= "unchanged")
        .agg(count(lit(1)).as("n"))
        .select(lit("compact_changed").as("status"), col("n"))
      val versionsBefore = cat.history(view).length.toLong
      cat.vacuum(view, keep = 2)
      val versionsAfter = cat.history(view).length.toLong
      val out = diffRows
        .unionByName(compactChanged)
        .unionByName(s.range(1).select(
          lit("versions_available").as("status"), lit(versionsBefore).as("n")))
        .unionByName(s.range(1).select(
          lit("versions_after_vacuum").as("status"), lit(versionsAfter).as("n")))
        .orderBy("status")
      // drop the scratch view: nothing in `out` plans through it (diffRows
      // is checkpointed; compactChanged reads snapshot paths directly), and
      // leaving it would accumulate one temp view per Bench/Verify
      // iteration on the shared session
      cat.drop(view)
      out
    },
    Some("""WITH base AS (
              SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
                     c_acctbal AS acctbal, c_mktsegment AS segment
              FROM customer),
            updA AS (
              SELECT id, name, acctbal + 100 AS acctbal, segment FROM base
              WHERE segment = 'BUILDING'
              UNION ALL
              SELECT 10000000 + r, 'synthetic_' || r,
                     CAST(r * 10 AS DOUBLE), 'NEW'
              FROM range(1, 51) t(r)),
            v1 AS (
              SELECT * FROM base WHERE id NOT IN (SELECT id FROM updA)
              UNION ALL SELECT * FROM updA),
            updB AS (
              SELECT id, name, acctbal + 50 AS acctbal, segment FROM base
              WHERE segment = 'MACHINERY'
              UNION ALL
              SELECT 10000000 + r, 'synthetic_' || r,
                     CAST(r * 20 AS DOUBLE), 'NEW'
              FROM range(2, 51, 2) t(r)
              UNION ALL
              SELECT 20000000 + r, 'late_' || r, CAST(r AS DOUBLE), 'NEW'
              FROM range(1, 8) t(r)),
            v2 AS (
              SELECT * FROM v1 WHERE id NOT IN (SELECT id FROM updB)
              UNION ALL SELECT * FROM updB),
            d AS (
              SELECT CASE
                       WHEN b.id IS NULL THEN 'removed'
                       WHEN a.id IS NULL THEN 'added'
                       WHEN a.name IS DISTINCT FROM b.name
                         OR a.acctbal IS DISTINCT FROM b.acctbal
                         OR a.segment IS DISTINCT FROM b.segment
                         THEN 'changed'
                       ELSE 'unchanged' END AS status
              FROM v1 a FULL JOIN v2 b ON a.id = b.id)
            SELECT status, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
            UNION ALL
            SELECT 'compact_changed', CAST(0 AS BIGINT)
            UNION ALL
            SELECT 'versions_available', CAST(3 AS BIGINT)
            UNION ALL
            SELECT 'versions_after_vacuum', CAST(2 AS BIGINT)
            ORDER BY status"""))

  /** q186: the CSV and JSON-lines sources/sinks under the oracle — the
    * reference loads its dedupe corpus exactly this way
    * (`config/aml_config.py:87-94`: header + inferSchema CSV). Customer
    * rows round-trip through BOTH interchange formats on a scratch dir
    * (`df.write.csv/json` → [[graft.engine.Sources.csv]]/`jsonLines` with
    * inference), then each read-back is aggregated per segment; the
    * oracle recomputes the same aggregates from the parquet table, so a
    * lossy write, a mis-inferred type, or a header/quoting bug breaks the
    * hash. Doubles survive because both writers emit the shortest
    * round-trippable decimal repr and both engines aggregate exact cents
    * (floor(acctbal·100) as BIGINT); read-back columns are cast
    * explicitly, as a schema-disciplined pipeline would (inference may
    * narrow small ids to INT). */
  private val q186 = QDef(
    "q186_csv_json_roundtrip",
    (s, dir) => {
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q186_").toString)
      val base = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
      base.coalesce(2).write.option("header", "true").csv(s"$tmp/csv")
      base.coalesce(2).write.json(s"$tmp/json")
      def agg(fmt: String, df: DataFrame): DataFrame = df
        .select(col("id").cast("long"), col("name"),
          col("acctbal").cast("double"), col("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("acctbal") * 100).cast("long")).cast("long").as("cents"),
          min(col("name")).as("first_name"),
          max(col("id")).as("max_id"))
        .select(lit(fmt).as("fmt"), col("segment"), col("n"), col("cents"),
          col("first_name"), col("max_id"))
      agg("csv", graft.engine.Sources.csv(s, s"$tmp/csv"))
        .unionByName(agg("json", graft.engine.Sources.jsonLines(s, s"$tmp/json")))
        .orderBy("fmt", "segment")
    },
    Some("""WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
                              c_acctbal AS acctbal, c_mktsegment AS segment
                       FROM customer),
                 a AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CAST(floor(acctbal * 100) AS BIGINT))
                                   AS BIGINT) AS cents,
                              min(name) AS first_name, max(id) AS max_id
                       FROM b GROUP BY segment)
            SELECT 'csv' AS fmt, * FROM a
            UNION ALL
            SELECT 'json' AS fmt, * FROM a
            ORDER BY fmt, segment"""))

  /** Exact quantiles + distinct counts per group (the OLAP summary shape;
    * both engines use the same linear-interpolation definition over sorted
    * exact doubles, so no rounding). The sketch variants
    * (approx_count_distinct / approx_percentile) are demonstrated against
    * these exact values in SketchSpec — sketches are engine-specific, so
    * they cannot be oracle-hashed. */
  private val q43 = QDef(
    "q43_quantiles",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // one percentile buffer for both quantiles — halves the sort-heavy
      // ObjectHashAggregate work vs two separate aggregates. The distinct
      // count runs as its OWN two-phase aggregate joined back on the tiny
      // group key: combining it with percentile() makes Catalyst plan an
      // Expand that doubles the rows feeding the percentile buffers
      // (measured 1.7× slower at sf0.1; worse at 100 TB where the Expand
      // doubles the shuffle too).
      val p = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("__ps"),
          count(lit(1)).as("n_rows"))
      val nd = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_parts"))
      p.join(nd, "l_returnflag")
        .select(col("l_returnflag"),
          col("__ps").getItem(0).as("median_price"),
          col("__ps").getItem(1).as("p95_price"),
          col("n_parts"), col("n_rows"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) AS median_price,
                   quantile_cont(l_extendedprice, 0.95) AS p95_price,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** q158: the SKETCH path of q43's grouped quantiles — Spark's
    * `approx_percentile` (Greenwald–Khanna quantile summaries: a mergeable
    * O(1/ε·log εn) sketch with a deterministic rank guarantee) next to the
    * exact interpolated percentiles. At 100 TB the exact path's per-group
    * sort-heavy percentile buffers hold every value; the GK summary is the
    * scale shape — fixed-size partial state, map-side combinable, one
    * shuffle of sketches. Gated like q93/q155/q157: the EXACT quantiles
    * are the hash-compared columns, and the sketch values are asserted
    * within their rank guarantee genuinely in Spark — accuracy=1000 bounds
    * rank error by 1/1000, so the approx value must lie between the exact
    * quantiles at p∓0.02 (a 20× margin), checked per group (DuckDB pins
    * the assertion columns TRUE). */
  private val q158 = QDef(
    "q158_quantile_sketch",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.48, 0.5, 0.52, 0.93, 0.95, 0.97))")
            .as("__ex"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
            .as("__ap"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          col("__ex").getItem(1).as("median_price"),
          col("__ex").getItem(4).as("p95_price"),
          col("n_rows"),
          col("__ap").getItem(0).between(
            col("__ex").getItem(0), col("__ex").getItem(2))
            .as("within_bound_p50"),
          col("__ap").getItem(1).between(
            col("__ex").getItem(3), col("__ex").getItem(5))
            .as("within_bound_p95"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) AS median_price,
                   quantile_cont(l_extendedprice, 0.95) AS p95_price,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   TRUE AS within_bound_p50, TRUE AS within_bound_p95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** CUBE with grouping_id — the full-lattice companion to q12's rollup
    * (SURVEY.md §2.4 free tier; the reference's grouped aggregations at
    * `01_aml_network_analysis.py:60-63` generalized to all margin
    * combinations). grouping_id disambiguates a real NULL group from a
    * super-aggregate row, which the coalesce sentinel alone cannot; both
    * engines compute it per the SQL standard (bit per column, first column
    * most significant). One hash-aggregate with partial/final — Spark
    * expands the lattice map-side, so the shuffle carries pre-combined
    * partials per grouping set (scale-safe at 100 TB). */
  private val q66 = QDef(
    "q66_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("status"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "flag", "status"),
    Some("""SELECT coalesce(l_returnflag,'(all)') AS flag,
                   coalesce(l_linestatus,'(all)') AS status,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(l_quantity),2) AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY gid, flag, status"""))

  /** Explicit GROUPING SETS — the sparse lattice between q12's rollup and
    * q66's cube: per (segment, status), per segment, and the grand total,
    * but NOT per status alone. Same single-aggregate scale shape as q66. */
  private val q67 = QDef(
    "q67_grouping_sets",
    (s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment"), col("o_orderstatus")),
            Seq(col("c_mktsegment")), Seq()),
          col("c_mktsegment"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("value"))
        .select(
          coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          col("n"), col("value"))
        .orderBy("segment", "status"),
    Some("""SELECT coalesce(c_mktsegment,'(all)') AS segment,
                   coalesce(o_orderstatus,'(all)') AS status,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(o_totalprice),2) AS value
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (c_mktsegment), ())
            ORDER BY segment, status"""))

  /** Pivot (long→wide conditional aggregation; the reporting shape over the
    * reference's alert tables). The pivot values are declared explicitly so
    * Spark skips the extra distinct-values job — at 100 TB an implicit
    * pivot would scan the fact table twice. Compiles to ONE hash aggregate
    * with `count(CASE WHEN ...)` branches (no join, no extra shuffle);
    * the oracle mirrors it as FILTER conditional aggregation. */
  private val q68 = QDef(
    "q68_pivot",
    (s, dir) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val safe = Map("1-URGENT" -> "urgent", "2-HIGH" -> "high",
        "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "notspec", "5-LOW" -> "low")
      val wide = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderpriority"), col("o_totalprice"))
        .groupBy("yr")
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("value"))
      val renamed = prios.foldLeft(wide) { (df, p) =>
        df.withColumnRenamed(s"${p}_n", s"${safe(p)}_n")
          .withColumnRenamed(s"${p}_value", s"${safe(p)}_value")
      }
      renamed.orderBy("yr")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(count(*) FILTER (o_orderpriority='1-URGENT') AS BIGINT) AS urgent_n,
                   round(sum(o_totalprice) FILTER (o_orderpriority='1-URGENT'),2) AS urgent_value,
                   CAST(count(*) FILTER (o_orderpriority='2-HIGH') AS BIGINT) AS high_n,
                   round(sum(o_totalprice) FILTER (o_orderpriority='2-HIGH'),2) AS high_value,
                   CAST(count(*) FILTER (o_orderpriority='3-MEDIUM') AS BIGINT) AS medium_n,
                   round(sum(o_totalprice) FILTER (o_orderpriority='3-MEDIUM'),2) AS medium_value,
                   CAST(count(*) FILTER (o_orderpriority='4-NOT SPECIFIED') AS BIGINT) AS notspec_n,
                   round(sum(o_totalprice) FILTER (o_orderpriority='4-NOT SPECIFIED'),2) AS notspec_value,
                   CAST(count(*) FILTER (o_orderpriority='5-LOW') AS BIGINT) AS low_n,
                   round(sum(o_totalprice) FILTER (o_orderpriority='5-LOW'),2) AS low_value
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Window-function depth beyond q07's row_number: ranking
    * (percent_rank/cume_dist/ntile), a positional first_value, and a
    * running ROWS-frame sum — per-customer order history analytics. The
    * ordering (o_orderdate, o_orderkey) is total, so every function is
    * deterministic; the running sum is over exact integer cents (double
    * window sums are association-order-dependent — DuckDB aggregates
    * frames with a segment tree, Spark sequentially). One shuffle on
    * o_custkey; all six functions share the single sorted partition pass. */
  private val q72 = QDef(
    "q72_window_depth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("o_orderkey")).over(w).as("first_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).over(run).as("run_cents"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   first_value(o_orderkey) OVER w AS first_key,
                   CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, rn"""))

  /** DataFrameNaFunctions surface — fill / replace over a nullable
    * projection (nulls planted deterministically so the cleaning is
    * observable; `na.drop` is spec-covered in DriverSurfaceSpec). The
    * whole chain compiles to one codegen'd projection — null handling
    * costs nothing extra at scale. */
  private val q75 = QDef(
    "q75_na_clean",
    (s, dir) => {
      val dirty = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_orderstatus")).as("status"),
        when(col("o_totalprice") < 50000, lit(null)).otherwise(col("o_totalprice")).as("price"))
      dirty.na.fill(Map("status" -> "UNKNOWN"))
        .na.fill(0.0, Seq("price"))
        .na.replace("status", Map("F" -> "FINAL"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   CASE coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END, 'UNKNOWN')
                     WHEN 'F' THEN 'FINAL'
                     ELSE coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END, 'UNKNOWN')
                   END AS status,
                   coalesce(CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END, 0.0) AS price
            FROM orders ORDER BY o_orderkey"""))

  /** Equi-width histogram via `width_bucket` — the profiling shape behind
    * data-quality dashboards. One hash aggregate on the bucket id;
    * integer-exact counts and cents sums. The oracle mirrors the bucket
    * arithmetic explicitly (floor division, plus width_bucket's
    * out-of-range buckets: v < min → 0, v >= max → num_buckets + 1),
    * pinning the function's semantics rather than assuming DuckDB ships
    * the same builtin. */
  private val q76 = QDef(
    "q76_histogram",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(expr("width_bucket(o_totalprice, 0, 600000, 12)").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
        .orderBy("bucket"),
    Some("""SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                             WHEN o_totalprice >= 600000 THEN 13
                             ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** Correlated subqueries — EXISTS (decorrelates to a left-semi join),
    * NOT EXISTS (anti join), and a correlated scalar count (left-outer +
    * aggregate): Catalyst's RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery at work. Everything integer-exact. */
  private val q77 = QDef(
    "q77_correlated_subqueries",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o.o_orderkey,
                      (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey) AS n_items
               FROM orders o
               WHERE EXISTS (SELECT 1 FROM lineitem l
                             WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
                 AND NOT EXISTS (SELECT 1 FROM lineitem l2
                                 WHERE l2.l_orderkey = o.o_orderkey
                                   AND l2.l_returnflag = 'R')
               ORDER BY o.o_orderkey""")
    },
    Some("""SELECT o.o_orderkey,
                   (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey) AS n_items
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
              AND NOT EXISTS (SELECT 1 FROM lineitem l2
                              WHERE l2.l_orderkey = o.o_orderkey
                                AND l2.l_returnflag = 'R')
            ORDER BY o.o_orderkey"""))

  /** Date/time scalar battery (§2.9 depth): truncation, month-end,
    * calendar arithmetic with end-of-month clamping, day differences, and
    * calendar fields. Dates are emitted as formatted strings and integers
    * (never raw timestamps — engines disagree on timestamp physical
    * precision, not on the calendar values). Note dayofweek: Spark is
    * 1=Sunday..7, DuckDB 0=Sunday..6 — the oracle shifts explicitly. One
    * codegen'd projection, no shuffle. */
  private val q81 = QDef(
    "q81_date_functions",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"),
        quarter(col("o_orderdate")).cast("long").as("q"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
                   strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
                   strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
                   CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
                   CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
                   CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
                   CAST(quarter(o_orderdate) AS BIGINT) AS q
            FROM orders ORDER BY o_orderkey"""))

  /** String scalar battery (§2.9 depth): concat_ws, padding, position,
    * piece extraction, reverse, regex extraction, repetition. One
    * codegen'd projection, no shuffle. */
  private val q82 = QDef(
    "q82_string_functions",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("padded"),
        instr(col("o_orderpriority"), "-").cast("long").as("dashpos"),
        substring_index(col("o_orderpriority"), "-", -1).as("prio_word"),
        reverse(col("o_orderpriority")).as("rev_prio"),
        regexp_extract(col("o_orderpriority"), "[0-9]+", 0).as("prio_num"),
        repeat(col("o_orderstatus"), 3).as("st3"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
                   lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
                   CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dashpos,
                   split_part(o_orderpriority, '-', 2) AS prio_word,
                   reverse(o_orderpriority) AS rev_prio,
                   regexp_extract(o_orderpriority, '[0-9]+', 0) AS prio_num,
                   repeat(o_orderstatus, 3) AS st3
            FROM orders ORDER BY o_orderkey"""))

  /** q106: ANALYZE-style per-column statistics ([[graft.engine.Stats]]) —
    * row/null/distinct counts plus numeric min/max over every lineitem
    * column in one unpivot + keyed aggregate. The oracle enumerates the
    * same profile per column (exact NDV; the HLL variant is spec-gated). */
  private val q106 = {
    val cols = Seq( // (name, isNumeric) — lineitem schema, TESTDATA.md
      "l_orderkey" -> true, "l_partkey" -> true, "l_suppkey" -> true,
      "l_linenumber" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
      "l_discount" -> true, "l_tax" -> true, "l_returnflag" -> false,
      "l_linestatus" -> false, "l_shipdate" -> false)
    val branches = cols.map { case (c, num) =>
      val (mn, mx) =
        if (num) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
                 $mn AS min_num, $mx AS max_num
          FROM lineitem"""
    }
    QDef(
      "q106_table_stats",
      (s, dir) => graft.engine.Stats.columnStats(t(s, dir, "lineitem"))
        .orderBy("col_name"),
      Some(branches.mkString("", " UNION ALL ", " ORDER BY col_name")))
  }

  /** q176: the AT-SCALE stats mode under the contract — q106 registers
    * [[graft.engine.Stats.columnStats]]'s exact-NDV mode (oracle parity);
    * this row runs the `approxNdv = true` HyperLogLog path (no Expand,
    * one map-side-combinable pass — THE mode a 100 TB ANALYZE runs) and
    * gates it with the q93 device: the hash-compared columns are the
    * exact profile (reproduced by DuckDB) plus a within-4×rsd assertion
    * on the HLL estimate computed genuinely in Spark (rsd 0.05 default →
    * bound 0.2·exact; the sketch value itself is engine-specific, so the
    * bound — not the estimate — is the portable contract). A broken HLL
    * path (garbage estimates, wrong column routing) flips within_bound
    * and fails the row hash. Runs on orders so the Expand of the exact
    * side stays cheap next to q106's lineitem profile. */
  private val q176 = {
    val cols = Seq( // (name, isNumeric) — orders schema, TESTDATA.md
      "o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
      "o_totalprice" -> true, "o_orderdate" -> false,
      "o_orderpriority" -> false)
    val branches = cols.map { case (c, num) =>
      val (mn, mx) =
        if (num) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
                 $mn AS min_num, $mx AS max_num, TRUE AS within_bound
          FROM orders"""
    }
    QDef(
      "q176_table_stats_hll",
      (s, dir) => {
        val approx = graft.engine.Stats
          .columnStats(t(s, dir, "orders"), approxNdv = true)
          .select(col("col_name"), col("ndv").as("__hll"))
        graft.engine.Stats.columnStats(t(s, dir, "orders"))
          .join(approx, Seq("col_name"))
          .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
            col("min_num"), col("max_num"),
            (abs(col("__hll") - col("ndv")).cast("double") <=
              lit(0.2) * col("ndv").cast("double")).as("within_bound"))
          .orderBy("col_name")
      },
      Some(branches.mkString("", " UNION ALL ", " ORDER BY col_name")))
  }

  /** q109: snapshot diff ([[graft.engine.Diff]]) between documents and a
    * deterministically perturbed v2 (drop id%7==0, edit text of id%5==0,
    * add id%11==0 clones under offset ids) — per-key added/removed/
    * changed/unchanged status via one full-outer join + null-safe struct
    * compare, mirrored column-wise with IS DISTINCT FROM. */
  private val q109 = QDef(
    "q109_snapshot_diff",
    (s, dir) => {
      val v1 = t(s, dir, "documents")
      val v2 = v1.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .union(v1.filter(pmod(col("doc_id"), lit(11)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.engine.Diff.diff(v1, v2, "doc_id").orderBy("doc_id")
    },
    Some("""WITH v2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
                     lang, source, n_chars
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000, text, lang, source, n_chars
              FROM documents WHERE doc_id % 11 = 0)
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.doc_id IS NULL THEN 'added'
                        WHEN o.text IS DISTINCT FROM n.text
                          OR o.lang IS DISTINCT FROM n.lang
                          OR o.source IS DISTINCT FROM n.source
                          OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
            ORDER BY doc_id"""))

  /** q132: referential-integrity audit over the full TPC-H-ish FK graph
    * ([[graft.engine.Stats.integrityAudit]]) — per FK the child rows,
    * NULL keys, and orphans. One anti-join per FK, scalar outputs only. */
  private val q132 = {
    val fkDefs = Seq(
      ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem.order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
      ("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
    QDef(
      "q132_fk_integrity",
      (s, dir) => graft.engine.Stats.integrityAudit(
          fkDefs.map { case (name, c, ck, p, pk) =>
            (name, t(s, dir, c), ck, t(s, dir, p), pk)
          })
        .orderBy("fk"),
      Some(fkDefs.map { case (name, c, ck, p, pk) =>
        s"""SELECT '$name' AS fk,
                   (SELECT CAST(count(*) AS BIGINT) FROM $c) AS n_rows,
                   (SELECT CAST(count(*) AS BIGINT) FROM $c
                    WHERE $ck IS NULL) AS n_null_keys,
                   (SELECT CAST(count(*) AS BIGINT) FROM $c
                    WHERE $ck IS NOT NULL AND $ck NOT IN
                      (SELECT $pk FROM $p)) AS n_orphans"""
      }.mkString("", " UNION ALL ", " ORDER BY fk")))
  }

  /** q140: one-pass Pearson correlation matrix over lineitem's fixed-
    * point numerics ([[graft.engine.Stats.corrMatrix]]) — exact integer-
    * cent DECIMAL sums (order-independent), one fixed-shape double
    * expression per pair, mirrored verbatim. */
  private val q140 = {
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cs.indices; j <- cs.indices if i < j
    } yield (cs(i), cs(j))
    def h(c: String) = s"CAST(round($c * 100) AS HUGEINT)"
    val aggArms = (
      Seq("CAST(count(*) AS BIGINT) AS n") ++
      cs.flatMap(c => Seq(s"sum(${h(c)}) AS s_$c", s"sum(${h(c)} * ${h(c)}) AS q_$c")) ++
      pairs.map { case (x, y) => s"sum(${h(x)} * ${h(y)}) AS p_${x}__$y" }
    ).mkString(", ")
    val arms = pairs.map { case (x, y) =>
      s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
            round((CAST(n AS DOUBLE) * CAST(p_${x}__$y AS DOUBLE)
                   - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE)) /
                  (sqrt(CAST(n AS DOUBLE) * CAST(q_$x AS DOUBLE)
                        - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE)) *
                   sqrt(CAST(n AS DOUBLE) * CAST(q_$y AS DOUBLE)
                        - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE))), 6)
              AS corr
          FROM a"""
    }.mkString(" UNION ALL ")
    QDef(
      "q140_corr_matrix",
      (s, dir) => graft.engine.Stats
        .corrMatrix(t(s, dir, "lineitem"), cs)
        .orderBy("col_x", "col_y"),
      Some(s"""WITH a AS (SELECT $aggArms FROM lineitem)
               $arms ORDER BY col_x, col_y"""))
  }

  /** q146: group-wise OLS regression of extended price on quantity per
    * (returnflag, linestatus) ([[graft.engine.Stats.groupRegression]]) —
    * one keyed aggregate of exact integer-cent sufficient statistics,
    * closed-form slope/intercept/r² per group, mirrored verbatim. */
  private val q146 = {
    def d(e: String) = s"CAST($e AS DOUBLE)"
    val (hx, hy) = ("CAST(round(l_quantity * 100) AS HUGEINT)",
      "CAST(round(l_extendedprice * 100) AS HUGEINT)")
    val slope =
      s"""((${d("n")} * ${d("pxy")} - ${d("sx")} * ${d("sy")}) /
          (${d("n")} * ${d("qx")} - ${d("sx")} * ${d("sx")}))"""
    QDef(
      "q146_group_regression",
      (s, dir) => graft.engine.Stats
        .groupRegression(t(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus"),
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""WITH a AS (
                 SELECT l_returnflag, l_linestatus,
                        CAST(count(*) AS BIGINT) AS n,
                        sum($hx) AS sx, sum($hy) AS sy,
                        sum($hx * $hx) AS qx, sum($hy * $hy) AS qy,
                        sum($hx * $hy) AS pxy
                 FROM lineitem GROUP BY 1, 2)
               SELECT l_returnflag, l_linestatus, n,
                 round($slope, 6) AS slope,
                 round((${d("sy")} - $slope * ${d("sx")}) /
                       (${d("n")} * 100.0), 6) AS intercept,
                 round((${d("n")} * ${d("pxy")} - ${d("sx")} * ${d("sy")}) *
                       (${d("n")} * ${d("pxy")} - ${d("sx")} * ${d("sy")}) /
                       ((${d("n")} * ${d("qx")} - ${d("sx")} * ${d("sx")}) *
                        (${d("n")} * ${d("qy")} - ${d("sy")} * ${d("sy")})),
                       6) AS r2
               FROM a ORDER BY l_returnflag, l_linestatus"""))
  }

  val all: Seq[QDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
      q39, q43, q66, q67, q68, q72, q75, q76, q77, q81, q82, q106, q109,
      q132, q140, q146, q158, q176, q180, q186)
}
