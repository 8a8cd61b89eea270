#!/usr/bin/env python3
"""Cross-engine SQL fuzzer, generation step (repo tooling, driver-side env).

Emits deterministic pseudo-random ANSI-SQL queries over the lineitem and
orders tables (name<TAB>sql, one per line). The dialect subset is chosen so
Spark and DuckDB agree bit-for-bit: integer-exact aggregates (count,
integer-cast sums), min/max (no arithmetic), modular and comparison
predicates, IN lists, totally-ordered output. Four template families:

  agg      - filtered GROUP BY aggregate over lineitem (the original family)
  latsel   - correlated scalar subqueries in the SELECT list and LATERAL
             aggregate derived tables (decorrelation to outer aggregates)
  outerjoin- orders LEFT/FULL JOIN lineitem with predicates in the ON clause
             (exercises null-extension + join-condition vs filter semantics)
  window   - ROWS-framed window aggregates / lag / lead partitioned by
             l_orderkey ordered by the unique (within order) l_linenumber,
             so frame contents are deterministic in both engines
  corrsub  - correlated scalar-count subqueries and [NOT] EXISTS against
             lineitem from an orders scan
  setop    - UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] between two
             filtered projections (exercises distinct vs bag semantics and
             set-op column resolution)
  caseexpr - CASE WHEN grouping keys with integer-exact aggregates and
             optional HAVING (exercises expression-keyed aggregation)
  gsets    - GROUPING SETS / ROLLUP / CUBE with grouping() markers
             (exercises grouping-set expansion / the Expand operator)
  setwin   - set operations between window-function branches (distinct/bag
             semantics applied to window outputs)

Usage: python3 tools/fuzz_gen.py [n_queries] [seed] [out_path]
Then:  sbt console < tools/fuzz_run.sc          # Spark side -> /tmp/fuzz_out
Then:  python3 tools/fuzz_check.py /tmp/fuzz_out /root/testdata/sf0.01

The committed corpus tools/fuzz_corpus.tsv is this generator's output for
(240, 20260816) and is ALSO run inside `sbt test` (graft.queries.FuzzSpec)
as a config-perturbation self-consistency gate: every query must return
identical results under default confs and under AQE-off / whole-stage-
codegen-off / different shuffle partitioning.
"""
import random, sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fuzz_queries.tsv"
rng = random.Random(SEED)

# the driver testdata carries a TPC-H column subset — see TESTDATA.md
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def predicate(prefix=""):
    kind = rng.choice(["numcmp", "strin", "mod", "range", "streq"])
    if kind == "numcmp":
        c = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        v = round(rng.uniform(0, 60), 2) if c == "l_quantity" else round(rng.uniform(0, 0.1), 3)
        if c == "l_extendedprice":
            v = round(rng.uniform(900, 90000), 2)
        return f"{prefix}{c} {op} {v}"
    if kind == "strin":
        c = rng.choice(STR_COLS)
        vals = rng.sample(STR_VALS[c], rng.randint(1, min(3, len(STR_VALS[c]))))
        lst = ", ".join(f"'{v}'" for v in vals)
        return f"{prefix}{c} IN ({lst})"
    if kind == "mod":
        c = rng.choice(KEY_COLS)
        k = rng.randint(2, 13)
        return f"{prefix}{c} % {k} = {rng.randint(0, k - 1)}"
    if kind == "range":
        c = rng.choice(KEY_COLS)
        lo = rng.randint(0, 40000)
        return f"{prefix}{c} BETWEEN {lo} AND {lo + rng.randint(100, 20000)}"
    c = rng.choice(STR_COLS)
    return f"{prefix}{c} = '{rng.choice(STR_VALS[c])}'"


def aggregate(i):
    return rng.choice([
        "CAST(count(*) AS BIGINT) AS n%d" % i,
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq%d" % i,
        "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents%d" % i,
        "min(l_extendedprice) AS mn%d" % i,
        "max(l_extendedprice) AS mx%d" % i,
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd%d" % i,
        "CAST(min(l_orderkey) AS BIGINT) AS mink%d" % i,
    ])


def query_agg(qi):
    preds = " AND ".join(predicate() for _ in range(rng.randint(1, 3)))
    if rng.random() < 0.3:
        preds = f"({preds}) OR ({predicate()})"
    group = rng.choice(
        ["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus",
         "l_linenumber", "l_orderkey % 5"])
    aggs = ", ".join(aggregate(i) for i in range(rng.randint(1, 3)))
    gsel = ", ".join(
        f"{g.strip()} AS g{j}" for j, g in enumerate(group.split(",")))
    gord = ", ".join(f"g{j}" for j in range(len(group.split(","))))
    having = (f" HAVING count(*) >= {rng.randint(2, 5)}"
              if rng.random() < 0.3 else "")
    return (f"SELECT {gsel}, {aggs} FROM lineitem WHERE {preds} "
            f"GROUP BY {group}{having} ORDER BY {gord}")


def query_outerjoin(qi):
    # orders LEFT/FULL JOIN lineitem: predicates in the ON clause exercise
    # null-extension semantics (a pred in ON keeps the left row, in WHERE it
    # would drop it). Aggregates count only matched rows via count(col).
    k = rng.randint(3, 19)
    r = rng.randint(0, k - 1)
    on_pred = predicate()
    jtype = rng.choice(["LEFT", "LEFT", "FULL"])  # FULL less often
    if jtype == "FULL":
        # filter BOTH sides in subqueries so unmatched rows exist on each
        k2 = rng.randint(2, 7)
        return (
            f"SELECT coalesce(o_orderkey, l_orderkey) AS g0, "
            f"CAST(count(o_custkey) AS BIGINT) AS no0, "
            f"CAST(count(l_linenumber) AS BIGINT) AS nl0, "
            f"CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS sq0 "
            f"FROM (SELECT * FROM orders WHERE o_orderkey % {k} = {r}) o "
            f"FULL JOIN (SELECT * FROM lineitem WHERE l_orderkey % {k2} = {rng.randint(0, k2 - 1)}) l "
            f"ON l_orderkey = o_orderkey "
            f"GROUP BY coalesce(o_orderkey, l_orderkey) ORDER BY g0")
    return (
        f"SELECT o_orderkey AS g0, CAST(count(l_orderkey) AS BIGINT) AS n0, "
        f"CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS sq0, "
        f"CAST(coalesce(min(l_linenumber), -1) AS BIGINT) AS mn0 "
        f"FROM orders LEFT JOIN lineitem "
        f"ON l_orderkey = o_orderkey AND ({on_pred}) "
        f"WHERE o_orderkey % {k} = {r} "
        f"GROUP BY o_orderkey ORDER BY g0")


def query_window(qi):
    # partition by l_orderkey; the in-partition ORDER BY must be a total
    # order or ROWS frames/lag/lead are tie-nondeterministic across engines.
    # l_linenumber alone is NOT unique per order in the synthetic testdata
    # (unlike real TPC-H) — (l_linenumber, l_partkey, l_suppkey, l_quantity,
    # l_extendedprice) is verified unique within l_orderkey at all three SFs.
    order = ("l_linenumber, l_partkey, l_suppkey, l_quantity, "
             "l_extendedprice")
    frame = rng.choice([
        f"ROWS BETWEEN {rng.randint(1, 4)} PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN CURRENT ROW AND {rng.randint(1, 4)} FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ])
    over = f"OVER (PARTITION BY l_orderkey ORDER BY {order} {frame})"
    over_nof = f"OVER (PARTITION BY l_orderkey ORDER BY {order})"
    wexpr = rng.choice([
        f"CAST(sum(CAST(l_quantity AS BIGINT)) {over} AS BIGINT) AS w0",
        f"CAST(count(*) {over} AS BIGINT) AS w0",
        f"CAST(min(l_linenumber) {over} AS BIGINT) AS w0",
        f"CAST(max(l_suppkey) {over} AS BIGINT) AS w0",
        f"CAST(coalesce(lag(l_linenumber, {rng.randint(1, 2)}) {over_nof}, -1) AS BIGINT) AS w0",
        f"CAST(coalesce(lead(l_linenumber, {rng.randint(1, 2)}) {over_nof}, -1) AS BIGINT) AS w0",
        f"CAST(row_number() {over_nof} AS BIGINT) AS w0",
    ])
    k = rng.randint(2, 9)
    return (
        f"SELECT l_orderkey AS g0, l_linenumber AS g1, {wexpr} "
        f"FROM lineitem WHERE l_orderkey % {k} = {rng.randint(0, k - 1)} "
        f"ORDER BY g0, g1, l_partkey, l_suppkey, l_quantity, l_extendedprice")


def query_corrsub(qi):
    k = rng.randint(3, 19)
    r = rng.randint(0, k - 1)
    kind = rng.choice(["scalar", "exists", "notexists"])
    inner_pred = predicate("l.")
    if kind == "scalar":
        op = rng.choice([">=", "=", "<="])
        m = rng.randint(0, 4)
        return (
            f"SELECT o_orderkey AS g0 FROM orders o "
            f"WHERE o_orderkey % {k} = {r} AND "
            f"(SELECT CAST(count(*) AS BIGINT) FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND ({inner_pred})) {op} {m} "
            f"ORDER BY g0")
    neg = "NOT " if kind == "notexists" else ""
    return (
        f"SELECT o_orderkey AS g0, o_orderstatus AS g1 FROM orders o "
        f"WHERE o_orderkey % {k} = {r} AND {neg}EXISTS "
        f"(SELECT 1 FROM lineitem l "
        f"WHERE l.l_orderkey = o.o_orderkey AND ({inner_pred})) "
        f"ORDER BY g0")


def query_setop(qi):
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                     "INTERSECT ALL", "EXCEPT ALL"])
    cols = ("l_returnflag AS g0, l_linestatus AS g1, "
            "CAST(l_linenumber AS BIGINT) AS g2")
    p1, p2 = predicate(), predicate()
    # duplicate rows under ALL semantics are identical tuples, so the
    # trailing total ORDER BY still yields one canonical row sequence
    return (f"SELECT {cols} FROM lineitem WHERE {p1} "
            f"{op} "
            f"SELECT {cols} FROM lineitem WHERE {p2} "
            f"ORDER BY g0, g1, g2")


def query_latsel(qi):
    # round-10 grammar growth: correlated subqueries in the PROJECTION
    # (scalar-count / coalesced-scalar-min in SELECT) and LATERAL aggregate
    # derived tables — both decorrelate to left outer aggregates, a rewrite
    # path none of the other families exercise. Aggregate laterals always
    # produce exactly one row, so cardinality is engine-independent.
    k = rng.randint(3, 19)
    r = rng.randint(0, k - 1)
    p1, p2 = predicate("l."), predicate("l.")
    if rng.random() < 0.5:
        return (
            f"SELECT o_orderkey AS g0, "
            f"CAST((SELECT count(*) FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND ({p1})) AS BIGINT) AS c0, "
            f"CAST(coalesce((SELECT min(l.l_linenumber) FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND ({p2})), -1) AS BIGINT) AS m0 "
            f"FROM orders o WHERE o_orderkey % {k} = {r} ORDER BY g0")
    return (
        f"SELECT o_orderkey AS g0, t.c0 AS c0, t.m0 AS m0 "
        f"FROM orders o, LATERAL ("
        f"SELECT CAST(count(*) AS BIGINT) AS c0, "
        f"CAST(coalesce(min(l.l_linenumber), -1) AS BIGINT) AS m0 "
        f"FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND ({p1})) t "
        f"WHERE o_orderkey % {k} = {r} ORDER BY g0")


def query_case(qi):
    p1, p2 = predicate(), predicate()
    case = f"CASE WHEN {p1} THEN 'a' WHEN {p2} THEN 'b' ELSE 'c' END"
    having = (f" HAVING count(*) >= {rng.randint(2, 4)}"
              if rng.random() < 0.3 else "")
    return (f"SELECT {case} AS g0, CAST(count(*) AS BIGINT) AS n0, "
            f"CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq0 "
            f"FROM lineitem GROUP BY {case}{having} ORDER BY g0")


def query_groupsets(qi):
    # round-11 grammar growth: GROUPING SETS / ROLLUP / CUBE — grouping-set
    # expansion (Spark's Expand operator) plus the grouping() marker, a
    # rewrite family no other template touches. NULL group placeholders are
    # coalesced and disambiguated by grouping() flags so both engines
    # produce identical, totally-ordered keys.
    spec = rng.choice([
        "ROLLUP(l_returnflag, l_linestatus)",
        "CUBE(l_returnflag, l_linestatus)",
        "GROUPING SETS ((l_returnflag), (l_linestatus), ())",
        "GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())",
    ])
    pred = predicate()
    aggs = ", ".join(aggregate(i) for i in range(rng.randint(1, 2)))
    return (
        f"SELECT coalesce(l_returnflag, '_') AS g0, "
        f"coalesce(l_linestatus, '_') AS g1, "
        f"CAST(grouping(l_returnflag) AS BIGINT) AS gr0, "
        f"CAST(grouping(l_linestatus) AS BIGINT) AS gr1, {aggs} "
        f"FROM lineitem WHERE {pred} "
        # HAVING count(*) > 0 normalizes a genuine cross-engine divergence
        # this family found on its first run (fz209, seed 20260816): over an
        # EMPTY filtered input, DuckDB emits the ()-grouping-set grand-total
        # row (per the standard's scalar-aggregate reading), Spark emits
        # nothing (Expand over zero rows). The clause is a no-op on every
        # non-empty group and makes both engines agree on the empty case.
        f"GROUP BY {spec} HAVING count(*) > 0 ORDER BY gr0, gr1, g0, g1")


def query_setwin(qi):
    # round-11 grammar growth: set operations OVER window-function branches —
    # the distinct/bag set-op semantics must apply to the window OUTPUTS
    # (each branch's row_number/sum runs over its own filtered partition
    # contents first), composing two rewrite paths the other families only
    # exercise separately. The in-partition ORDER BY is the verified-unique
    # tuple, so both engines see identical frames.
    order = ("l_linenumber, l_partkey, l_suppkey, l_quantity, "
             "l_extendedprice")
    over = f"OVER (PARTITION BY l_orderkey ORDER BY {order})"
    wcol = rng.choice([
        f"CAST(row_number() {over} AS BIGINT)",
        f"CAST(sum(CAST(l_quantity AS BIGINT)) {over} AS BIGINT)",
        f"CAST(min(l_linenumber) {over} AS BIGINT)",
    ])
    cols = f"l_orderkey AS g0, {wcol} AS g1"
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    k1, k2 = rng.randint(2, 7), rng.randint(2, 7)
    r1, r2 = rng.randint(0, k1 - 1), rng.randint(0, k2 - 1)
    return (f"SELECT {cols} FROM lineitem WHERE l_orderkey % {k1} = {r1} "
            f"{op} "
            f"SELECT {cols} FROM lineitem WHERE l_orderkey % {k2} = {r2} "
            f"ORDER BY g0, g1")


def query_filtagg(qi):
    # ANSI FILTER (WHERE ...) aggregates — per-aggregate predicates over
    # one scan (exercises conditional-aggregate rewrite paths; a FILTER
    # that matches nothing must yield 0 for counts and NULL for min/max
    # in BOTH engines)
    group = rng.choice(["l_returnflag", "l_linestatus", "l_linenumber"])
    aggs = []
    for i in range(rng.randint(2, 3)):
        base = rng.choice([
            "count(*)",
            "sum(CAST(l_quantity AS BIGINT))",
            "count(DISTINCT l_suppkey)",
            "min(l_orderkey)",
        ])
        aggs.append(
            f"CAST({base} FILTER (WHERE {predicate()}) AS BIGINT) AS f{i}")
    return (f"SELECT {group} AS g0, {', '.join(aggs)} FROM lineitem "
            f"WHERE {predicate()} GROUP BY {group} ORDER BY g0")


FAMILIES = [
    ("agg", query_agg, 0.14),
    ("oj", query_outerjoin, 0.15),
    ("win", query_window, 0.12),
    ("sub", query_corrsub, 0.13),
    ("set", query_setop, 0.10),
    ("case", query_case, 0.05),
    ("latsel", query_latsel, 0.08),
    ("gsets", query_groupsets, 0.08),
    ("setwin", query_setwin, 0.07),
    ("filtagg", query_filtagg, 0.08),
]


def query(qi):
    x = rng.random()
    acc = 0.0
    for _, fn, w in FAMILIES:
        acc += w
        if x < acc:
            return fn(qi)
    return query_agg(qi)


with open(OUT, "w") as f:
    for i in range(N):
        f.write(f"fz{i:03d}\t{query(i)}\n")
print(f"wrote {N} queries (seed {SEED}) to {OUT}")
