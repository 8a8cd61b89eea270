#!/usr/bin/env python3
"""Cross-engine SQL fuzzer, generation step (repo tooling, driver-side env).

Emits deterministic pseudo-random ANSI-SQL queries over the lineitem table
to /tmp/fuzz_queries.tsv (name<TAB>sql, one per line). The dialect subset is
chosen so Spark and DuckDB agree bit-for-bit: integer-exact aggregates
(count, integer-cast sums), min/max (no arithmetic), modular and comparison
predicates, IN lists, grouped by low-cardinality keys with a total ORDER BY.

Usage: python3 tools/fuzz_gen.py [n_queries] [seed]
Then:  sbt console < tools/fuzz_run.sc
Then:  python3 tools/fuzz_check.py /tmp/fuzz_out /root/testdata/sf0.01
"""
import random, sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
rng = random.Random(SEED)

# the driver testdata carries a TPC-H column subset — see TESTDATA.md
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def predicate():
    kind = rng.choice(["numcmp", "strin", "mod", "range", "streq"])
    if kind == "numcmp":
        c = rng.choice(NUM_COLS)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        v = round(rng.uniform(0, 60), 2) if c == "l_quantity" else round(rng.uniform(0, 0.1), 3)
        if c == "l_extendedprice":
            v = round(rng.uniform(900, 90000), 2)
        return f"{c} {op} {v}"
    if kind == "strin":
        c = rng.choice(STR_COLS)
        vals = rng.sample(STR_VALS[c], rng.randint(1, min(3, len(STR_VALS[c]))))
        lst = ", ".join(f"'{v}'" for v in vals)
        return f"{c} IN ({lst})"
    if kind == "mod":
        c = rng.choice(KEY_COLS)
        k = rng.randint(2, 13)
        return f"{c} % {k} = {rng.randint(0, k - 1)}"
    if kind == "range":
        c = rng.choice(KEY_COLS)
        lo = rng.randint(0, 40000)
        return f"{c} BETWEEN {lo} AND {lo + rng.randint(100, 20000)}"
    c = rng.choice(STR_COLS)
    return f"{c} = '{rng.choice(STR_VALS[c])}'"


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


def query(qi):
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
    return (f"SELECT {gsel}, {aggs} FROM lineitem WHERE {preds} "
            f"GROUP BY {group} ORDER BY {gord}")


with open("/tmp/fuzz_queries.tsv", "w") as f:
    for i in range(N):
        f.write(f"fz{i:03d}\t{query(i)}\n")
print(f"wrote {N} queries (seed {SEED}) to /tmp/fuzz_queries.tsv")
