#!/usr/bin/env python3
"""Cross-engine SQL fuzzer, compare step (repo tooling, driver-side env).

Re-runs each /tmp/fuzz_queries.tsv query in DuckDB over the same parquet
tables and compares against the Spark parquet dumps with check.py's exact
rules (sorted columns, exact values). Usage:

    python3 tools/fuzz_check.py /tmp/fuzz_out /root/testdata/sf0.01
"""
import glob, os, sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for line in open("/tmp/fuzz_queries.tsv"):
        name, sql = line.rstrip("\n").split("\t", 1)
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files).to_pandas()
        exp = con.execute(sql).fetch_df()
        got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
        ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
        if ok:
            for c in got.columns:
                a, b = got[c].values, exp[c].values
                if got[c].dtype.kind == 'f':
                    bad = ~np.isclose(a.astype(float), b.astype(float),
                                      rtol=0, atol=0, equal_nan=True)
                else:
                    bad = pd.Series(a).astype(str).values != pd.Series(b).astype(str).values
                if bad.any():
                    ok = False
                    i = int(np.argmax(bad))
                    print(f"  diff[{name}.{c}] row {i}: spark={a[i]!r} duck={b[i]!r}")
                    break
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name} ({len(got)} vs {len(exp)} rows): {sql[:120]}")
    print(f"== fuzz: {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
