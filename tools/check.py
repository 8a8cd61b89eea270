#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
sorts columns by name, and compares values. Prints a per-query PASS/FAIL
plus first diffs. This is repo tooling only (driver-side python env), not
part of the engine.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pq.read_table(files).to_pandas()
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"columns spark={list(got.columns)} oracle={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows spark={len(got)} oracle={len(exp)}")
        else:
            for c in got.columns:
                a, b = got[c].values, exp[c].values
                if got[c].dtype != exp[c].dtype:
                    problems.append(f"dtype[{c}] spark={got[c].dtype} oracle={exp[c].dtype}")
                try:
                    if got[c].dtype.kind == 'f':
                        bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True))
                    else:
                        bad = ~(pd.Series(a).astype(str).values == pd.Series(b).astype(str).values)
                    if bad.any():
                        i = int(np.argmax(bad))
                        problems.append(f"value[{c}] row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(bad.sum())} diffs)")
                except Exception as e:
                    problems.append(f"cmp[{c}]: {e}")
        if problems:
            print(f"FAIL {name} ({len(got)} rows): " + "; ".join(problems[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
