#!/usr/bin/env python3
"""Dev harness approximating the driver's correctness gate: run Verify's
parquet dumps against DuckDB executions of oracle_sql.json over the same
scale-factor directory, compare schema + canonicalized rows.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name); continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fails.append(name); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
        fails.append(name); continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
        fails.append(name); continue
    # canonicalize: stringify and sort rows
    def canon(df):
        d = df.copy()
        for c in d.columns:
            if d[c].dtype == object or str(d[c].dtype).startswith("datetime"):
                d[c] = d[c].astype(str)
            elif d[c].dtype == float:
                d[c] = d[c].map(lambda v: "null" if pd.isna(v) else repr(float(v)))
            else:
                d[c] = d[c].astype(str)
        return sorted(map(tuple, d.itertuples(index=False, name=None)))
    ce, cg = canon(exp), canon(got)
    if ce != cg:
        bad = [(a, b) for a, b in zip(ce, cg) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}")
        fails.append(name); continue
    print(f"OK   {name} ({len(exp)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
