#!/usr/bin/env python3
"""Baseline tracker: time every oracle SQL in DuckDB over the same parquet
the Spark bench reads, and emit per-query Spark/DuckDB ratios.

The reference publishes no performance numbers (BASELINE.md), so the only
reproducible baseline is the oracle engine itself executing the identical
semantics on identical data. Run after a bench:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      2>&1 | grep '"metric"' | sed 's/^\[info\] //' > /tmp/bench.json
  python3 tools/bench_oracle.py /root/testdata/sf0.1 /tmp/verify_sf001 \
      /tmp/bench.json BENCH_ORACLE.json

Per-query timing is min-of-2 (same convention as graft.Bench). Queries whose
oracle reads fixed sample files rather than the sf dir (FIXED_INPUT) are timed
too but flagged `fixed_input` since they don't scale with sf.
"""
import json, sys, time

import duckdb

# queries reading the fixed reference sample, not the sf dir. The
# CANONICAL set lives in SparkEntry.fixedInputQueries and arrives via the
# bench JSON's "fixed_input" field (r13 ADVICE: one source, not three
# hardcoded copies); this literal is only the fallback for pre-r14 bench
# artifacts that lack the field.
FIXED_INPUT_FALLBACK = {"chess_e2e", "chess_silver", "chess_gold",
                        "chess_dim_openings"}

sfdir, oracledir = sys.argv[1], sys.argv[2]
# argv[3] may be a comma-separated list of bench JSONs from REPEATED Bench
# runs; per-query spark time = min across runs (symmetric with DuckDB's
# min-of-N below — both engines get their best observation, which is the
# standard way to suppress host noise)
bench_path = sys.argv[3] if len(sys.argv) > 3 else None
out_path = sys.argv[4] if len(sys.argv) > 4 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{oracledir}/oracle_sql.json"))
bench = {}
FIXED_INPUT = None
if bench_path:
    for bp in bench_path.split(","):
        b = json.load(open(bp))
        for q, t in b.get("queries", {}).items():
            bench[q] = min(bench[q], t) if q in bench else t
        if "fixed_input" in b:
            FIXED_INPUT = set(b["fixed_input"]) | (FIXED_INPUT or set())
if FIXED_INPUT is None:
    FIXED_INPUT = FIXED_INPUT_FALLBACK

rows = []
total_duck = 0.0
for name, sql in sorted(oracle.items()):
    times = []
    err = None
    for _ in range(3):
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
        except Exception as e:
            err = str(e).splitlines()[0]
            print(f"ERR  {name}: {e}")
            break
        times.append(time.perf_counter() - t0)
    if err is not None:
        # record the failure instead of silently dropping the query from
        # rows/totals — an errored oracle must be visible in the output
        rows.append({"query": name, "duckdb_sec": None, "spark_sec":
                     bench.get(name), "ratio": None, "err": err,
                     "fixed_input": name in FIXED_INPUT})
        continue
    duck = min(times)
    total_duck += duck
    spark = bench.get(name)
    rows.append({
        "query": name,
        "duckdb_sec": round(duck, 4),
        "spark_sec": round(spark, 4) if spark is not None else None,
        "ratio": round(spark / duck, 2)
        if spark is not None and duck > 0 else None,
        "fixed_input": name in FIXED_INPUT,
    })

scaled = [r for r in rows if r["spark_sec"] is not None
          and r["duckdb_sec"] is not None and not r["fixed_input"]]
total_spark = sum(r["spark_sec"] for r in scaled)
total_duck_scaled = sum(r["duckdb_sec"] for r in scaled)
# decomposition: sub-0.4s Spark queries measure the fixed per-job floor
# (job submission + stage scheduling), which DuckDB's in-process execution
# does not pay and which amortizes away as data scales; the heavy subset is
# where plan quality actually shows
heavy = [r for r in scaled if r["spark_sec"] >= 0.4]
light = [r for r in scaled if r["spark_sec"] < 0.4]
def _ratio(rs):
    sd = sum(r["duckdb_sec"] for r in rs)
    return round(sum(r["spark_sec"] for r in rs) / sd, 2) if sd > 0 else None
summary = {
    "sf_dir": sfdir,
    "queries": rows,
    "benched_total_spark_sec": round(total_spark, 3),
    "benched_total_duckdb_sec": round(total_duck_scaled, 3),
    "overall_ratio": round(total_spark / total_duck_scaled, 2)
    if total_duck_scaled > 0 else None,
    "heavy_subset": {"n": len(heavy), "threshold_spark_sec": 0.4,
                     "ratio": _ratio(heavy)},
    "floor_subset": {"n": len(light), "spark_sec": round(
        sum(r["spark_sec"] for r in light), 2), "ratio": _ratio(light),
        "note": "dominated by Spark's fixed ~0.1-0.3s per-job floor; "
                "inverts as data scales"},
    "timing": "min-of-3 DuckDB; min over min-of-2 Bench runs for Spark",
}

for r in sorted(scaled, key=lambda r: -(r["ratio"] or 0))[:15]:
    print(f'{r["query"]:28s} spark {r["spark_sec"]:7.3f}  duck {r["duckdb_sec"]:7.3f}  ratio {r["ratio"]}')
print(f'\nTOTAL (benched, sf-scaled)     spark {total_spark:7.3f}  duck {total_duck_scaled:7.3f}  '
      f'ratio {summary["overall_ratio"]}')

if out_path:
    json.dump(summary, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")
