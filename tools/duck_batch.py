#!/usr/bin/env python3
"""DuckDB side of the x-scale pairing: run each named oracle query in a
FRESH duckdb process (isolated buffer pool — the shared-session OOMs of
the x100 run never arise), min-of-N wall time, with a per-query timeout so
one quadratic query cannot stall the batch (timed-out queries record
min=None and timeout=True — read as "DuckDB did not finish in <cap> s").

  python3 tools/duck_batch.py <sfDir> <oracle_sql.json> <out.json> \
      [--reps 2] [--timeout 1200] [--queries a,b,c]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

WORKER = r"""
import duckdb, json, os, sys, time
sfdir, tmpdir, sql = sys.argv[1], sys.argv[2], sys.stdin.read()
opts = sys.argv[3:]
# --wrap: forces full row evaluation without materializing the result into
# Python — the DuckDB analog of the Spark side's noop sink (fetchall() on a
# 600M-row result is a measurement artifact, not query cost). sum(hash(t))
# evaluates every output column of every row and reduces to one value.
if "wrap" in opts:
    sql = "SELECT count(*), sum(hash(t)) FROM (" + sql + ") t"
# spill into a caller-owned dir: a timed-out worker is SIGKILLed and cannot
# clean its own temp storage, and leaked spill silently starves every LATER
# query of disk (observed: a 13 GB leak turned a finishable run into a
# spurious out-of-disk failure). The parent removes the dir after each rep.
cfg = {"temp_directory": tmpdir}
# maxtemp=<size>: bound the spill so a quadratic query records a clean
# "temp directory size limit" error (a DNF verdict) instead of running the
# HOST out of disk — the disk-full failure mode poisons every later rep.
for o in opts:
    if o.startswith("maxtemp="):
        cfg["max_temp_directory_size"] = o.split("=", 1)[1]
con = duckdb.connect(config=cfg)
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sfdir, f"{t}.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
t0 = time.perf_counter()
con.sql(sql).fetchall()
print(json.dumps({"sec": time.perf_counter() - t0}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sfdir")
    ap.add_argument("oracle")
    ap.add_argument("out")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=1200.0)
    ap.add_argument("--queries", default="")
    ap.add_argument("--wrap", action="store_true",
                    help="evaluate via count+row-hash instead of fetchall "
                         "(for large-output queries)")
    ap.add_argument("--max-temp-size", default="",
                    help="cap DuckDB spill (e.g. 40GiB); over-cap queries "
                         "fail cleanly with a temp-limit error (DNF)")
    args = ap.parse_args()

    oracle = json.load(open(args.oracle))
    names = [q for q in args.queries.split(",") if q] or sorted(oracle)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER)
        worker = f.name

    results = {}
    for name in names:
        if name not in oracle:
            results[name] = {"err": "no oracle"}
            continue
        times, err, timed_out = [], None, False
        for _ in range(args.reps):
            tmpdir = tempfile.mkdtemp(prefix="duckspill-")
            try:
                opts = (["wrap"] if args.wrap else []) + (
                    ["maxtemp=" + args.max_temp_size] if args.max_temp_size
                    else [])
                p = subprocess.run(
                    [sys.executable, worker, args.sfdir, tmpdir] + opts,
                    input=oracle[name],
                    capture_output=True, text=True, timeout=args.timeout)
            except subprocess.TimeoutExpired:
                timed_out = True
                break
            finally:
                shutil.rmtree(tmpdir, ignore_errors=True)
            if p.returncode != 0:
                err = (p.stderr or "worker failed").strip().splitlines()[-1][:200]
                break
            times.append(json.loads(p.stdout)["sec"])
        results[name] = {
            "min": round(min(times), 3) if times else None,
            "times": [round(t, 2) for t in times],
            **({"err": err} if err else {}),
            **({"timeout": args.timeout} if timed_out else {}),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)

    os.unlink(worker)
    with open(args.out, "w") as f:
        json.dump({"sfdir": args.sfdir, "reps": args.reps,
                   "convention": "min-of-%d, fresh duckdb process per rep" % args.reps
                   + (", count+row-hash evaluation (noop-sink analog)"
                      if args.wrap else ", fetchall"),
                   "queries": results}, f, indent=1)


if __name__ == "__main__":
    main()
