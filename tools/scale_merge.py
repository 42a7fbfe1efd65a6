#!/usr/bin/env python3
"""Assemble the x1000 heavy-board pairing (Spark steady min-of-2 vs DuckDB
min-of-2) into BENCH_SCALE_X1000.json's `heavy_board` section.

Inputs are the raw measurement artifacts, passed explicitly so the merge is
reproducible:

  python3 tools/scale_merge.py \
      --spark-log /tmp/steady_x1000_r8.log /tmp/steady_x1000_r8d.log \
      --duck-log /tmp/duck_x1000_r8.log /tmp/duck_x1000_r8c.log \
      --duck-wrapped /tmp/duck_x1000_wrap.json \
      --out BENCH_SCALE_X1000.json

Spark logs contribute `TIME <name> <sec> s` lines; duck logs contribute the
one-JSON-object-per-line stream duck_batch.py prints (later files win, so a
wrapped re-run of a fetchall-killed query replaces the artifact entry).
Queries with a Spark number but no finished DuckDB number keep a status
string ("timeout"/"error") instead of a ratio — an unfinished baseline is
reported, not imputed.
"""
import argparse
import json
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spark-log", nargs="+", required=True)
    ap.add_argument("--duck-log", nargs="+", default=[])
    ap.add_argument("--duck-wrapped", nargs="*", default=[])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = {}
    for path in args.spark_log:
        for line in open(path):
            m = re.search(r"TIME (\S+)\s+([0-9.]+) s \(min-of-", line)
            if m and m.group(1) != "__pass_total__":
                spark[m.group(1)] = float(m.group(2))

    duck = {}
    for path in args.duck_log:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            d = json.loads(line)
            duck[d["query"]] = d
    wrapped = set()
    for path in args.duck_wrapped:
        payload = json.load(open(path))
        for name, d in payload["queries"].items():
            if d.get("min") is not None:
                duck[name] = d
                wrapped.add(name)

    rows = []
    for name in sorted(spark):
        row = {"query": name, "spark_x1000": round(spark[name], 3)}
        d = duck.get(name)
        if d and d.get("min") is not None:
            row["duck_x1000"] = d["min"]
            row["ratio_x1000"] = round(spark[name] / d["min"], 2)
            if name in wrapped:
                row["duck_eval"] = "count+row-hash wrap (large output)"
        elif d and d.get("timeout"):
            row["duck_x1000"] = None
            row["duck_status"] = "timeout>%ds" % int(d["timeout"])
        elif d:
            row["duck_x1000"] = None
            row["duck_status"] = "error: " + d.get("err", "?")[:120]
        else:
            row["duck_x1000"] = None
            row["duck_status"] = "not run"
        rows.append(row)

    out = json.load(open(args.out))
    finished = [r for r in rows if r.get("ratio_x1000") is not None]
    out["heavy_board"] = {
        "spark_convention": "graft.TimeOne min-of-2 after a warm pass, full "
            "evaluation through the noop sink, 24g driver, local[32]",
        "duck_convention": "min-of-2, fresh duckdb process per rep; "
            "large-output queries evaluated via count+sum(row hash) wrap "
            "(the noop-sink analog; fetchall on a 600M-row result measures "
            "the Python client, not the query)",
        "n_spark": len(rows),
        "n_paired": len(finished),
        "spark_total_paired": round(sum(r["spark_x1000"] for r in finished), 2),
        "duck_total_paired": round(sum(r["duck_x1000"] for r in finished), 2),
        "overall_ratio_paired": round(
            sum(r["spark_x1000"] for r in finished)
            / sum(r["duck_x1000"] for r in finished), 2) if finished else None,
        "queries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("paired %d/%d  spark %.1f s  duck %.1f s  ratio %s" % (
        len(finished), len(rows),
        out["heavy_board"]["spark_total_paired"],
        out["heavy_board"]["duck_total_paired"],
        out["heavy_board"]["overall_ratio_paired"]))


if __name__ == "__main__":
    main()
