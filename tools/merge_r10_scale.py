#!/usr/bin/env python3
"""One-shot round-10 evidence refresh for BENCH_SCALE_X1000.json.

Folds the 2026-08-15 same-day re-measurement campaign into the scale
evidence file so it agrees with the in-code audits:
  - weak-tail rows (j1_a1, q13, q3, j4) get today's paired numbers
  - heavy-board rows (a6, j1_star, text_edit_distance) get today's pairs
  - the ten dedup 'not run' rows become recorded DNF verdicts from
    tools/duck_batch.py --max-temp-size (/tmp/duck_x1000_dnf.json)
  - summary/still_weak/notes updated to the round-10 state
Spark numbers: graft.TimeOne min-of-2 (text_edit_distance: single cold
smoke), noop sink, 32 cpus, 24g driver. DuckDB: fresh process per rep,
min-of-2 (DNF batch: 1 rep, 600 s timeout, 42GiB spill cap, count+hash
wrap).
"""
import json
import sys

SCALE = "BENCH_SCALE_X1000.json"

# (spark_sec, duck_sec, ratio, note) — all measured 2026-08-15, same host,
# spark column then duck column, nothing else running
WEAK = {
    "j1_a1_star_rollup": (4.104, 3.357, 1.22,
        "r9 broadcast-probe plan reproduces its ratio on the slower r10 host"),
    "q13_custdist": (4.579, 2.795, 1.64,
        "r9 structural single-scan plan; r10 replaced the leaked persist "
        "with a bounded collect (same plan shape)"),
    "q3_shipping_priority": (4.230, 1.931, 2.19,
        "floor-audited r10: three re-plans measured and rejected (semi-co "
        "5.45 s, shuffle-hash 14.2 s, pre-agg 72.7 s vs 4.92 s); Spark's "
        "own filtered 3-col scan floor is 2.0 s and the distributed c-o "
        "build 1.2 s while DuckDB runs the WHOLE query in 1.93 s - the "
        "residual is scan-engine speed, not a missing rewrite"),
    "j4_roleplay_join": (29.725, 10.491, 2.83,
        "r10 packed-long exchange plan ADOPTED (was 48.1 s same day, 3.78x "
        "r8): dims probed before the wire, each side ships orderkey<<5|"
        "nationkey. Two-exchange floor measured same day: 16.1 s (lineitem "
        "2-col) + 4.0 s (orders 2-col) = 20.1 s with zero join/agg work - "
        "1.92x DuckDB's zero-exchange single-node pipeline before any join "
        "runs; the packed plan pays 1.45x the pure-exchange floor. "
        "Bucketed/co-located layout removes the exchange entirely at "
        "cluster scale"),
}

HEAVY = {
    "a6_sketch_agg": (63.233, 130.5, 0.48,
        "same-day r10 pair flips the ratio: DuckDB's exact median spills "
        "600M doubles and degraded to 130.5/166.8 s reps on today's host "
        "while Spark's value-count pre-aggregate held at 63 s (r9: 35.9 vs "
        "25.8 = 1.39x on a faster day; plan unchanged)"),
    "j1_star_join": (4.056, 11.913, 0.34,
        "r9 join elimination measured paired for the first time: optimized "
        "plan is scan->project, zero exchanges; cost tracks projection "
        "width (8-col 4.66 s vs 2-col 1.68 s vs 2.2 s bare 2-col scan "
        "floor) - pure output materialization, was 3.31x as a physical "
        "join"),
    "text_edit_distance": (272.6, None, None,
        "r9 hist_l1 histogram reject + prefix/suffix strip measured: "
        "272.6 s cold smoke (was 898.7 s r8); DuckDB did not finish in "
        "700 s the same day (fresh process, count+hash wrap)"),
}


def main():
    scale = json.load(open(SCALE))
    dnf = json.load(open("/tmp/duck_x1000_dnf.json"))["queries"]

    for row in scale["queries"]:
        q = row["query"]
        if q in WEAK:
            s, d, r, note = WEAK[q]
            row.update({"spark_x1000": s, "duck_x1000": d, "ratio_x1000": r,
                        "note": note})

    hb = scale["heavy_board"]
    by_name = {r["query"]: r for r in hb["queries"]}
    for q, (s, d, r, note) in HEAVY.items():
        row = by_name.setdefault(q, {"query": q})
        row.update({"spark_x1000": s, "duck_x1000": d, "note": note})
        if r is not None:
            row["ratio_x1000"] = r
        else:
            row["duck_status"] = "timeout>700s"
        if q == "j1_star_join":
            row["duck_eval"] = "count+row-hash wrap (large output)"
        if q == "text_edit_distance":
            row["duck_eval"] = "count+row-hash wrap"
            row["spark_eval"] = "single cold smoke pass"
    # the ten formerly-'not run' dedup oracles: recorded DNF verdicts
    for q, res in dnf.items():
        row = by_name.get(q)
        if row is None:
            continue
        if res.get("min") is not None:
            row.update({"duck_x1000": res["min"],
                        "ratio_x1000": round(row["spark_x1000"] / res["min"], 2)})
            row.pop("duck_status", None)
        elif res.get("timeout"):
            row["duck_status"] = "DNF: timeout>600s"
        else:
            err = res.get("err", "unknown")
            kind = ("spill-exhausted-disk (61 GB free)"
                    if "space" in err.lower()
                    else "oom" if "emory" in err
                    else "worker died (likely OOM-killed)")
            row["duck_status"] = f"DNF: {kind} ({err.strip()[:140]})"
        row["duck_eval"] = ("count+row-hash wrap; fresh process, "
                            "parent-owned spill dir removed per rep")
    hb["queries"] = sorted(by_name.values(), key=lambda r: r["query"])
    paired = [r for r in hb["queries"]
              if r.get("duck_x1000") and r.get("spark_x1000")]
    hb["n_paired"] = len(paired)
    hb["n_spark"] = len(hb["queries"])
    hb["spark_total_paired"] = round(sum(r["spark_x1000"] for r in paired), 2)
    hb["duck_total_paired"] = round(sum(r["duck_x1000"] for r in paired), 2)
    hb["overall_ratio_paired"] = round(
        hb["spark_total_paired"] / hb["duck_total_paired"], 2)
    hb["notes"] = (
        "r10 (2026-08-15, all pairs same-day/same-host, Spark column then "
        "DuckDB column, nothing else running; host runs both engines "
        "~25-75% slower than the r8/r9 sweeps, so only same-day ratios are "
        "comparable): every formerly-'not run' dedup oracle now has a "
        "recorded verdict (duck_batch.py, 600 s timeout, fresh process "
        "with parent-owned spill cleanup per rep): seven exhaust the "
        "61 GB of free spill disk, dedup_clusters_star times out, "
        "dedup_keep's worker dies, and dedup_dupngram COMPLETES at "
        "267.9 s vs Spark 37.6 s (0.14x). A documented DNF is scale "
        "evidence: the oracle's all-pairs materialization cannot run "
        "where Spark's banded/blocked plans complete in 9-64 s on the "
        "same data. (The --max-temp-size cap was passed but DuckDB did "
        "not enforce it before hitting the disk; verdicts are recorded "
        "as observed.) "
        "text_edit_distance: Spark 272.6 s cold vs DuckDB >700 s. Earlier "
        "r8 notes on the ann family and shared-hub conventions remain in "
        "git history (r8 file version).")

    summ = scale["summary"]
    # recompute weak-tail totals from the refreshed rows
    qs = scale["queries"]
    summ["spark_total_x1000"] = round(sum(r["spark_x1000"] for r in qs), 2)
    summ["duck_total_x1000"] = round(sum(r["duck_x1000"] for r in qs), 2)
    summ["overall_ratio_x1000"] = round(
        summ["spark_total_x1000"] / summ["duck_total_x1000"], 2)
    summ["still_weak_x1000"] = ["j4_roleplay_join", "q3_shipping_priority"]
    summ["notes"] = (
        "r10 refresh: j1_a1/q13/q3/j4 re-paired same-day (2026-08-15). "
        "j4 runs the packed-long exchange plan (29.7 s, was 48.1 s same "
        "day / 38.6 s on the faster r8 host) - 2.83x with a measured "
        "20.1 s two-exchange floor (1.92x DuckDB alone, before any join "
        "work); q3 is 2.19x with a floor decomposition showing DuckDB "
        "finishes the whole query at Spark's own scan floor. Both carry "
        "in-source audit notes with every rejected alternative measured. "
        "j1_star_join and a6_sketch_agg moved to the heavy board as "
        "Spark WINS (0.34x / 0.48x). Other rows are r8 numbers on the "
        "faster r8 host; their plans are unchanged.")
    json.dump(scale, open(SCALE, "w"), indent=1)
    print("ok: updated", SCALE)
    print("still_weak:", summ["still_weak_x1000"])
    print("heavy paired:", hb["n_paired"], "ratio", hb["overall_ratio_paired"])


if __name__ == "__main__":
    sys.exit(main())
