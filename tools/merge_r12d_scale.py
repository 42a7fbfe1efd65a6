#!/usr/bin/env python3
"""Refresh a2_count_distinct's x1000 row with the r12b same-session pair.

Inputs: tools/sweeps/duck_a2_r12b.json (duck_batch --wrap, min-of-2,
600 s timeout) + Spark graft.TimeOne min-of-2 = 136.411 s (same session,
warm page cache). The previous row carried 299.5 s from a visibly
throttled evening host with no same-session duck verdict.
"""
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVID = os.path.join(REPO, "BENCH_SCALE_X1000.json")
DUCK = os.path.join(REPO, "tools", "sweeps", "duck_a2_r12b.json")
SPARK = 136.411


def main():
    duck = json.load(open(DUCK))["queries"]["a2_count_distinct"]
    evid = json.load(open(EVID))
    row = next(r for r in evid["heavy_board"]["queries"]
               if r["query"] == "a2_count_distinct")
    prev = row.get("spark_x1000")
    row["spark_x1000"] = SPARK
    if duck.get("min") is not None:
        row["duck_x1000"] = duck["min"]
        row["duck_reps"] = duck["times"]
        row["ratio_x1000"] = round(SPARK / duck["min"], 2)
        row.pop("duck_status", None)
    else:
        row["duck_x1000"] = None
        row.pop("ratio_x1000", None)
        row["duck_status"] = ("DNF: timeout>600s (r12b run)"
                              if duck.get("timeout")
                              else f"DNF: {duck.get('err', 'unknown')[:120]}")
    row["duck_eval"] = ("count+row-hash wrap; fresh process; r12b "
                        "same-session pair (2026-08-16, warm page cache)")
    row["note"] = (
        f"r12b same-session re-pair: Spark steady {SPARK} s (TimeOne "
        f"min-of-2; the prior {prev} s row was a throttled-evening host "
        "with no opposing duck number — today's cold smoke alone read "
        "124.1 s). Large path unchanged since r11 (dedup-once persisted "
        "pair set); only the sf-gated small path was re-spelled this "
        "round (bitmap pair count).")

    tmp = EVID + ".tmp"
    with open(tmp, "w") as f:
        json.dump(evid, f, indent=1)
        f.write("\n")
    os.replace(tmp, EVID)
    print("a2 row refreshed:", row.get("ratio_x1000"), row.get("duck_status"))


if __name__ == "__main__":
    main()
