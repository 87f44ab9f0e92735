#!/usr/bin/env python3
"""Promote a bench_detail.json sweep into bench_baseline.json.

Canary-normalized minimum fold (the r12 guard discipline): the old
baseline's per-query minimums are first rescaled into the NEW sweep's
host frame by the canary ratio (new env_sql_ms / baseline env_sql_ms,
clamped to [0.5, 3]), THEN min-folded with the new sweep's times. This
stops the pre-r12 one-way ratchet where a lucky-JIT outlier recorded on
a fast host became an unmeetable floor on a slower one — minimums are
only ever compared within one host frame, and the published baseline
always carries the canary of the frame it is expressed in.

Usage: tools/promote_baseline.py [bench_detail.json]
Writes bench_baseline.json in the current directory.
"""
import json
import sys


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    with open(detail_path) as f:
        detail = json.load(f)
    new_canary = float(detail.get("env_sql_ms", 0) or 0)
    # failed queries are recorded as -1.0 sentinels — a negative floor
    # would flag every later successful run as regressed, so drop them
    queries = {k: float(v) for k, v in detail["queries"].items()
               if v is not None and float(v) >= 0}

    note = f"canary-normalized per-query minimums; env_sql_ms frame {new_canary}"
    try:
        with open("bench_baseline.json") as f:
            base = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        base = None
    if base and base.get("queries") and base.get("sf") == detail.get("sf"):
        old_canary = float(base.get("env_sql_ms", 0) or 0)
        scale = 1.0
        if old_canary > 0 and new_canary > 0:
            scale = min(3.0, max(0.5, new_canary / old_canary))
        for k, v in base["queries"].items():
            if v is None or float(v) < 0:
                continue
            rescaled = float(v) * scale
            if k in queries and queries[k] >= 0:
                queries[k] = min(queries[k], rescaled)
            elif k not in queries:
                # a query absent from this sweep keeps its (rescaled) floor
                queries[k] = rescaled
        note += f"; folded prior baseline (canary {old_canary}, scale {scale:.3f})"

    out = dict(detail)
    out["queries"] = queries
    out["promoted_note"] = note
    with open("bench_baseline.json", "w") as f:
        json.dump(out, f, sort_keys=True)
        f.write("\n")
    print(f"promoted {len(queries)} query minimums "
          f"(canary frame env_sql_ms={new_canary}) -> bench_baseline.json")


if __name__ == "__main__":
    main()
