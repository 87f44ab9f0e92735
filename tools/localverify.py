#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/localverify.py <sfDir> <outDir>
  (run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`)

Env knobs for large-SF runs:
  LOCALVERIFY_SKIP=q_a,q_b  skip these queries (reported as [skipped],
                            not FAIL) — for oracles infeasible in DuckDB
                            at the target SF; document each exclusion
  LOCALVERIFY_ONLY=q_a,q_b  compare only these queries
  LOCALVERIFY_TIMES=1       print per-query oracle+compare seconds

For each query output parquet in <outDir>: run the matching oracle SQL
from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet), sort columns
by name, sort rows, and compare. Reports exact mismatches and, for float
columns, the max abs deviation so determinism bugs are visible.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive ns
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(filter(None, os.environ.get("LOCALVERIFY_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("LOCALVERIFY_ONLY", "").split(",")))
    # honor the Verify-side filter too: a dump produced under
    # SPARK_GRAFT_ONLY is missing every other query BY DESIGN — those are
    # skips, not "crashed in Verify" failures (r13 hygiene)
    only |= set(filter(None, os.environ.get("SPARK_GRAFT_ONLY", "").split(",")))
    times = os.environ.get("LOCALVERIFY_TIMES") == "1"
    n_pass = n_fail = n_noora = n_skip = 0
    seen = set()
    import time as _time
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if not os.path.isdir(full):
            continue
        seen.add(d)
        if d in skip or (only and d not in only):
            n_skip += 1
            if d in skip:
                print(f"  [skipped] {d}")
            continue
        t0 = _time.monotonic()
        got = pd.read_parquet(full)
        if d not in oracles:
            n_noora += 1
            print(f"  [rows-only] {d}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracles[d]).df()
        except Exception as e:
            n_fail += 1
            print(f"✗ {d}: ORACLE SQL ERROR: {str(e)[:200]}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"✗ {d}: COLUMNS spark={list(g.columns)} oracle={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"✗ {d}: ROWS spark={len(g)} oracle={len(e)}")
            continue
        ok = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                # int-vs-float dtype divergence is exactly the failure mode the
                # driver's hash gate catches (HUGEINT→float64 vs BIGINT): flag it.
                if pd.api.types.is_float_dtype(gv) != pd.api.types.is_float_dtype(ev):
                    ok = False
                    print(f"✗ {d}.{c}: DTYPE spark={gv.dtype} oracle={ev.dtype}")
                    continue
                gv2 = gv.astype(float).to_numpy(); ev2 = ev.astype(float).to_numpy()
                one_nan = np.isnan(gv2) ^ np.isnan(ev2)
                both_nan = np.isnan(gv2) & np.isnan(ev2)
                diff = np.where(both_nan, 0.0, np.abs(gv2 - ev2))
                if one_nan.any():
                    ok = False
                    print(f"✗ {d}.{c}: one-sided NaN/null in {int(one_nan.sum())} rows")
                elif np.nanmax(diff, initial=0.0) > 0:
                    ok = False
                    print(f"✗ {d}.{c}: float max|Δ|={np.nanmax(diff):.3e} "
                          f"(n≠ {int((diff > 0).sum())})")
            else:
                try:
                    neq = ~(gv.astype(str).eq(ev.astype(str)))
                except Exception:
                    neq = pd.Series([True] * len(gv))
                if neq.any():
                    ok = False
                    i = int(neq.idxmax())
                    print(f"✗ {d}.{c}: {int(neq.sum())} diffs; first at row {i}: "
                          f"spark={gv.iloc[i]!r} oracle={ev.iloc[i]!r}")
        if ok:
            n_pass += 1
            el = f" [{_time.monotonic() - t0:.1f}s]" if times else ""
            print(f"✓ {d} ({len(g)} rows){el}", flush=True)
        else:
            n_fail += 1
    # A query that crashed in Verify leaves no output dir — count it as FAIL
    # instead of silently vanishing from the gate.
    for d in sorted(set(oracles) - seen):
        if d in skip or (only and d not in only):
            continue
        n_fail += 1
        print(f"✗ {d}: NO OUTPUT (query crashed in Verify?)")
    print(f"\nPASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noora} SKIP={n_skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
