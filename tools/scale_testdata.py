#!/usr/bin/env python3
"""Scale a TESTDATA sf directory by an integer factor (default 10) by
key-shifted replication — the cross-SF verification harness for the
next data decade (sf0.1 -> sf1) when the driver only generates up to
sf0.1.

Replica k of every fact/dim row gets its keys shifted by k*SHIFT, so
foreign-key structure, join selectivities, and per-key distributions
are preserved exactly while the corpus grows by the factor. Notes:

- region/nation are fixed dimensions (not replicated) and every
  replica's *_nationkey still lands in them, like TPC-H at any sf.
- documents get a per-replica text suffix so near-dup structure stays
  within-replica (otherwise every doc would gain factor-1 exact dups
  and the dedup-cluster workload would change shape instead of size).
- embeddings get a tiny deterministic per-replica perturbation on the
  first component so ANN top-k has no cross-replica ties.
- SHIFT = 100_000_000 clears the 10_000_000 offset some dedup oracles
  add to doc_ids, so synthetic oracle ids never collide with real ones.

Usage: python3 tools/scale_testdata.py SRC_DIR DST_DIR [FACTOR]
"""
import sys

import duckdb

SHIFT = 100_000_000

# per-table key columns to shift (everything else passes through)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def scale(src: str, dst: str, factor: int) -> None:
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)
    # Guard (r12 postmortem): replicating an ALREADY-shifted directory
    # collides keys — replica k of a shifted id j*SHIFT+d lands on
    # (j+k)*SHIFT+d, merging distinct entities (an sf10 built as two
    # stacked x10 runs had only ~19% distinct doc_ids, which silently
    # corrupts every doc-keyed window). Always scale FROM BASE data in
    # one application (e.g. factor 100), never stack runs.
    for t, keys in KEYED.items():
        hi = con.execute(
            f"SELECT max({keys[0]}) FROM parquet_scan('{src}/{t}.parquet')"
        ).fetchone()[0]
        if hi is not None and hi + factor * SHIFT >= 2**62 or (hi or 0) >= SHIFT:
            raise SystemExit(
                f"{t}: max({keys[0]})={hi} >= SHIFT={SHIFT} — '{src}' is "
                "already key-shifted; scale from the base sf directory "
                "in ONE application instead of stacking runs")
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM parquet_scan('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{src}/{t}.parquet')"
        ).fetchall()]
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"{c} + r.k * {SHIFT} AS {c}")
            elif t == "documents" and c == "text":
                # keep near-dups within-replica; suffix is whitespace-
                # tokenized like the rest of the corpus
                exprs.append(
                    "CASE WHEN r.k = 0 THEN text "
                    "ELSE text || ' replica' || r.k END AS text")
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN r.k = 0 THEN n_chars "
                    "ELSE n_chars + 8 + CAST(floor(log10(r.k)) AS BIGINT) + 1 "
                    "END AS n_chars")
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    "list_prepend(CAST(embedding[1] + r.k * 0.0001 AS FLOAT), "
                    "embedding[2:]) AS embedding")
            else:
                exprs.append(c)
        sql = (
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM parquet_scan('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({factor})) AS k) r "
            f"ORDER BY r.k) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(sql)
        n = con.execute(
            f"SELECT count(*) FROM parquet_scan('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, factor)
