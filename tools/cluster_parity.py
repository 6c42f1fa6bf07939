#!/usr/bin/env python3
"""Multi-process parity check: compare two graft.Verify output dirs —
one produced under local[N] (in-process executors) and one under
local-cluster[n,c,m] (real standalone executor JVMs: cross-process
shuffle, serialized broadcast, remote block fetches) — query by query.

Any divergence here is a genuine distribution bug the single-JVM gate
cannot see: task-order-dependent floating aggregation, a non-serializable
closure silently falling back, partitioning-sensitive output, an
expression whose codegen path differs executor-side.

Digest = (row_count, sum of a 60-bit md5 over the row's canonical
string): columns sorted by name, CAST to VARCHAR by DuckDB on both sides
(identical formatting by construction), NULL -> sentinel, \\x1f-joined.
Order-independent (a sum), so no ORDER BY is needed on either side —
same scheme as tools/compare_hash.py.

Usage: python3 tools/cluster_parity.py <localDir> <clusterDir> [query ...]
"""
import json, os, sys
import duckdb

localDir, clusterDir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()


def digest(parquet_dir: str):
    src = f"(SELECT * FROM '{parquet_dir}/*.parquet')"
    cols = [r[0] for r in con.execute(f"DESCRIBE {src}").fetchall()]
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), '<NULL>')" for c in sorted(cols))
    # hex parse via UBIGINT (15 hex chars = 60 bits): this DuckDB (1.0.0)
    # rejects '0x…'::HUGEINT but accepts the unsigned form; widen the SUM
    return con.execute(
        f"SELECT COUNT(*) AS n, COALESCE(SUM(CAST(CAST(('0x' || "
        f"substr(md5(concat_ws(chr(31), {parts})), 1, 15)) AS UBIGINT) "
        f"AS HUGEINT)), 0) AS h FROM {src}").fetchone(), sorted(cols)


names = sorted(
    n[: -len(".parquet")] for n in os.listdir(localDir)
    if n.endswith(".parquet") and os.path.isdir(os.path.join(localDir, n)))
fails = ok = 0
for name in names:
    if only and name not in only:
        continue
    cdir = os.path.join(clusterDir, f"{name}.parquet")
    if not os.path.isdir(cdir):
        print(f"FAIL {name}: missing under {clusterDir}")
        fails += 1
        continue
    try:
        (ln, lh), lcols = digest(os.path.join(localDir, f"{name}.parquet"))
        (cn, ch), ccols = digest(cdir)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if lcols != ccols:
        print(f"FAIL {name}: schema {lcols} vs {ccols}")
        fails += 1
    elif (ln, lh) == (cn, ch):
        print(f"OK   {name}  ({ln} rows, digest match)")
        ok += 1
    else:
        print(f"FAIL {name}: local ({ln} rows, {lh}) vs cluster ({cn} rows, {ch})")
        fails += 1

print(f"\n{ok}/{ok + fails} queries match across execution modes")
sys.exit(1 if fails else 0)
