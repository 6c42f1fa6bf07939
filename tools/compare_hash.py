#!/usr/bin/env python3
"""Streaming hash-compare for LARGE query results (the big-output siblings
of tools/compare.py, which pandas-materializes every row and cannot hold a
10M-row sf10 result).

For each query: run the oracle SQL in DuckDB over the sf tables, load the
Spark parquet in DuckDB, and reduce BOTH sides — inside DuckDB, streaming,
no Python row materialization — to (row_count, HUGEINT sum of a 60-bit md5
over the row's canonical string). The canonical string is the columns
sorted by name, CAST to VARCHAR by DuckDB on both sides (identical
formatting rules by construction), NULLs mapped to a sentinel, joined with
an \\x1f separator. Order-independent: the digest is a sum, so no ORDER BY
is needed on either side.

Usage: python3 tools/compare_hash.py <outDir> <sfDir> [query ...]
  <outDir>  output of `sbt "runMain graft.Verify <sfDir> <outDir>"`
  <sfDir>   the testdata dir the queries ran against
  [query]   subset to check (default: every query in oracle_sql.json)
"""
import json, sys, glob, os
import duckdb

outDir, sfDir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for p in glob.glob(f"{sfDir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

def digest_sql(row_src: str) -> str:
    cols = [r[0] for r in con.execute(f"DESCRIBE {row_src}").fetchall()]
    parts = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), '<NULL>')"
        for c in sorted(cols))
    # hex parse via UBIGINT (15 hex chars = 60 bits): DuckDB 1.0.0 rejects
    # '0x…'::HUGEINT but accepts the unsigned form; widen the SUM after
    return (f"SELECT COUNT(*) AS n, COALESCE(SUM(CAST(CAST(('0x' || "
            f"substr(md5(concat_ws(chr(31), {parts})), 1, 15)) AS UBIGINT)"
            f" AS HUGEINT)), 0) AS h FROM {row_src}")

oracle = json.load(open(f"{outDir}/oracle_sql.json"))
fails = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_dir = f"{outDir}/{name}.parquet"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: missing spark output"); fails += 1; continue
    try:
        on, oh = con.execute(digest_sql(f"({sql})")).fetchone()
        sn, sh = con.execute(
            digest_sql(f"(SELECT * FROM '{spark_dir}/*.parquet')")).fetchone()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if (on, oh) == (sn, sh):
        print(f"OK   {name}  ({on} rows, digest match)"); ok += 1
    else:
        print(f"FAIL {name}: oracle ({on} rows, {oh}) vs spark ({sn} rows, {sh})")
        fails += 1

print(f"\n{ok}/{ok + fails} queries match")
sys.exit(1 if fails else 0)
