#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <outDir> <sfDir>
  <outDir>  output of `sbt "runMain graft.Verify <sfDir> <outDir>"`
            (one parquet dir per query + oracle_sql.json)
  <sfDir>   the testdata dir the queries ran against

For each query: run the oracle SQL in DuckDB over the sf tables, load the
Spark parquet, sort columns by name, compare row count, schema-ish, and
values (exact string compare after normalization).
"""
import json, sys, glob, os, atexit, shutil
# numpy/pandas are imported UP FRONT, not lazily inside the compare loop:
# duckdb's fetch paths import numpy on demand, and after a memory-heavy
# oracle the C-extension mmap can fail, surfacing as a bogus "importing
# numpy from its source directory" ImportError (observed on dd13 at sf10)
import numpy  # noqa: F401
import pandas as pd
import duckdb

outDir, sfDir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# Bound the oracle's appetite: an up-scale recursive/quadratic oracle can
# otherwise eat the whole box (c02 at sf1 peaked at 89 GB RSS). DuckDB
# spills to disk past the cap or fails the ONE query — either way the
# rest of the gate survives. Override via GRAFT_DUCKDB_MEM.
con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '24GB')}'")
# per-process spill dir: parallel compare_chunked workers otherwise share
# one temp_directory and clobber each other's spill files mid-read
# (observed: c03 at sf1 "Could not read enough bytes from
# duckdb_temp_storage-2.tmp" while a sibling worker spilled)
# GRAFT_SPILL_DIR lets an outer driver own (and clean) the spill dir —
# a `timeout -k`-killed DuckDB leaves its temp storage behind, and two
# orphaned heavy spills filled this box's disk
spill_dir = os.environ.get("GRAFT_SPILL_DIR", f"/tmp/duckdb_spill_{os.getpid()}")
con.execute("SET temp_directory='%s'" % spill_dir)
if "GRAFT_SPILL_DIR" not in os.environ:
    # default (per-PID) dir is OURS to clean: a timeout-killed or OOM'd
    # run otherwise orphans a uniquely-named spill dir every invocation —
    # the exact disk-fill mode the comment above reports. atexit covers
    # normal/exception exits; the stale sweep covers SIGKILL'd siblings.
    # The sweep only touches dirs carrying OUR ownership marker (ADVICE
    # r15): a dead-PID name match alone could be an outer driver's
    # GRAFT_SPILL_DIR that merely resembles the default naming.
    MARKER = ".owned-by-compare"
    os.makedirs(spill_dir, exist_ok=True)
    open(os.path.join(spill_dir, MARKER), "w").close()
    atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
    for d in glob.glob("/tmp/duckdb_spill_*"):
        pid = d.rsplit("_", 1)[-1]
        if (pid.isdigit() and not os.path.exists(f"/proc/{pid}")
                and os.path.exists(os.path.join(d, MARKER))):
            shutil.rmtree(d, ignore_errors=True)
# GRAFT_DUCKDB_THREADS: cap DuckDB's parallelism so gate workers can
# share the box with a concurrent Spark run (default: all cores)
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
# Scaled rehearsal dirs offset every key by replica*2^39 (ScaleUp), and
# DuckDB's perfect-hash aggregate sizes an ARRAY by the group key's
# min..max RANGE — a GROUP BY doc_id at sf1 then tries to allocate a
# PiB-scale vector and aborts (observed: dd16 "Cannot resize vector to
# 15579.5 PiB"). Disable it; the classic hash aggregate is range-blind.
con.execute("SET perfect_ht_threshold=0")
for p in glob.glob(f"{sfDir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata ships single parquet FILES; Spark writers (ScaleUp's
    # scaled dirs) produce DIRECTORIES of part files — accept both
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outDir}/oracle_sql.json"))
# GRAFT_COMPARE_ONLY=<name>[,<name>...]: run just those queries — the
# unit an outer driver wraps in `timeout` for process-level isolation of
# heavy up-scale oracles (thread-level interrupt cannot reclaim DuckDB's
# memory; a killed subprocess can).
only = os.environ.get("GRAFT_COMPARE_ONLY")
if only:
    keep = {x.strip() for x in only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = []
# Per-oracle time budget (seconds) for up-scale runs: a quadratic oracle
# (dd02/ss02 class) that is fine at sf0.01 can be hours in DuckDB at sf1.
# 0 = no budget (the driver-parity default).
budget = float(os.environ.get("GRAFT_COMPARE_TIMEOUT", "0"))

def run_oracle(sql):
    if budget <= 0:
        return con.execute(sql).fetchdf()
    import threading
    box = {}
    def go():
        try:
            box["df"] = con.execute(sql).fetchdf()
        except Exception as e:
            box["err"] = e
    t = threading.Thread(target=go, daemon=True)
    t.start()
    t.join(budget)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        raise TimeoutError(f"oracle exceeded {budget:.0f}s budget")
    if "err" in box:
        raise box["err"]
    return box["df"]

for name, sql in sorted(oracle.items()):
    spark_dir = f"{outDir}/{name}.parquet"
    if not os.path.isdir(spark_dir):
        spark_dir = f"{outDir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "missing spark output")); continue
    try:
        odf = run_oracle(sql)
    except TimeoutError as e:
        fails.append((name, f"oracle timeout: {e}")); continue
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    sdf = con.execute(
        f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        fails.append((name, f"cols differ: oracle={ocols} spark={scols}"))
        continue
    o, s = odf[ocols], sdf[scols]
    if len(o) != len(s):
        fails.append((name, f"rowcount oracle={len(o)} spark={len(s)}"))
        continue
    # value compare: stringify with repr-ish normalization
    def norm(df):
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(lambda v: None if v is None or (isinstance(v, float) and pd.isna(v)) else v)
        return [tuple(str(v) for v in row) for row in out.itertuples(index=False)]
    no, ns = norm(o), norm(s)
    bad = [i for i, (a, b) in enumerate(zip(no, ns)) if a != b]
    if bad:
        i = bad[0]
        fails.append((name, f"{len(bad)} rows differ; first at {i}: oracle={no[i]} spark={ns[i]}"))
    else:
        print(f"OK   {name}  ({len(o)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
