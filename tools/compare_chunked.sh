#!/usr/bin/env bash
# Process-isolated DuckDB compare for up-scale oracle runs: one
# compare.py subprocess per query under coreutils `timeout`, so a
# memory-hungry or super-linear oracle (c02's recursive-CTE components,
# the documented dd02/ss02 quadratic baselines) can be killed and
# RECORDED without taking the rest of the gate down with it.
#
# usage: compare_chunked.sh <outDir> <sfDir> <logFile> [budgetSec] [mod rem]
#   mod/rem: run only names with index % mod == rem — split the gate
#   across parallel workers (each subprocess is an independent DuckDB).
set -u
outDir=$1; sfDir=$2; log=$3; budget=${4:-600}
mod=${5:-1}; rem=${6:-0}
: > "$log"
# the oracle json carries each query under both `name` and
# `name.parquet` (driver compat); the pair compares identically — run one
names=$(python3 -c "
import json,sys
ks = sorted(json.load(open('$outDir/oracle_sql.json')))
ks = [k for k in ks if not k.endswith('.parquet')]
print('\n'.join(k for i, k in enumerate(ks) if i % $mod == $rem))")
spill="/tmp/graft_spill_$$"
for n in $names; do
  start=$(date +%s)
  if GRAFT_COMPARE_ONLY="$n" GRAFT_SPILL_DIR="$spill" timeout -k 30 "$budget" \
      python3 -u tools/compare.py "$outDir" "$sfDir" >> "$log" 2>&1; then
    :
  else
    rc=$?
    if [ "$rc" -ge 124 ]; then
      echo "TIMEOUT $n  (budget ${budget}s)" >> "$log"
    else
      echo "FAILRC  $n  (rc=$rc)" >> "$log"
    fi
  fi
  end=$(date +%s)
  echo "t $n $((end-start))s" >> "$log.times"
  # reclaim spill left by a killed/oom'd DuckDB before the next query
  rm -rf "$spill"
done
echo "DONE" >> "$log"
