#!/usr/bin/env bash
# Process-isolated DuckDB compare for up-scale oracle runs: one
# compare.py subprocess per query under coreutils `timeout`, so a
# memory-hungry or super-linear oracle (c02's recursive-CTE components,
# the documented dd02/ss02 quadratic baselines) can be killed and
# RECORDED without taking the rest of the gate down with it.
#
# usage: compare_chunked.sh <outDir> <sfDir> <logFile> [budgetSec]
set -u
outDir=$1; sfDir=$2; log=$3; budget=${4:-600}
: > "$log"
names=$(python3 -c "
import json,sys
print('\n'.join(sorted(json.load(open('$outDir/oracle_sql.json')))))")
for n in $names; do
  start=$(date +%s)
  if GRAFT_COMPARE_ONLY="$n" timeout -k 30 "$budget" \
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
done
echo "DONE" >> "$log"
