#!/bin/bash
set -euo pipefail
cd /root/repo
L=target/r13
echo "== clean re-run: c02/c08 at sf10, fresh 48g JVM each, reps=3 (idle machine)"
for q in c02_cluster_curation c08_cluster_safe_split; do
  SPARK_GRAFT_PERF_DIAG=1 tools/perf_direct.sh target/sf10 48g reps=3 "$q" 2>&1 \
    | grep -E "min=|raw=|diag" || true
done | tee "$L/sf10_clusters_clean.log"
echo "== clean re-run: c10 at sf10, fresh 48g JVM, reps=3"
SPARK_GRAFT_PERF_DIAG=1 tools/perf_direct.sh target/sf10 48g reps=3 \
  c10_split_leakage 2>&1 | grep -E "min=|raw=|diag" | tee "$L/sf10_c10_clean.log"
echo "== DONE $(date +%H:%M:%S)"
