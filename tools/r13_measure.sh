#!/bin/bash
# Round-13 measurement battery (run on an otherwise-idle machine, AFTER
# sbt compile — perf_direct.sh bypasses sbt so nothing recompiles under a
# timed run). Produces the SCALING.md evidence for the sf1→sf10 second
# decade, the dd06 same-JVM-growth diagnosis, and the r12 bench-drift
# triage.
set -euo pipefail
cd /root/repo
L=target/r13
mkdir -p "$L"

echo "== sf1 cluster family, fresh 48g JVM per query, reps=3"
for q in dd06_neardup_clusters c02_cluster_curation c08_cluster_safe_split; do
  tools/perf_direct.sh target/sf1 48g reps=3 "$q" 2>&1 \
    | grep -E "min=|raw=" || true
done | tee "$L/sf1_clusters.log"

echo "== sf1 light heavy set, one 48g JVM, reps=3"
tools/perf_direct.sh target/sf1 48g reps=3 \
  t24_bpe_train t25_bpe_segment dd11_winnow dd16_neardup_admit \
  t29_sequence_pack ss17_recall_audit c10_split_leakage \
  ss18_residual_pq_adc 2>&1 | grep -E "min=|raw=" | tee "$L/sf1_light.log"

echo "== sf10 light heavy set, one 48g JVM, reps=3"
tools/perf_direct.sh target/sf10 48g reps=3 \
  t24_bpe_train t25_bpe_segment dd11_winnow dd16_neardup_admit \
  t29_sequence_pack ss17_recall_audit c10_split_leakage \
  ss18_residual_pq_adc 2>&1 | grep -E "min=|raw=" | tee "$L/sf10_light.log"

echo "== dd06 sf10 same-JVM growth diagnosis (raw order + heap + scratch)"
SPARK_GRAFT_PERF_DIAG=1 tools/perf_direct.sh target/sf10 48g reps=3 \
  dd06_neardup_clusters 2>&1 | grep -E "min=|raw=|diag" \
  | tee "$L/sf10_dd06_diag.log"

echo "== r12 bench-drift triage: same-JVM reps=5 at sf0.1"
tools/perf_direct.sh /root/testdata/sf0.1 8g reps=5 \
  ss03_lsh_ann ss04_lsh_neardup ss06_ivf_ann ss10_pq_adc ss11_pq_rerank \
  ss17_recall_audit 2>&1 | grep -E "min=|raw=" | tee "$L/sf01_drift.log"
echo "== DONE $(date +%H:%M:%S)"
