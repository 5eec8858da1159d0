#!/bin/bash
# Round-17 tier-artifact regen on the final binary, same boot, all three
# tiers (r15 verdict #5, r16 verdict standing + the 12.13 invariant). Skip set = r15's
# truth-tier/heavy exclusions + als_rank32_factors at x10/x100: the
# rank-32 row costs 119 s at x100 in-suite (measured, quiet) while the
# rank axis at tier scale is covered by the fresh-JVM rank probes
# (als_rank_probe_r15 / als_rank_implicit_probe_r16); it stays in the
# sf0.1 suite and the gate.
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall,als_rank32_factors
LOG=/tmp/tiers_r17
mkdir -p $LOG

retry() {
  local name=$1; shift
  for attempt in 1 2 3 4 5 6; do
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@" > $LOG/$name.attempt$attempt.log 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then echo "=== $name OK ==="; return 0; fi
    if [ $rc -eq 3 ]; then echo "=== $name REFUSED, waiting 10m ==="; sleep 600; continue; fi
    echo "=== $name FAILED rc=$rc ==="
    [ $attempt -ge 2 ] && return $rc
  done
  return 1
}

bench() {
  local sfdir=$1 out=$2 diag=$3 skip=$4
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_BENCH_SKIP=$skip \
    SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_OUT=$out SPARK_GRAFT_BENCH_DIAG=$diag \
    tools/runjvm.sh graft.Bench
}

echo "######## x10 ########"
retry x10 bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r17.json \
  /root/repo/bench_artifacts/bench_diag_x10_r17.jsonl "$SKIP" || exit 1

echo "######## x100 ########"
retry x100 bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r17.json \
  /root/repo/bench_artifacts/bench_diag_x100_r17.jsonl "$SKIP" || exit 1

echo "######## sf0.1 full ########"
retry sf01 bench /root/testdata/sf0.1 \
  /root/repo/BENCH_full.json \
  /root/repo/bench_artifacts/bench_diag_r17.jsonl "" || exit 1

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
