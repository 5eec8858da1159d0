#!/bin/bash
# Round-15 continuation artifact refresh: the dedup pair-generation
# rewrite (2284da3) changed the dedup_* rows, so every committed bench
# artifact is regenerated on the binary that ships. Head-to-heads are
# NOT rerun: the ALS train/transform paths have zero diff since the
# committed headtohead_*_r15.json artifacts. Dual-stamp refusal on.
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall
LOG=/tmp/tiers_r15d
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

echo "######## x10 (dedup-rewrite HEAD) ########"
retry x10d bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r15.json \
  /root/repo/bench_artifacts/bench_diag_x10_r15.jsonl "$SKIP" || exit 1

echo "######## x100 (dedup-rewrite HEAD) ########"
retry x100d bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r15.json \
  /root/repo/bench_artifacts/bench_diag_x100_r15.jsonl "$SKIP" || exit 1

echo "######## sf0.1 full (dedup-rewrite HEAD -> BENCH_full.json) ########"
retry sf01d bench /root/testdata/sf0.1 \
  /root/repo/BENCH_full.json \
  /root/repo/bench_artifacts/bench_diag_r15.jsonl "" || exit 1

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
