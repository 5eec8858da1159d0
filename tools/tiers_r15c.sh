#!/bin/bash
# Final-HEAD artifact refresh after the blockify mapSideCombine change:
# the change is in the training path, so every artifact that times ALS
# training is regenerated on the binary that ships. Dual-stamp refusal on.
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall
LOG=/tmp/tiers_r15
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

echo "######## x10 (final HEAD) ########"
retry x10c bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r15.json \
  /root/repo/bench_artifacts/bench_diag_x10_r15.jsonl "$SKIP" || exit 1

echo "######## x100 (final HEAD) ########"
retry x100c bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r15.json \
  /root/repo/bench_artifacts/bench_diag_x100_r15.jsonl "$SKIP" || exit 1

echo "######## sf0.1 full (final HEAD -> BENCH_full.json) ########"
retry sf01c bench /root/testdata/sf0.1 \
  /root/repo/BENCH_full.json \
  /root/repo/bench_artifacts/bench_diag_r15.jsonl "" || exit 1

echo "######## sf0.1 h2h N=5 (final HEAD) ########"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/runjvm.sh graft.HeadToHeadRepeats \
  /root/repo/bench_artifacts/headtohead_repeats_r15.json 5 \
  > $LOG/h2h_sf01_c.log 2>&1 || { echo h2h_sf01 FAILED; exit 1; }

echo "######## x100 h2h N=3 (final HEAD) ########"
SPARK_GRAFT_SF_DIR=/tmp/graft_scale_full_x100 SPARK_GRAFT_H2H_XMX=12g \
  tools/runjvm.sh graft.HeadToHeadRepeats \
  /root/repo/bench_artifacts/headtohead_x100_r15.json 3 \
  > $LOG/h2h_x100_c.log 2>&1 || { echo h2h_x100 FAILED; exit 1; }

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
