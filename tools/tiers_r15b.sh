#!/bin/bash
# Round-15 tier re-run on the dual-stamp binary: the first x10 pass was
# taken inside a load window that arrived after the t=0 meter sample (and
# the early-x100 als rows carry the same window). Re-run both tiers; the
# end-of-run meter now refuses such a run instead of stamping it quiet.
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall
LOG=/tmp/tiers_r15
mkdir -p $LOG

retry() {
  local name=$1; shift
  for attempt in 1 2 3 4 5 6 7 8; do
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@" > $LOG/$name.attempt$attempt.log 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then echo "=== $name OK ==="; return 0; fi
    if [ $rc -eq 3 ]; then echo "=== $name REFUSED (loaded box), waiting 10m ==="; sleep 600; continue; fi
    echo "=== $name FAILED rc=$rc (see $LOG/$name.attempt$attempt.log) ==="
    [ $attempt -ge 2 ] && return $rc
  done
  return 1
}

bench() {
  local sfdir=$1 out=$2 diag=$3
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_BENCH_SKIP=$SKIP \
    SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_OUT=$out SPARK_GRAFT_BENCH_DIAG=$diag \
    tools/runjvm.sh graft.Bench
}

echo "######## x10 full suite (re-run) ########"
retry x10b bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r15.json \
  /root/repo/bench_artifacts/bench_diag_x10_r15.jsonl || exit 1

echo "######## x100 full suite (re-run) ########"
retry x100b bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r15.json \
  /root/repo/bench_artifacts/bench_diag_x100_r15.jsonl || exit 1

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
