#!/bin/bash
# Round-18 OPTIMIZATION-round tier artifacts on the optimized binary,
# same boot: x10, x100, then the 3-rep quiet sf0.1 median of record
# (r17 verdict #4 protocol, same skip set as tiers_r18.sh so the tier
# numbers are comparable to the build-phase artifacts).
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall,als_rank32_factors,als_rank64_factors
LOG=/tmp/tiers_r18opt
mkdir -p $LOG

retry() {
  local name=$1; shift
  for attempt in 1 2 3 4 5 6 7 8; do
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

echo "######## sf0.1 full, quiet reps 2+3 (rep1 done) ########"
for rep in 2 3; do
  retry sf01_rep$rep bench /root/testdata/sf0.1 \
    /root/repo/bench_artifacts/BENCH_sf01_r18opt_rep$rep.json \
    /root/repo/bench_artifacts/bench_diag_r18opt_rep$rep.jsonl "" || exit 1
done

python3 tools/bench_median.py \
  /root/repo/bench_artifacts/BENCH_sf01_r18opt_rep1.json \
  /root/repo/bench_artifacts/BENCH_sf01_r18opt_rep2.json \
  /root/repo/bench_artifacts/BENCH_sf01_r18opt_rep3.json \
  /root/repo/BENCH_full.json \
  /root/repo/bench_artifacts/bench_median_r18opt.json || exit 1

echo "######## x10 ########"
retry x10 bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r18opt.json \
  /root/repo/bench_artifacts/bench_diag_x10_r18opt.jsonl "$SKIP" || exit 1

echo "######## x100 ########"
retry x100 bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r18opt.json \
  /root/repo/bench_artifacts/bench_diag_x100_r18opt.jsonl "$SKIP" || exit 1

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
