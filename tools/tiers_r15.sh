#!/bin/bash
# Round-15 artifact regeneration: x10/x100 full-suite tiers, order-symmetric
# head-to-heads, and two quiet sf0.1 drift runs — all on one HEAD binary,
# all meter-refused (verify recipe, round-15 rule). Each step retries up to
# 6 times with a 10-minute wait when the noise meter refuses (exit 3).
set -u
cd /root/repo
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall
LOG=/tmp/tiers_r15
mkdir -p $LOG

retry() { # retry <name> <cmd...>
  local name=$1; shift
  for attempt in 1 2 3 4 5 6; do
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@" > $LOG/$name.attempt$attempt.log 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then echo "=== $name OK ==="; return 0; fi
    if [ $rc -eq 3 ]; then echo "=== $name REFUSED (loaded box), waiting 10m ==="; sleep 600; continue; fi
    echo "=== $name FAILED rc=$rc (see $LOG/$name.attempt$attempt.log) ==="
    # one free retry for non-refusal failures (transient fork OOM etc.)
    [ $attempt -ge 2 ] && return $rc
  done
  return 1
}

bench() { # bench <sfdir> <out> <diag> [extra env...]
  local sfdir=$1 out=$2 diag=$3
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_BENCH_SKIP=$SKIP \
    SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_OUT=$out SPARK_GRAFT_BENCH_DIAG=$diag \
    tools/runjvm.sh graft.Bench
}

# meter gate for steps that don't self-meter (head-to-head): a tiny ONLY
# bench run that exits 3 on a loaded box
metergate() {
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_ONLY=q01_pricing_summary \
    SPARK_GRAFT_BENCH_OUT=$LOG/metergate_last.json \
    tools/runjvm.sh graft.Bench
}

echo "######## 1. x10 full suite ########"
retry x10 bench /tmp/graft_scale_full_x10 \
  /root/repo/bench_artifacts/BENCH_x10_r15.json \
  /root/repo/bench_artifacts/bench_diag_x10_r15.jsonl || exit 1

echo "######## 2. x100 full suite ########"
retry x100 bench /tmp/graft_scale_full_x100 \
  /root/repo/bench_artifacts/BENCH_x100_r15.json \
  /root/repo/bench_artifacts/bench_diag_x100_r15.jsonl || exit 1

echo "######## 3. sf0.1 head-to-head N=5 ########"
retry h2h_gate metergate || exit 1
cp $LOG/metergate_last.json $LOG/metergate_h2h_sf01.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/runjvm.sh graft.HeadToHeadRepeats \
  /root/repo/bench_artifacts/headtohead_repeats_r15.json 5 \
  > $LOG/h2h_sf01.log 2>&1 || { echo h2h_sf01 FAILED; exit 1; }

echo "######## 4. x100 head-to-head N=3 ########"
retry h2h100_gate metergate || exit 1
cp $LOG/metergate_last.json $LOG/metergate_h2h_x100.json
SPARK_GRAFT_SF_DIR=/tmp/graft_scale_full_x100 SPARK_GRAFT_H2H_XMX=12g \
  tools/runjvm.sh graft.HeadToHeadRepeats \
  /root/repo/bench_artifacts/headtohead_x100_r15.json 3 \
  > $LOG/h2h_x100.log 2>&1 || { echo h2h_x100 FAILED; exit 1; }

echo "######## 5+6. sf0.1 drift runs (full suite, no skip) ########"
driftrun() { # driftrun <out> <diag>
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_OUT=$1 SPARK_GRAFT_BENCH_DIAG=$2 \
    tools/runjvm.sh graft.Bench
}
retry driftA driftrun $LOG/BENCH_sf01_driftA.json $LOG/diag_driftA.jsonl || exit 1
retry driftB driftrun $LOG/BENCH_sf01_driftB.json $LOG/diag_driftB.jsonl || exit 1

echo "######## ALL DONE $(date -u +%H:%M:%S) ########"
