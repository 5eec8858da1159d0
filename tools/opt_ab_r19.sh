#!/bin/bash
# Round-19 same-window ABBA A/B: pre-optimization binary (round-18 HEAD,
# 6be7580) legs 1+4, optimized binary (current main) legs 2+3, one
# window, full-suite quiet-gated Bench runs. The untouched-row median
# between legs drift-normalizes the touched-row deltas (r15/r18
# protocol) — the only admissible code-delta instrument on this box.
set -u
cd /root/repo
LOG=/tmp/opt_ab_r19
mkdir -p $LOG
OLD=6be7580

bench() {
  local out=$1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_METER_REFUSE=1 SPARK_GRAFT_BENCH_OUT=$out \
    tools/runjvm.sh graft.Bench
}

leg() {
  local name=$1 ref=$2 out=$3
  echo "=== leg $name ($ref) $(date -u +%H:%M:%S) ==="
  git -c advice.detachedHead=false checkout -q $ref || exit 1
  sbt -batch compile > $LOG/compile_$name.log 2>&1 || { echo "compile FAILED"; exit 1; }
  for attempt in 1 2 3 4; do
    bench $out > $LOG/$name.attempt$attempt.log 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then echo "=== leg $name OK ==="; return 0; fi
    if [ $rc -eq 3 ]; then echo "=== leg $name REFUSED (loaded), waiting 10m ==="; sleep 600; continue; fi
    echo "=== leg $name FAILED rc=$rc ==="; exit $rc
  done
  exit 1
}

leg pre1  $OLD bench_artifacts/opt_ab_pre1_r19.json
leg post1 main bench_artifacts/opt_ab_post1_r19.json
leg post2 main bench_artifacts/opt_ab_post2_r19.json
leg pre2  $OLD bench_artifacts/opt_ab_pre2_r19.json
git checkout -q main
sbt -batch compile > $LOG/compile_final.log 2>&1
echo "=== ABBA done $(date -u +%H:%M:%S) ==="
