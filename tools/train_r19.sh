#!/bin/bash
# Round-19 measurement train (sequential, quiet-gated where applicable):
#   1. wall-3 ×1000 ALS re-probe on the SHIPPED kernel (r18 verdict #2:
#      the r18 54-GB-free proof predates the concurrent-makeBlocks
#      overlap; re-prove on the current binary) — exact wall3_r18.sh
#      shape: ballast to 54 GB free, AutoBlocks, rank 8, 5 iters,
#      checkpointInterval 1, local[32] -Xmx24g.
#   2. BASELINE head-to-head re-stamp (r18 verdict #6): median-of-3,
#      ranks 8/32/64, alternating fresh-JVM sides.
#   3. 32-vs-8-core crossover probes (r18 verdict #8): sf0.1 at c8 and
#      ×10 at c32/c8 (r18's sf0.1 c32/c8 inversion needs the ×10 points
#      to show where 32 cores overtake).
#   4. Final quiet sf0.1 bench, 3 reps (median-of-3 bench of record).
set -u
cd /root/repo
LOG=/tmp/train_r19
mkdir -p $LOG
SKIP=sim_topk_brute,als_recommend,als_item_neighbors,dedup_embedding,sim_recall,sim_drift_recall,als_rank32_factors,als_rank64_factors

retry() {
  local name=$1; shift
  for attempt in 1 2 3 4 5 6; do
    echo "=== $name attempt $attempt $(date -u +%H:%M:%S) ==="
    "$@" > $LOG/$name.attempt$attempt.log 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then echo "=== $name OK ==="; return 0; fi
    if [ $rc -eq 3 ]; then echo "=== $name REFUSED (loaded), waiting 10m ==="; sleep 600; continue; fi
    echo "=== $name FAILED rc=$rc ==="
    [ $attempt -ge 2 ] && return $rc
  done
  return 1
}

bench() {
  local sfdir=$1 out=$2 diag=$3 skip=$4 cpus=$5
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_BENCH_SKIP=$skip \
    SPARK_GRAFT_METER_REFUSE=1 \
    SPARK_GRAFT_BENCH_OUT=$out SPARK_GRAFT_BENCH_DIAG=$diag \
    tools/runjvm.sh graft.Bench
}

echo "######## 1. wall-3 x1000 ########"
RATINGS=/tmp/graft_x1000_ratings_r18
BALLAST=/tmp/graft_ballast_r19
if [ ! -f "$RATINGS/_SUCCESS" ]; then
  echo "=== fixture regen $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.RatingsTierFixture "$RATINGS" /root/testdata/sf0.1 1000 256 \
    > $LOG/fixture.log 2>&1 || { echo fixture FAILED; exit 1; }
fi
FREE_GB=$(df --output=avail -B1G /tmp | tail -1 | tr -d ' ')
PAD=$((FREE_GB - 54))
if [ "$PAD" -gt 0 ]; then
  echo "=== ballast ${PAD} GB (free ${FREE_GB} -> 54 GB) ==="
  fallocate -l ${PAD}G "$BALLAST" || exit 1
fi
df -h /tmp | tail -1
echo "=== wall3 probe $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
  tools/runjvm_test.sh graft.AlsBlocksX1000Probe /root/testdata/sf0.1 0 256 "$RATINGS" \
  > $LOG/wall3.log 2>&1
RC=$?
rm -f "$BALLAST"
echo "=== wall3 rc=$RC ==="
python3 tools/wall3_parse.py $LOG/wall3.log 54 bench_artifacts/als_x1000_wall3_r19.json \
  || echo "wall3 parse FAILED"

echo "######## 2. head-to-head repeats ########"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_H2H_RANKS=8,32,64 \
  tools/runjvm.sh graft.HeadToHeadRepeats \
  bench_artifacts/headtohead_repeats_r19.json 3 \
  > $LOG/h2h.log 2>&1 || echo "h2h FAILED"

echo "######## 3. crossover probes ########"
retry sf01_c8 bench /root/testdata/sf0.1 \
  bench_artifacts/BENCH_sf01_r19_c8.json $LOG/diag_sf01_c8.jsonl "" 8
retry x10_c32 bench /tmp/graft_scale_full_x10 \
  bench_artifacts/BENCH_x10_r19.json $LOG/diag_x10_c32.jsonl "$SKIP" 32
retry x10_c8 bench /tmp/graft_scale_full_x10 \
  bench_artifacts/BENCH_x10_r19_c8.json $LOG/diag_x10_c8.jsonl "$SKIP" 8

echo "######## 4. final sf0.1 quiet reps ########"
for rep in 1 2 3; do
  retry sf01_rep$rep bench /root/testdata/sf0.1 \
    bench_artifacts/BENCH_sf01_r19_rep$rep.json \
    bench_artifacts/bench_diag_r19_rep$rep.jsonl "" 32 || exit 1
done
echo "######## TRAIN DONE $(date -u +%H:%M:%S) ########"
