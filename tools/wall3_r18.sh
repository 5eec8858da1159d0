#!/bin/bash
# Round-18 wall-3 capability run: the ×1000 ALS fit from a ≤55 GB-free
# scratch start — the exact shape that ENOSPC'd twice in round 17
# (als_x1000_wall5_r17.json attempts at 51 and 57 GB free) before the
# iteration-scoped shuffle reaping (ShuffleLedger, 21ca4df) existed.
#
# Steps: (1) write the ×1000 ratings fixture if absent; (2) fallocate a
# ballast file so the free pool at probe start is ~54 GB; (3) run the
# probe at the pinned r16/r17 shape (local[32], -Xmx24g = 0.75 GB/core,
# AutoBlocks grid, rank 8, 5 iters, checkpointInterval 1) with the
# [scratch] sampler logging (t, free, blockmgr bytes, ledger reaps);
# (4) drop the ballast. Console -> /tmp/wall3_r18.log
set -u
cd /root/repo
RATINGS=/tmp/graft_x1000_ratings_r18
BALLAST=/tmp/graft_ballast_r18
TARGET_FREE_GB=54

if [ ! -f "$RATINGS/_SUCCESS" ]; then
  echo "######## fixture: x1000 ratings ########"
  SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.RatingsTierFixture "$RATINGS" /root/testdata/sf0.1 1000 256 \
    || exit 1
fi

FREE_GB=$(df --output=avail -B1G /tmp | tail -1 | tr -d ' ')
PAD=$((FREE_GB - TARGET_FREE_GB))
if [ "$PAD" -gt 0 ]; then
  echo "######## ballast: ${PAD} GB (free ${FREE_GB} -> ${TARGET_FREE_GB} GB) ########"
  fallocate -l ${PAD}G "$BALLAST" || exit 1
fi
df -h /tmp | tail -1

echo "######## x1000 probe (wall-3 shape) ########"
SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
  tools/runjvm_test.sh graft.AlsBlocksX1000Probe /root/testdata/sf0.1 0 256 "$RATINGS"
RC=$?

rm -f "$BALLAST"
echo "######## wall3 probe rc=$RC ########"
exit $RC
