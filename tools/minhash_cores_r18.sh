#!/bin/bash
# Round-18 minhash saturation A/B (r17 verdict #5): the ×1000 step-table
# autopsy attributed the remaining dedup_minhash_keepers slope to 32-core
# saturation on the linear explode→agg scans (signatures/banding) and the
# candidate shuffle. Pin that law with a core-count A/B: the SAME ×1000
# docs tier, the SAME probe, one fresh JVM per side, local[16] vs
# local[32], back-to-back in one window. If the linear stages' wall time
# at local[16] reads ≈2× the local[32] time, they are compute-bound as
# claimed (the box's cores ARE the ceiling); ≈1× would mean some other
# ceiling (memory bandwidth, storage-pool eviction, skew) and the
# attribution is wrong.
#
# The docs-only fixture (DocsTierFixture) writes just the documents table
# at ×1000 (~6 GB) instead of the full ~13 GB relational tier the probe
# never reads. Console -> /tmp/minhash_cores_r18/
set -u
cd /root/repo
DOCS=/tmp/graft_docs_x1000_r18
LOG=/tmp/minhash_cores_r18
mkdir -p $LOG

if [ ! -f "$DOCS/documents.parquet/_SUCCESS" ]; then
  echo "######## fixture: x1000 docs ########"
  SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.DocsTierFixture "$DOCS" /root/testdata/sf0.1 1000 \
    > $LOG/fixture.log 2>&1 || exit 1
fi

for cpus in 32 16; do
  echo "######## step table local[$cpus] ########"
  SPARK_GRAFT_CPUS=$cpus GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.MinhashStepProbe "$DOCS" \
    > $LOG/steps_c$cpus.log 2>&1 || exit 1
  grep "\[step\]" $LOG/steps_c$cpus.log
done
echo "######## DONE ########"
