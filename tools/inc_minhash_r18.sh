#!/bin/bash
# Round-18 incremental near-dup scale probe: a CONSTANT 5k-doc batch
# dedups against minhashIndex(corpus) at three corpus tiers (×10 /
# ×100 / ×1000 of the sf0.1 docs table, subsets of the shared ×1000
# docs fixture). Fresh JVM per tier. The claim under test: the
# recurring incremental cost grows only with the narrow index scan
# (sub-decade slope), while corpus TEXT is never re-read — vs the
# O(corpus) full re-dedup it replaces. Console -> /tmp/inc_minhash_r18/
set -u
cd /root/repo
DOCS=/tmp/graft_docs_x1000_r18
LOG=/tmp/inc_minhash_r18
mkdir -p $LOG

if [ ! -f "$DOCS/documents.parquet/_SUCCESS" ]; then
  echo "######## fixture: x1000 docs ########"
  SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.DocsTierFixture "$DOCS" /root/testdata/sf0.1 1000 \
    > $LOG/fixture.log 2>&1 || exit 1
fi

for n in 50000 500000 4995000; do
  echo "######## tier corpus=$n ########"
  SPARK_GRAFT_CPUS=32 GRAFT_EXTRA_JAVA_OPTS="-Xmx24g" \
    tools/runjvm_test.sh graft.IncrementalMinhashProbe "$DOCS" "$n" /tmp/graft_incmh_index \
    > $LOG/tier_$n.log 2>&1 || exit 1
  grep "\[inc\]" $LOG/tier_$n.log
done
echo "######## DONE ########"
