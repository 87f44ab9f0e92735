#!/bin/bash
# r13 verdict item 7: the SPILL-TOLERANT decade probe.
# Run ONE dedup flagship at sf10 with the heap deliberately constricted
# so Spark's aggregation/join paths actually spill, then verify the
# output is bit-identical to the 48g (zero-spill) run. Evidence that
# graceful degradation holds empirically, not by zero-spill luck.
set -e
cd /root/repo
echo "== constricted-heap campaign (forces spill) =="
SPARK_GRAFT_SF_DIR=scaled/sf10 SPARK_GRAFT_ONLY=q_dedup_clusters \
  SPARK_GRAFT_ITERS=1 SPARK_DRIVER_MEM=${SPILL_MEM:-10g} SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.CampaignBench' 2>/dev/null | grep '"query"'
echo "== constricted-heap verify dump =="
rm -rf /tmp/verify_sf10_spill
SPARK_GRAFT_ONLY=q_dedup_clusters SPARK_DRIVER_MEM=${SPILL_MEM:-10g} \
  SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Verify scaled/sf10 /tmp/verify_sf10_spill' \
  2>&1 | grep -E "verify.*failed" || true
echo "SPILL_PROBE_DONE"
