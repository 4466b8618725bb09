#!/bin/bash
# Round-14 FINAL measurements: full sweeps on the final tree, the SAME
# sweeps on the untouched BEFORE commit (worktree, same host window —
# the drift-aware comparison), the 4-SF oracle, and after-plans.
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export ORACLE_TMP=${ORACLE_TMP:-/root/duck_spill}
export SPARK_GRAFT_LOAD_GATE=4
export SPARK_GRAFT_LOAD_WAIT_S=1500

echo "=== after-plans for all queries ==="
bash scripts/capture_plans.sh r14 after

echo "=== FINAL sf0.1 full bench ==="
rm -rf spark-warehouse
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline" | tail -1

echo "=== FINAL sf1 full bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline" | tail -1

echo "=== BEFORE-now sf1 full bench (worktree, drift pair) ==="
(cd /tmp/graft-before && rm -rf spark-warehouse && \
  SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline" | tail -1)

echo "=== FINAL verify + oracle, 4 SFs ==="
for sf in sf0.001 sf0.01 sf0.1; do
  sbt -batch "runMain graft.Verify /root/testdata/$sf /tmp/verify_${sf}_final" 2>&1 | grep -c "\[verify\].*failed"
  python3 scripts/check_oracle.py /root/testdata/$sf /tmp/verify_${sf}_final 600 > /tmp/${sf}_oracle_final.log 2>&1
  tail -1 /tmp/${sf}_oracle_final.log
done
sbt -batch "runMain graft.Verify /tmp/graft-sf1 /tmp/verify_sf1_final" 2>&1 | grep -c "\[verify\].*failed"
python3 scripts/check_oracle.py /tmp/graft-sf1 /tmp/verify_sf1_final 600 > /tmp/sf1_oracle_final.log 2>&1
python3 scripts/correctness_artifact.py 1 "10x sf0.1 via graft.ScaleUp at r14 HEAD (packed v3 band riders + minhash v2; sort-based q13; native FrameEnergies/KeywordDecls/tf/AlphaCount)" docs/sf1_correctness.json < /tmp/sf1_oracle_final.log
tail -1 /tmp/sf1_oracle_final.log

echo "=== R14 FINAL DONE ==="
