#!/bin/bash
# Round-14 mid-round AFTER measurements for batches 1-3.
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export ORACLE_TMP=${ORACLE_TMP:-/root/duck_spill}

rm -rf spark-warehouse

echo "=== sf1 full bench (batches 1-3 AFTER) ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_LOAD_GATE=5 SPARK_GRAFT_LOAD_WAIT_S=1800 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline" | tail -1
du -sh spark-warehouse/graft_emb_bands* spark-warehouse/graft_minhash* 2>/dev/null

echo "=== sf1 verify + oracle (hash identity at scale) ==="
sbt -batch "runMain graft.Verify /tmp/graft-sf1 /tmp/verify_sf1_mid" 2>&1 | grep -c "\[verify\].*failed"
python3 scripts/check_oracle.py /tmp/graft-sf1 /tmp/verify_sf1_mid 600 > /tmp/sf1_oracle_mid.log 2>&1
tail -1 /tmp/sf1_oracle_mid.log

echo "=== sf0.1 full bench, stricter gate ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_LOAD_GATE=4 SPARK_GRAFT_LOAD_WAIT_S=1800 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline" | tail -1

echo "=== sf0.001 verify + oracle ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_sf0001_mid" 2>&1 | grep -c "\[verify\].*failed"
python3 scripts/check_oracle.py /root/testdata/sf0.001 /tmp/verify_sf0001_mid 300 > /tmp/sf0001_oracle_mid.log 2>&1
tail -1 /tmp/sf0001_oracle_mid.log

echo "=== sf0.1 verify + oracle ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01_mid" 2>&1 | grep -c "\[verify\].*failed"
python3 scripts/check_oracle.py /root/testdata/sf0.1 /tmp/verify_sf01_mid 600 > /tmp/sf01_oracle_mid.log 2>&1
tail -1 /tmp/sf01_oracle_mid.log

echo "=== R14 MID DONE ==="
