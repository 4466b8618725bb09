#!/bin/bash
# Round-14 BEFORE measurements (VERDICT r13 item 1: establish a
# scale-sensitive baseline at this HEAD before touching any operator).
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_LOAD_WAIT_S=${SPARK_GRAFT_LOAD_WAIT_S:-1200}
export ORACLE_TMP=${ORACLE_TMP:-/root/duck_spill}

echo "=== STEP 0: wipe stale derived-table cache (fresh builds at this HEAD) ==="
rm -rf spark-warehouse

echo "=== STEP 1: sf0.01 verify + oracle (inherited-state correctness gate) ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001_r14" 2>&1 | tail -2
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_sf001_r14 300 > /tmp/sf001_oracle_r14.log 2>&1
tail -2 /tmp/sf001_oracle_r14.log

echo "=== STEP 2: sf1 corpus regenerate at HEAD ==="
rm -rf /tmp/graft-sf1
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-sf1 10" 2>&1 | grep scaleup | tail -2

echo "=== STEP 3: sf1 verify + oracle ==="
sbt -batch "runMain graft.Verify /tmp/graft-sf1 /tmp/verify_sf1_r14" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-sf1 /tmp/verify_sf1_r14 600 > /tmp/sf1_oracle_r14.log 2>&1
python3 scripts/correctness_artifact.py 1 "10x sf0.1 via graft.ScaleUp at r14 HEAD (sparse perturbation; auto buckets + auto LSH width; native phash; exact-integer q1_agg averages)" docs/sf1_correctness.json < /tmp/sf1_oracle_r14.log
tail -2 /tmp/sf1_oracle_r14.log

echo "=== STEP 4: sf1 full bench (round-14 BEFORE) ==="
rm -rf spark-warehouse
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline|\"metric\"" | tail -2
cp docs/bench_full_sf1.json /tmp/bench_full_sf1_BEFORE_r14.json

echo "=== STEP 5: sf0.1 full bench at 32 cores (round-14 BEFORE) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline|\"metric\"" | tail -2
cp docs/bench_full_sf0.1.json /tmp/bench_full_sf0.1_BEFORE_r14.json

echo "=== R14 BEFORE DONE ==="
