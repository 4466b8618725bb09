#!/bin/bash
# Round-12 scale campaign — reordered from scale_campaign.sh so the
# round-11 verdict's headline gap (the committed sf10 FULL-sweep
# artifacts) lands first, then the skew10 heavies, then the sf1/skew
# artifact regeneration at the new HEAD (the exact-KNN a<b mirror and
# derived scan splits changed the plans those artifacts describe).
# The sf0.1 bench ran separately at this HEAD (docs/bench_full_sf0.1.json).
# graft.Bench self-gates every artifact run on a quiet host and records
# the gate + resolved maxPartitionBytes in the artifact.
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_LOAD_WAIT_S=${SPARK_GRAFT_LOAD_WAIT_S:-2400}

echo "=== STEP A1: sf10 FULL corpus (all tables x100) ==="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-sf10full 100" 2>&1 | grep scaleup

echo "=== STEP A2: sf10 full verify + oracle (the correctness gate at 100x) ==="
sbt -batch "runMain graft.Verify /tmp/graft-sf10full /tmp/verify_sf10" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-sf10full /tmp/verify_sf10 1800 | tee /tmp/sf10_oracle.log | \
  python3 scripts/correctness_artifact.py 10 "100x sf0.1 via graft.ScaleUp, ALL tables (sparse perturbation; auto buckets + auto LSH width; a<b mirrored exact KNN at HEAD)" docs/sf10_correctness.json
tail -2 /tmp/sf10_oracle.log

echo "=== STEP A3: sf10 full bench (writes docs/bench_full_sf10.json) ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-sf10full sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\"metric\"" | tail -1

echo "=== STEP B: sf10 skew heavies (tagged artifact docs/bench_full_skew10-heavies.json) ==="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-sf10skew 100 skew documents embeddings" 2>&1 | grep scaleup
SPARK_GRAFT_BENCH_TAG=skew10-heavies SPARK_GRAFT_SF_DIR=/tmp/graft-sf10skew \
  sbt -batch "runMain graft.Bench vec_knn_join_ann vec_knn_join_auto dedup_embedding dedup_ngram_jaccard dedup_substring dedup_incremental graph_iface_match" 2>&1 | grep "bench-full" | tail -1

echo "=== STEP C: sf10 probes — sketch contracts, zorder scan-cut, incremental routing, checkpoint cost ==="
sbt -batch "runMain graft.ScaleProbe sketch /tmp/graft-sf10full" 2>&1 | grep SKETCH
sbt -batch "runMain graft.ScaleProbe zorder /tmp/graft-sf10full" 2>&1 | grep ZORDER
sbt -batch "runMain graft.ScaleProbe incr /tmp/graft-sf10full" 2>&1 | grep INCR
sbt -batch "runMain graft.ScaleProbe checkpoint /tmp/graft-sf10full /tmp/graft_ckpt_sf10" 2>&1 | grep CHECKPOINT
sbt -batch "runMain graft.ScaleProbe broadcast /tmp/graft-sf10full" 2>&1 | grep BROADCAST | tail -3

echo "=== STEP D1: sf1 corpus + verify + oracle (regenerate at HEAD) ==="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-sf1 10" 2>&1 | grep scaleup | tail -2
sbt -batch "runMain graft.Verify /tmp/graft-sf1 /tmp/verify_sf1" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-sf1 /tmp/verify_sf1 600 | tee /tmp/sf1_oracle.log | \
  python3 scripts/correctness_artifact.py 1 "10x sf0.1 via graft.ScaleUp (sparse perturbation; auto buckets + auto LSH width; a<b mirrored exact KNN at HEAD)" docs/sf1_correctness.json
tail -2 /tmp/sf1_oracle.log

echo "=== STEP D2: sf1 full bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline|\"metric\"" | tail -2

echo "=== STEP E1: skew corpus + verify + oracle (regenerate at HEAD) ==="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-skew 10 skew" 2>&1 | grep scaleup | tail -2
sbt -batch "runMain graft.Verify /tmp/graft-skew /tmp/verify_skew" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-skew /tmp/verify_skew 900 | tee /tmp/skew_oracle.log | \
  python3 scripts/correctness_artifact.py 1 "adversarial-skew 10x sf0.1 via graft.ScaleUp skew mode (hot IVF cell ~55%, boilerplate 8-gram 80%, hot user 50%, hot source 90%; sparse replicas; a<b mirrored exact KNN at HEAD)" docs/skew_correctness.json
tail -2 /tmp/skew_oracle.log

echo "=== STEP E2: skew full bench ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-skew sbt -batch "runMain graft.Bench" 2>&1 | grep -E "bench-vs-baseline|\"metric\"" | tail -2

echo "=== CAMPAIGN R12 DONE ==="
