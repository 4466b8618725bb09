#!/bin/bash
# Round-11 campaign resume: steps 1-3 (sf0.1/sf1/skew bench + sf1
# correctness) completed in the first run; the skew ORACLE must be
# re-replayed with the bound-and-filter KNN oracles (the first pass ran
# the cascade formulation that timed out / OOM'd on ann/auto), and the
# sf10 full sweep (step 4) + skew10 heavies (step 5) still need to run.
# One-shot helper; scripts/scale_campaign.sh remains the canonical
# full-regeneration entrypoint.
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32

echo "=== RESUME B: sf10 full verify + oracle (the round-11 correctness gate at scale) ==="
sbt -batch "runMain graft.Verify /tmp/graft-sf10full /tmp/verify_sf10" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-sf10full /tmp/verify_sf10 1800 | tee /tmp/sf10_oracle.log | \
  python3 scripts/correctness_artifact.py 1 "100x sf0.1 via graft.ScaleUp, ALL tables (sparse perturbation; auto buckets + auto LSH width at HEAD)" docs/sf10_correctness.json
tail -2 /tmp/sf10_oracle.log

echo "=== RESUME C: sf10 full bench (writes docs/bench_full_sf10.json) ==="
SPARK_GRAFT_SF_DIR=/tmp/graft-sf10full sbt -batch "runMain graft.Bench" 2>&1 | grep -E "\"metric\"" | tail -1

echo "=== RESUME D: sf10 probes — sketch contracts, zorder scan-cut, incremental routing, checkpoint cost ==="
sbt -batch "runMain graft.ScaleProbe sketch /tmp/graft-sf10full" 2>&1 | grep SKETCH
sbt -batch "runMain graft.ScaleProbe zorder /tmp/graft-sf10full" 2>&1 | grep ZORDER
sbt -batch "runMain graft.ScaleProbe incr /tmp/graft-sf10full" 2>&1 | grep INCR
sbt -batch "runMain graft.ScaleProbe checkpoint /tmp/graft-sf10full /tmp/graft_ckpt_sf10" 2>&1 | grep CHECKPOINT

echo "=== RESUME E: sf10 broadcast audit ==="
sbt -batch "runMain graft.ScaleProbe broadcast /tmp/graft-sf10full" 2>&1 | grep BROADCAST | tee /tmp/sf10_broadcast.log

echo "=== RESUME F: sf10 skew heavies (tagged artifact docs/bench_full_skew10-heavies.json) ==="
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft-sf10skew 100 skew documents embeddings" 2>&1 | grep scaleup
SPARK_GRAFT_BENCH_TAG=skew10-heavies SPARK_GRAFT_SF_DIR=/tmp/graft-sf10skew \
  sbt -batch "runMain graft.Bench vec_knn_join_ann vec_knn_join_auto dedup_embedding dedup_ngram_jaccard dedup_substring dedup_incremental graph_iface_match" 2>&1 | grep "bench-full" | tail -1

echo "=== RESUME DONE ==="
