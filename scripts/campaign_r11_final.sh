#!/bin/bash
# Round-11 final evidence pass, CHEAPEST-FIRST so a wall-clock cutoff
# loses the least: sf10 probe modes (sketch/zorder/incr/checkpoint),
# tagged sf10-heavies bench, then the open-ended sf10 full verify +
# oracle replay (the artifact is written when the replay completes; a
# cutoff mid-replay leaves the per-query log in /tmp/sf10_oracle.log).
set -x
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=32

echo "=== FINAL 1: sf10 probes (sketch / zorder / incr) ==="
sbt -batch "runMain graft.ScaleProbe sketch /tmp/graft-sf10full" 2>&1 | grep SKETCH
sbt -batch "runMain graft.ScaleProbe zorder /tmp/graft-sf10full" 2>&1 | grep ZORDER
sbt -batch "runMain graft.ScaleProbe incr /tmp/graft-sf10full" 2>&1 | grep INCR

echo "=== FINAL 2: checkpoint cost at sf10 ==="
sbt -batch "runMain graft.ScaleProbe checkpoint /tmp/graft-sf10full /tmp/graft_ckpt_sf10" 2>&1 | grep CHECKPOINT

echo "=== FINAL 3: sf10 heavies bench (tagged docs/bench_full_sf10-heavies.json) ==="
SPARK_GRAFT_BENCH_TAG=sf10-heavies SPARK_GRAFT_SF_DIR=/tmp/graft-sf10full \
  sbt -batch "runMain graft.Bench vec_knn_join_ann vec_knn_join_auto dedup_embedding dedup_ngram_jaccard dedup_substring dedup_incremental graph_iface_match vec_knn_join mm_phash_dedup text_bpe_train" 2>&1 | grep "bench-full" | tail -1

echo "=== FINAL 4: sf10 full verify + oracle ==="
sbt -batch "runMain graft.Verify /tmp/graft-sf10full /tmp/verify_sf10" 2>&1 | tail -2
python3 scripts/check_oracle.py /tmp/graft-sf10full /tmp/verify_sf10 1800 | tee /tmp/sf10_oracle.log | \
  python3 scripts/correctness_artifact.py 1 "100x sf0.1 via graft.ScaleUp, ALL tables (sparse perturbation; auto buckets + auto LSH width at HEAD)" docs/sf10_correctness.json
tail -2 /tmp/sf10_oracle.log

echo "=== FINAL DONE ==="
