#!/bin/bash
# Capture .explain("formatted") for all queries into plans/<tag>/<q>_<suffix>.txt
# Usage: capture_plans.sh <tag> <suffix>   (e.g. capture_plans.sh r14 before)
set -e
cd "$(dirname "$0")/.."
TAG=${1:?tag}; SUF=${2:?suffix}
mkdir -p "plans/$TAG"
sbt -batch "runMain graft.Probe" 2>/dev/null > "/tmp/plans_${TAG}_${SUF}.txt"
python3 - "$TAG" "$SUF" <<'EOF'
import sys, os, re
tag, suf = sys.argv[1], sys.argv[2]
text = open(f"/tmp/plans_{tag}_{suf}.txt").read()
parts = re.split(r"^===== (\S+) =====$", text, flags=re.M)
n = 0
for i in range(1, len(parts), 2):
    name, body = parts[i], parts[i+1]
    with open(f"plans/{tag}/{name}_{suf}.txt", "w") as f:
        f.write(body.strip() + "\n")
    n += 1
print(f"wrote {n} plans/{tag}/*_{suf}.txt")
EOF
