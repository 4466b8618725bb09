#!/usr/bin/env python3
"""Merge check_oracle.py logs (later files override earlier, per query) and
emit the merged per-query lines for correctness_artifact.py.

Usage: merge_oracle_logs.py base.log override1.log [override2.log ...]

Re-running only the queries whose ORACLE formulation changed (the engine
dump is already on disk) is how the scale campaign iterates without paying
a full 129-query sweep per oracle fix; this folds those partial re-check
logs back into one artifact-shaped stream.
"""
import sys, re

order, latest = [], {}
for path in sys.argv[1:]:
    with open(path) as f:
        for line in f:
            m = re.match(r"^(\w+): (PASS|CONTRACT-PASS|FAIL|NO-ORACLE|"
                         r"ORACLE-TIMEOUT|ORACLE-ERROR)", line.strip())
            if not m:
                continue
            name = m.group(1)
            if name not in latest:
                order.append(name)
            latest[name] = line.rstrip("\n")

for name in sorted(order):
    print(latest[name])
