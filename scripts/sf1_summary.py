#!/usr/bin/env python3
"""Assemble a stress-corpus correctness artifact from check_oracle.py
(and optionally graft.Verify stderr) output.

Usage: sf1_summary.py <check_log> [<check_log2> ...]
         [--out docs/sf1_correctness.json] [--corpus <label>] [--sf <n>]
Later logs override earlier ones per query (top-up runs). Lines of the
form "[verify] <name> failed: ..." (Verify stderr) mark Spark-side
errors, which check_oracle cannot see (a failed query writes no dir)."""
import sys, json, re, argparse

ap = argparse.ArgumentParser()
ap.add_argument("logs", nargs="+")
ap.add_argument("--out", default="docs/sf1_correctness.json")
ap.add_argument("--corpus", default="10x key-shifted sf0.1 via graft.ScaleUp")
ap.add_argument("--sf", default="1")
args = ap.parse_args()

queries = {}
for path in args.logs:
    for line in open(path):
        m = re.match(r"^([a-z0-9_]+): (PASS|FAIL|NO-ORACLE|ORACLE-ERROR)", line)
        if m:
            name, st = m.groups()
            queries[name] = ("pass" if st == "PASS"
                             else "rows_only" if st == "NO-ORACLE"
                             else "FAIL")
        m = re.search(r"\[verify\] ([a-z0-9_]+) failed", line)
        if m:
            queries[m.group(1)] = "spark_error"
n_pass = sum(1 for v in queries.values() if v == "pass")
n_rows = sum(1 for v in queries.values() if v == "rows_only")
n_serr = sum(1 for v in queries.values() if v == "spark_error")
out = {
    "sf": float(args.sf) if re.match(r"^[0-9.]+$", args.sf) else args.sf,
    "corpus": args.corpus,
    "n_queries": len(queries),
    "pass": n_pass,
    "rows_only_by_design": n_rows,
    "oracle_timeout_duckdb_quadratic": 0,
    "spark_side_errors": n_serr,
    "queries": dict(sorted(queries.items())),
}
json.dump(out, open(args.out, "w"), indent=1)
print(f"{len(queries)} queries: {n_pass} pass, {n_rows} rows-only, "
      f"{n_serr} spark-error, "
      f"{len(queries) - n_pass - n_rows - n_serr} FAIL -> {args.out}")
