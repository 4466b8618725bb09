#!/usr/bin/env python3
"""Fold check_oracle.py stdout into the committed correctness artifact.

Usage: check_oracle.py <sf_dir> <out_dir> [timeout] | \
       correctness_artifact.py <sf_label> <corpus_desc> <artifact_path>

Reads the per-query PASS/FAIL/NO-ORACLE/ORACLE-TIMEOUT lines from stdin and
writes the docs/<name>_correctness.json shape rounds 7/8 recorded by hand.
"""
import sys, json, re

def main():
    sf, corpus, out = sys.argv[1], sys.argv[2], sys.argv[3]
    queries, counts = {}, {"pass": 0, "rows_only": 0, "timeout": 0, "fail": 0}
    for line in sys.stdin:
        line = line.strip()
        m = re.match(r"^(\w+): (PASS|FAIL|NO-ORACLE|ORACLE-TIMEOUT|ORACLE-ERROR)", line)
        if not m:
            continue
        name, verdict = m.groups()
        if verdict == "PASS":
            queries[name] = "pass"; counts["pass"] += 1
        elif verdict == "NO-ORACLE":
            queries[name] = "rows-only by design"; counts["rows_only"] += 1
        elif verdict == "ORACLE-TIMEOUT":
            queries[name] = "oracle timeout (spark rows dumped)"; counts["timeout"] += 1
        else:
            queries[name] = "FAIL: " + line[len(name) + 2:][:160]; counts["fail"] += 1
    body = {
        "sf": sf,
        "corpus": corpus,
        "n_queries": len(queries),
        "pass": counts["pass"],
        "rows_only_by_design": counts["rows_only"],
        "oracle_timeout_duckdb": counts["timeout"],
        "fail": counts["fail"],
        "queries": dict(sorted(queries.items())),
    }
    with open(out, "w") as f:
        json.dump(body, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {counts}")

main()
