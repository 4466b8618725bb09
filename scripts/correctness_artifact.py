#!/usr/bin/env python3
"""Fold check_oracle.py stdout into the committed correctness artifact.

Usage: check_oracle.py <sf_dir> <out_dir> [timeout] | \
       correctness_artifact.py <sf_label> <corpus_desc> <artifact_path>

Reads the per-query PASS/FAIL/NO-ORACLE/ORACLE-TIMEOUT lines from stdin and
writes the docs/<name>_correctness.json shape rounds 7/8 recorded by hand.
"""
import sys, json, re

# The ONLY queries allowed to run without a DuckDB oracle (engine-internal
# sketches, each paired with a portable hash-checked companion). Any OTHER
# NO-ORACLE line means the oracle was lost by accident (renamed key,
# oracle_sql.json generation bug) and is counted as a failure, not silently
# recorded as intentional.
ROWS_ONLY_BY_DESIGN = {"q9b_approx_distinct", "q13b_approx_percentiles"}

def main():
    sf, corpus, out = sys.argv[1], sys.argv[2], sys.argv[3]
    queries, counts = {}, {"pass": 0, "rows_only": 0, "timeout": 0, "fail": 0,
                           "missing_oracle": 0}
    for line in sys.stdin:
        line = line.strip()
        m = re.match(r"^(\w+): (PASS|CONTRACT-PASS|FAIL|NO-ORACLE|"
                     r"ORACLE-TIMEOUT|ORACLE-ERROR)", line)
        if not m:
            continue
        name, verdict = m.groups()
        if verdict == "PASS":
            queries[name] = "pass"; counts["pass"] += 1
        elif verdict == "CONTRACT-PASS":
            # rows+schema verified against the declared contract; only the
            # value hash is whitelisted (engine-internal sketch bytes)
            if name in ROWS_ONLY_BY_DESIGN:
                queries[name] = "rows+schema pass, hash whitelisted by design"
                counts["rows_only"] += 1
            else:
                queries[name] = "FAIL: contract pass outside the by-design set"
                counts["missing_oracle"] += 1
        elif verdict == "NO-ORACLE":
            if name in ROWS_ONLY_BY_DESIGN:
                queries[name] = "rows-only by design"; counts["rows_only"] += 1
            else:
                queries[name] = "FAIL: oracle missing (not in the by-design set)"
                counts["missing_oracle"] += 1
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
        "fail": counts["fail"] + counts["missing_oracle"],
        "missing_oracle": counts["missing_oracle"],
        "queries": dict(sorted(queries.items())),
    }
    with open(out, "w") as f:
        json.dump(body, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {counts}")

main()
