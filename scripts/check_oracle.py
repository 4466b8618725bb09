#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sf_dir> <verify_out_dir> [timeout_s]
Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB over the same tables, sorts columns by name and
rows by all values, and diffs. Prints PASS/FAIL per query. The optional
per-query timeout interrupts a pathological oracle replay (large-SF probes)
and records ORACLE-TIMEOUT instead of hanging the sweep.
"""
import sys, os, json, glob, threading
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to avoid dtype mismatches (int32 vs int64 etc.)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(got)}")
            continue
        timed_out = []
        timer = None
        if timeout:
            timer = threading.Timer(timeout,
                lambda: (timed_out.append(True), con.interrupt()))
            timer.start()
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            if timed_out:
                print(f"{name}: ORACLE-TIMEOUT after {timeout}s (rows={len(got)})")
            else:
                print(f"{name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"{name}: FAIL cols got={list(g.columns)} want={list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"{name}: FAIL rows got={len(g)} want={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"{name}: FAIL values ({int(diff.sum())} differing rows)")
            print("  got :", g[diff].head(3).to_dict("records"))
            print("  want:", w[diff].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"{name}: PASS ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
