#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sf_dir> <verify_out_dir> [timeout_s]
       check_oracle.py --selftest
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

# The ONLY queries allowed to run without a DuckDB value oracle: engine-
# internal sketches (Spark HLL++ / t-digest) whose bytes no other engine
# can replay. Each still carries a CONTRACT — expected columns plus a SQL
# row-count the corpus determines — checked here, so rows+schema are
# verified for all queries and only the HASH is whitelisted. Any OTHER
# query missing an oracle means oracle_sql.json generation broke (renamed
# key, dropped entry) and is counted as a FAILURE, not recorded as
# intentional. Both ops are paired with hash-checked portable companions
# (q9c_portable_hll / q13c_sampled_percentiles).
CONTRACTS = {
    "q9b_approx_distinct": {
        "cols": ["o_orderpriority", "approx_customers"],
        "rows_sql": "SELECT count(DISTINCT o_orderpriority) FROM orders",
    },
    "q13b_approx_percentiles": {
        "cols": ["o_orderpriority", "p50", "p95", "p100"],
        "rows_sql": "SELECT count(DISTINCT o_orderpriority) FROM orders",
    },
}

def connect(sf_dir):
    con = duckdb.connect()
    # DuckDB's default memory_limit is 80% of RAM; alongside a residual
    # Spark JVM that invites the OS OOM-killer (observed: exit 137 on the
    # skew replay). A fixed cap keeps the replay spilling instead of dying.
    con.execute(f"SET memory_limit = '{os.environ.get('ORACLE_MEM', '60GB')}'")
    # ... and the spill goes to an explicit directory on the big volume:
    # the round-12 sf10 replay filled the default temp location mid-sweep
    # (5 of 8 FAILs were 'No space left on device' from DuckDB temp spill)
    tmp = os.environ.get("ORACLE_TMP", "/tmp/duck_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def run_oracle(con, sql, timeout, reconnect):
    """Run one oracle query under an optional wall timeout.

    Returns (df_or_None, timed_out, con). Check-and-interrupt is ATOMIC
    with completion: fire() holds `lock` across its done-check AND the
    interrupt, and the main thread marks done under the same lock — so
    once finish() returns, no interrupt can land afterwards. The
    reconnect decision is computed only AFTER timer.cancel() + a join of
    the timer thread, i.e. after `timed_out` is final: if the timer fired
    at all (even racing a completing query), the connection is rebuilt
    from scratch so a half-delivered interrupt can never poison the NEXT
    query's replay.
    """
    timed_out = []
    lock = threading.Lock()
    done = [False]
    timer = None
    if timeout:
        def fire():
            with lock:
                if not done[0]:
                    timed_out.append(True)
                    con.interrupt()
        timer = threading.Timer(timeout, fire)
        timer.start()

    def finish():
        with lock:
            done[0] = True
        if timer:
            timer.cancel()
            timer.join()  # after this, timed_out can no longer change
    try:
        df = con.sql(sql).df()
        finish()
        # a timer that fired while the query was completing interrupted a
        # live connection — hand back a fresh one even though df is good
        return df, bool(timed_out), (reconnect() if timed_out else con)
    except Exception:
        finish()
        if timed_out:
            return None, True, reconnect()
        raise

def selftest():
    """Deliberate-timeout exercise: a slow query must record a timeout and
    the NEXT query on the (rebuilt) connection must run unpoisoned."""
    con = duckdb.connect()
    slow = ("SELECT count(*) FROM range(100000000) a, range(100000) b "
            "WHERE (a.range * b.range) % 1000003 = 7")
    df, timed_out, con = run_oracle(con, slow, 0.2, duckdb.connect)
    assert timed_out and df is None, "slow query must time out"
    df, timed_out, con = run_oracle(con, "SELECT 41 + 1 AS v", 30.0,
                                    duckdb.connect)
    assert not timed_out and df["v"][0] == 42, "follow-up query poisoned"
    # a timer racing a COMPLETING query: near-zero timeout on a fast query
    # either times out cleanly or passes cleanly — never corrupts state
    for _ in range(20):
        df, timed_out, con = run_oracle(con, "SELECT 1 AS v", 0.001,
                                        duckdb.connect)
    df, timed_out, con = run_oracle(con, "SELECT 7 AS v", 30.0,
                                    duckdb.connect)
    assert df["v"][0] == 7, "racing timer poisoned a later query"
    print("selftest: PASS")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to avoid dtype mismatches (int32 vs int64 etc.)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # FRESH connection per query: DuckDB's temp-storage file grows
        # with a query's spill and is not reclaimed while the connection
        # lives, so a PASSING spill-heavy replay can starve the NEXT
        # query's disk (observed at sf10: vec_knn_join PASS grew the temp
        # file, then vec_knn_join_ann hit ENOSPC, then vec_knn_join_auto
        # — a superset of ann's plan — PASSED once the errored connection
        # dropped its temp file). Closing the connection deletes its temp
        # files; re-registering 10 parquet views costs milliseconds.
        con = connect(sf_dir)
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            c = CONTRACTS.get(name)
            if c is None:
                # whitelist enforced HERE: an unexpected oracle-less query
                # is a generation bug, not a by-design sketch
                print(f"{name}: NO-ORACLE rows={len(got)} "
                      "(not in the by-design contract set)")
                n_fail += 1
                continue
            # the contract probe must fail PER QUERY like every other
            # verdict path — a missing view/parquet aborting the whole
            # sweep would hide every later query's verdict
            try:
                want_rows = con.sql(c["rows_sql"]).fetchone()[0]
            except Exception as e:
                print(f"{name}: FAIL contract rows_sql errored: {e}")
                n_fail += 1
                continue
            cols_ok = sorted(got.columns) == sorted(c["cols"])
            if cols_ok and len(got) == want_rows:
                print(f"{name}: CONTRACT-PASS rows={len(got)} schema ok "
                      "(value hash whitelisted by design)")
                n_pass += 1
            else:
                print(f"{name}: FAIL contract cols got={sorted(got.columns)} "
                      f"want={sorted(c['cols'])} rows got={len(got)} "
                      f"want={want_rows}")
                n_fail += 1
            continue
        try:
            want, timed_out, con = run_oracle(
                con, oracles[name], timeout, lambda: connect(sf_dir))
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        if want is None:
            print(f"{name}: ORACLE-TIMEOUT after {timeout}s (rows={len(got)})")
            n_fail += 1
            continue
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
