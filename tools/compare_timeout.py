#!/usr/bin/env python3
"""compare.py with a per-query ORACLE time budget — for large-SF scale
soaks where some ground-truth oracles are deliberately brute-force
(quadratic replays that are fine at sf0.01/0.1 but not at sf1+). A
query whose DuckDB oracle exceeds the budget reports ORACLE_TIMEOUT
(test-machinery cost, not an engine failure) instead of hanging the
sweep; everything else is the identical value-level compare.

Usage: python3 tools/compare_timeout.py <sfDir> <outDir> [budget_sec=180]
"""
import json, sys, glob, os, threading
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import norm, schema_mismatch


def run_with_budget(con, sql, budget):
    """Execute sql; interrupt the connection if it exceeds budget."""
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows, None
    except Exception as e:
        msg = str(e)
        if "INTERRUPT" in msg.upper():
            return None, None, "ORACLE_TIMEOUT"
        return None, None, msg[:200]
    finally:
        timer.cancel()


def main(sf_dir, out_dir, budget):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory-style table (ScaleData output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output", flush=True)
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        ecols, erows, err = run_with_budget(con, sql, budget)
        if err == "ORACLE_TIMEOUT":
            print(f"SKIP {name}: oracle exceeded {budget}s budget "
                  f"(spark side produced {len(grows)} rows)", flush=True)
            n_skip += 1
            continue
        if err:
            print(f"FAIL {name}: {err}", flush=True)
            n_fail += 1
            continue
        sm = schema_mismatch(con, f"{pq}/*.parquet", sql)
        if sm:
            print(f"FAIL {name}: schema types: {sm}", flush=True)
            n_fail += 1
            continue
        g = norm(grows, gcols)
        e = norm(erows, ecols)
        if g[0] != e[0]:
            print(f"FAIL {name}: columns {g[0]} vs {e[0]}", flush=True)
            n_fail += 1
        elif g[1] != e[1]:
            diff = [(a, b) for a, b in zip(g[1], e[1]) if a != b][:3]
            print(f"FAIL {name}: {len(g[1])} vs {len(e[1])} rows; "
                  f"first diffs {diff}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g[1])} rows)", flush=True)
            n_pass += 1
    rc_path = f"{out_dir}/rows_check.json"
    if os.path.exists(rc_path):
        for name, rec in sorted(json.load(open(rc_path)).items()):
            _, row, err = run_with_budget(con, rec["expected_rows_sql"], budget)
            if err == "ORACLE_TIMEOUT":
                print(f"SKIP {name} (rows-only): oracle over budget", flush=True)
                n_skip += 1
            elif err:
                print(f"FAIL {name} (rows-only): {err}", flush=True)
                n_fail += 1
            elif rec["rows"] == row[0][0]:
                print(f"PASS {name} (rows-only: {row[0][0]} rows)", flush=True)
                n_pass += 1
            else:
                print(f"FAIL {name} (rows-only): {rec['rows']} vs "
                      f"expected {row[0][0]}", flush=True)
                n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} oracle-timeout ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    b = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    sys.exit(main(sys.argv[1], sys.argv[2], b))
