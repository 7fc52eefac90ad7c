#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB over the same
sf dir, and diff (column-name-sorted, row-sorted, value-level).

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [sorted(cols), out]


ARROW_TO_DUCK = {
    "int64": "BIGINT", "int32": "INTEGER", "double": "DOUBLE",
    "float": "FLOAT", "string": "VARCHAR", "large_string": "VARCHAR",
    "bool": "BOOLEAN",
}


def schema_mismatch(con, pq_glob, sql):
    """Return a description of Spark-parquet vs DuckDB-result type
    mismatches (duck types via DESCRIBE), or None if compatible."""
    import pyarrow.parquet as papq
    import glob as g
    f = g.glob(pq_glob)[0]
    spark_types = {}
    sch = papq.read_schema(f)
    for name in sch.names:
        spark_types[name] = ARROW_TO_DUCK.get(str(sch.field(name).type),
                                              str(sch.field(name).type))
    duck_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    diffs = []
    for c in duck_types:
        st, dt = spark_types.get(c), duck_types[c]
        if st is not None and st != dt:
            diffs.append(f"{c}: spark={st} duck={dt}")
    return "; ".join(diffs) or None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        sm = schema_mismatch(con, f"{pq}/*.parquet", sql)
        if sm:
            print(f"FAIL {name}: schema types: {sm}")
            n_fail += 1
            continue
        g = norm(grows, gcols)
        e = norm(erows, ecols)
        if g[0] != e[0]:
            print(f"FAIL {name}: columns {g[0]} vs {e[0]}")
            n_fail += 1
        elif g[1] != e[1]:
            diff = [(a, b) for a, b in zip(g[1], e[1]) if a != b][:3]
            print(f"FAIL {name}: {len(g[1])} vs {len(e[1])} rows; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g[1])} rows)")
            n_pass += 1
    # rows-only tier (by design, no value oracle): Verify records actual
    # row counts + DuckDB SQL recomputing the expected count
    rc_path = f"{out_dir}/rows_check.json"
    if os.path.exists(rc_path):
        for name, rec in sorted(json.load(open(rc_path)).items()):
            try:
                expected = con.execute(rec["expected_rows_sql"]).fetchone()[0]
            except Exception as e:
                print(f"FAIL {name} (rows-only): {str(e)[:200]}")
                n_fail += 1
                continue
            if rec["rows"] == expected:
                print(f"PASS {name} (rows-only: {expected} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name} (rows-only): {rec['rows']} vs expected {expected}")
                n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
