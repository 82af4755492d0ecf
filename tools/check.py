#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, loads the corresponding Spark parquet dump, sorts
columns by name, and compares values exactly (floats bit-for-bit, which is
what the engine's decimal-sum determinism discipline targets).

Local pre-flight only — NOT part of the shipped library.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df

def cell(v):
    # normalize to a comparable/hashable repr
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def frame_rows(df):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    spark_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out}/*/")}
    for name in sorted(spark_dirs):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "FAIL(rows=0)"
            print(f"{status:10s} {name}: {len(got)} rows")
            if len(got) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
        g, e = frame_rows(got), frame_rows(exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(g)} rows differ; first at row {i}:")
            print(f"  spark : {a}")
            print(f"  duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS       {name}: {len(g)} rows")
            n_pass += 1
    missing = set(oracle) - spark_dirs
    for m in sorted(missing):
        print(f"FAIL {m}: oracle present but no spark output"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
