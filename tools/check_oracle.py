#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first,
then this script compares each query's parquet output against its DuckDB
oracle SQL (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(got.columns)} oracle={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(got)} oracle={len(exp)}"
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        # exact compare via string repr of every cell (catches type diffs loosely)
        mism = None
        for c in got.columns:
            a = gs[c].astype(str).tolist()
            b = es[c].astype(str).tolist()
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                mism = f"VALUE_MISMATCH col={c} row={bad} spark={a[bad]} oracle={b[bad]}"
                break
        results[name] = mism or "OK"
    width = max(len(n) for n in results)
    ok = 0
    for n, r in results.items():
        print(f"{n:<{width}}  {r}")
        ok += r == "OK"
    print(f"\n{ok}/{len(results)} OK")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
