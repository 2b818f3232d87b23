#!/usr/bin/env python3
"""Generate pinned-constant DuckDB oracle SQL (VALUES tables) from a
graft.Verify output directory, for queries whose inputs are deterministic
sf-independent fixtures (their outputs are constants by construction).

Environment contract: pins are valid for THIS container (fixed JDK +
libm + x86-64). java.lang.Math trig is 1-ulp-specified, not bit-specified,
so a different architecture or JDK vendor can shift trig-derived fixture
values in the last ulp (and mm_jpeg_decode additionally bakes in this
JDK's ImageIO encoder bytes). Queries are verified bit-stable across
PARALLELISM (local[2/7/32]) before pinning; a platform move re-pins with
this tool.

Usage: python3 tools/pin_oracle.py <verifyOutDir> <query> [<query> ...]

Prints, per query, a Scala-pasteable string literal holding the SQL.
"""
import sys, glob
import duckdb


def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # Route through a string cast: DuckDB parses bare decimal literals
        # as DECIMAL, truncating the 17th significant digit; '…'::DOUBLE is
        # an exact round-trip.
        r = repr(v)
        return f"'{r}'::DOUBLE"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def main():
    out = sys.argv[1]
    con = duckdb.connect()
    for name in sys.argv[2:]:
        pdir = f"{out}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"// {name}: MISSING OUTPUT")
            continue
        rel = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
        cols = rel.columns
        rows = rel.fetchall()
        rows.sort(key=lambda r: tuple(str(x) for x in r))
        vals = ",\n      ".join("(" + ", ".join(lit(v) for v in r) + ")"
                                for r in rows)
        quoted = ", ".join('"' + c + '"' for c in cols)
        sql = (f"SELECT * FROM (VALUES\n      {vals})\n"
               f"      AS t({quoted})")
        print(f'    "{name}" -> """{sql}""",')
        print()


if __name__ == "__main__":
    main()
