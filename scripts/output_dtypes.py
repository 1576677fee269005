#!/usr/bin/env python3
"""Spark-output dtype preflight (VERDICT r9 #3 — the Q235 class).

Spark SQL parses a bare decimal literal (`2.0`) as DecimalType, so an
expression like `ROUND(2.0 * n2 / n1, 4)` silently produces a DECIMAL
output column that the oracle computes as DOUBLE — the two engines then
round different representations and drift in the low digits. The float
discipline (every emitted float is a single CAST-AS-DOUBLE divide of
exact integers, rounded once) implies NO output column may be DECIMAL.

This scans every query's Verify output parquet and FAILS on any
DECIMAL-typed column. Together with scripts/oracle_dtypes.py (the
DuckDB-side twin) and the exact-value compare in scripts/check.py, the
Q235 drift class cannot ship.

Usage: python3 scripts/output_dtypes.py <verifyOutDir>
"""
import glob, sys
import duckdb

def main():
    out_dir = sys.argv[1]
    con = duckdb.connect()
    n_bad = 0
    dirs = sorted(glob.glob(f"{out_dir}/Q*"))
    for d in dirs:
        name = d.rsplit("/", 1)[1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            continue
        desc = con.execute(f"DESCRIBE SELECT * FROM '{files[0]}'").fetchall()
        bad = [(c, t) for c, t, *_ in desc if str(t).upper().startswith("DECIMAL")]
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"BAD  {name}: {cols} -> rewrite as "
                  f"ROUND(CAST(<int expr> AS DOUBLE) / <int expr>, k)")
            n_bad += 1
    print(f"== output dtype preflight: {len(dirs) - n_bad} clean, "
          f"{n_bad} bad-dtype (of {len(dirs)}) ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
