#!/usr/bin/env python3
"""Oracle dtype preflight (VERDICT r7 #2).

Runs every SparkEntry.oracleSql query against a small SF in DuckDB and
FAILS if any output column is HUGEINT / UHUGEINT / DECIMAL. Those types
render as float64/object in the driver's pandas comparator and hash-
mismatch against Spark's int64 even when every value is identical — the
class that produced ten red gates across rounds 6 and 7 (Q119/Q124/Q125/
Q127/Q128/Q138/Q139/Q146/Q147/Q149). The fix is always the same one-line
`CAST(... AS BIGINT)` in the oracle SQL.

Usage: python3 scripts/oracle_dtypes.py <sfDir> <oracleJsonDirOrFile>
"""
import json, os, sys
import duckdb

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def load_views(con, sf_dir):
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def main():
    sf_dir, path = sys.argv[1], sys.argv[2]
    if os.path.isdir(path):
        path = os.path.join(path, "oracle_sql.json")
    oracle = json.load(open(path))
    con = duckdb.connect()
    load_views(con, sf_dir)
    n_bad = n_err = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            types = [str(t).upper() for t in rel.types]
        except Exception as e:
            print(f"ERR  {name}: oracle failed to run: {e}")
            n_err += 1
            continue
        bad = [(c, t) for c, t in zip(rel.columns, types)
               if any(t.startswith(b) for b in BAD_TYPES)]
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"BAD  {name}: {cols} -> add CAST(... AS BIGINT) in the oracle")
            n_bad += 1
    total = len(oracle)
    print(f"== dtype preflight: {total - n_bad - n_err} clean, "
          f"{n_bad} bad-dtype, {n_err} errored (of {total}) ==")
    sys.exit(1 if (n_bad or n_err) else 0)

if __name__ == "__main__":
    main()
