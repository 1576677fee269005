#!/usr/bin/env python3
"""Local self-check mimicking the driver's t2 compare (SURVEY.md §2.0).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [Qnn ...]

Reads each query's parquet written by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over views of the same testdata,
and compares: schema (sorted column names), row count, and values
(columns sorted by name, row order as produced).
"""
import json, math, sys, glob
import duckdb

def load_views(con, sf_dir):
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact comparison (mirrors the driver's hash compare): every
        # emitted float is already ROUND()ed identically in both engine
        # texts, so only genuine drift differs. Normalize -0.0 to 0.0.
        return v + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    load_views(con, sf_dir)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        try:
            exp = con.execute(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} duck={len(exp_rows)}")
            n_fail += 1; continue
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        bad = None
        for ri, (gr, er) in enumerate(zip(got_rows, exp_rows)):
            g = tuple(norm(gr[i]) for i in gperm)
            e = tuple(norm(er[i]) for i in eperm)
            if g != e:
                bad = (ri, g, e); break
        if bad:
            ri, g, e = bad
            print(f"FAIL {name}: row {ri}\n  spark={g}\n  duck ={e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
