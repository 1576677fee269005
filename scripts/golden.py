#!/usr/bin/env python3
"""Golden-hash harness (SURVEY.md §2.0.5 / §5.2): canonical serialization of
each query's Verify output — columns sorted by name, rows in produced order,
`|` separator, full-precision `repr()` doubles (round 10: `%.4f` masked
the 184 round-6 columns — the Q235 class), `\\N` nulls — SHA-256 hashed.

Usage:
  python3 scripts/golden.py write <verifyOutDir> golden/sf0.01.json
  python3 scripts/golden.py check <verifyOutDir> golden/sf0.01.json

`check` exits non-zero on any mismatch, so CI can gate on committed goldens
without needing DuckDB.
"""
import glob
import hashlib
import json
import sys

import duckdb  # used only as a parquet reader here


def canonical_hash(parquet_file):
    con = duckdb.connect()
    cur = con.execute(f"SELECT * FROM '{parquet_file}'")
    cols = [d[0] for d in cur.description]
    perm = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    h.update(("|".join(cols[i] for i in perm) + "\n").encode())
    for row in cur.fetchall():
        fields = []
        for i in perm:
            v = row[i]
            if v is None:
                fields.append("\\N")
            elif isinstance(v, float):
                # full precision; normalize -0.0 so the hash can't split
                # on a sign-of-zero representation difference
                fields.append(repr(v + 0.0))
            elif hasattr(v, "isoformat"):
                fields.append(v.isoformat())
            else:
                fields.append(str(v))
        h.update(("|".join(fields) + "\n").encode())
    return h.hexdigest()


def collect(out_dir):
    hashes = {}
    for d in sorted(glob.glob(f"{out_dir}/Q*")):
        name = d.rsplit("/", 1)[1]
        files = glob.glob(f"{d}/*.parquet")
        if files:
            hashes[name] = canonical_hash(files[0])
    return hashes


def main():
    mode, out_dir, golden_file = sys.argv[1], sys.argv[2], sys.argv[3]
    hashes = collect(out_dir)
    if mode == "write":
        with open(golden_file, "w") as f:
            json.dump(hashes, f, indent=1, sort_keys=True)
        print(f"wrote {len(hashes)} golden hashes to {golden_file}")
        return
    golden = json.load(open(golden_file))
    passed = bad = 0
    for name in sorted(golden):
        got = hashes.get(name)
        if got != golden[name]:
            print(f"FAIL {name}: {got} != {golden[name]}")
            bad += 1
        else:
            print(f"PASS {name}")
            passed += 1
    # A registered gate with no pinned golden is a coverage regression
    # (VERDICT r6 #5: hash-file count must equal registry count), so it
    # fails the check rather than just noting.
    missing = set(hashes) - set(golden)
    if missing:
        print(f"FAIL: queries without goldens: {sorted(missing)}")
        bad += len(missing)
    print(f"== {passed} pass, {bad} fail ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
