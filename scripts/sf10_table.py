#!/usr/bin/env python3
"""Aggregate an Sf10Rehearsal sweep log into the per-family table SCALE.md
records (r11 verdict item 5): wall seconds, spill, shuffle — one decade
above the bench tier — plus the per-leg outliers worth a finding.

Usage: python3 scripts/sf10_table.py <sweep.log> [more.log ...]
Later files win per leg (a clean re-measure supersedes an earlier error).
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def family_map():
    """Same parse as scaling.py's (which cannot be imported — it runs
    main() at module load): '"Qnn" ->' registrations per operator file."""
    fams = {}
    for path in sorted(glob.glob(f"{REPO}/src/main/scala/graft/operators/*.scala")):
        fam = os.path.basename(path)[:-len(".scala")]
        for q in re.findall(r'"(Q[0-9]+b?)"\s*->', open(path).read()):
            fams[q] = fam
    return fams


def main(*paths):
    fams = family_map()
    byleg = {}
    for path in paths:
        for line in open(path):
            line = line.strip()
            if line.startswith('{"leg"'):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                byleg[d["leg"]] = d
    rows = [d for d in byleg.values() if "error" not in d]
    errors = [d for d in byleg.values() if "error" in d]
    agg = {}
    for r in rows:
        leg = r["leg"]
        fam = fams.get(leg, "build" if leg.endswith("_build") else "?")
        a = agg.setdefault(fam, dict(n=0, sec=0.0, spill=0.0, shuf=0.0, worst=(0.0, "")))
        a["n"] += 1
        a["sec"] += r["sec"]
        a["spill"] += r["spill_mem_mb"] + r["spill_disk_mb"]
        a["shuf"] += r["shuffle_write_mb"]
        if r["sec"] > a["worst"][0]:
            a["worst"] = (r["sec"], leg)
    print("| family | legs | total s | spill GB | shuffle-w GB | slowest leg |")
    print("|---|---|---|---|---|---|")
    for fam in sorted(agg):
        a = agg[fam]
        print(f"| {fam} | {a['n']} | {a['sec']:.1f} | {a['spill']/1024:.1f} "
              f"| {a['shuf']/1024:.1f} | {a['worst'][1]} ({a['worst'][0]:.1f} s) |")
    tot = sum(a["sec"] for a in agg.values())
    print(f"| **all** | {sum(a['n'] for a in agg.values())} | **{tot:.1f}** | "
          f"{sum(a['spill'] for a in agg.values())/1024:.1f} | "
          f"{sum(a['shuf'] for a in agg.values())/1024:.1f} | |")
    print()
    print("Slowest 12 legs:")
    for r in sorted(rows, key=lambda r: -r["sec"])[:12]:
        print(f"  {r['leg']} ({fams.get(r['leg'], '?')}): {r['sec']:.1f} s, "
              f"spill {(r['spill_mem_mb'] + r['spill_disk_mb'])/1024:.1f} GB")
    if errors:
        print()
        print("Errored legs:")
        for d in errors:
            print(f"  {d['leg']}: {d['error'][:110]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
