#!/usr/bin/env bash
# One-command gate: compile, full test suite, Verify at sf0.01, DuckDB
# oracle compare, committed golden hashes. Mirrors the driver's t2 flow.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:-/root/testdata/sf0.01}
OUT=$(mktemp -d /tmp/graft-ci.XXXXXX)

sbt -batch compile
sbt -batch test
sbt -batch "runMain graft.Verify $SF_DIR $OUT"
python3 scripts/check.py "$SF_DIR" "$OUT"
python3 scripts/golden.py check "$OUT" golden/sf0.01.json
echo "CI GREEN ($SF_DIR)"
