#!/bin/bash
# Local correctness loop: run graft.Verify on a scale dir, then diff every
# query against its DuckDB oracle (emulates the driver's t2 gate).
# Usage: scripts/check.sh [sfDir] [outDir]
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
cd "$(dirname "$0")/.."
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt --error "runMain graft.Verify $SF $OUT"
python3 scripts/compare.py "$SF" "$OUT"
