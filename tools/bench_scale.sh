#!/usr/bin/env bash
# Standing decade-scale sweep (SCALE.md protocol): sf1 then sf10, heap
# and shuffle partitions scaled per tier. Appends one JSON line per
# tier to BENCH_scale.json and prints a round-over-round comparison.
# Usage: tools/bench_scale.sh [sf1_dir] [sf10_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF1="${1:-testdata-local/sf1}"
SF10="${2:-testdata-local/sf10}"

echo "== BenchScale $SF1 (heap 48g, partitions 32) =="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  sbt -batch "runMain graft.tools.BenchScale $SF1" 2>&1 |
  grep -E "MEASURED|ERRORED|COMPARE|^\{"

echo "== BenchScale $SF10 (heap 96g, partitions 128) =="
SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
  sbt -batch "runMain graft.tools.BenchScale $SF10" 2>&1 |
  grep -E "MEASURED|ERRORED|COMPARE|^\{"
