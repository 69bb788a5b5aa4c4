#!/usr/bin/env bash
# Two consecutive bench runs — run-to-run variance check. Each line is one
# full graft.Bench JSON result; compare per-query seconds across the two.
# Usage: scripts/bench_twice.sh [sf_dir] [cpus]
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
CPUS=${2:-32}
for i in 1 2; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | sed 's/^\[info\] //'
done
