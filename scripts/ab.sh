#!/bin/bash
# Cold-fork subset bench (the r15 required evidence format, VERDICT r14 #7):
# runs graft.Bench in a FRESH forked JVM (run/fork := true) restricted to
# the given queries via SPARK_GRAFT_ONLY — i.e. exactly the driver's
# fork-isolated warmed protocol (each query runs twice, second reported).
# Usage: scripts/ab.sh <comma-separated-query-names> [sf-dir]
# Prints the contract JSON line (the subset's per-query seconds).
set -u
cd "$(dirname "$0")/.."
SPARK_GRAFT_ONLY="$1" \
SPARK_GRAFT_SF_DIR="${2:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
sbt -batch "runMain graft.Bench" 2>/dev/null | grep '^{"metric"' | tail -1
