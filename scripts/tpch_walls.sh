#!/usr/bin/env bash
# TPC-H decade walls (BASELINE.md three-decade tables): full q1-q22 walls
# via TpchAudit walls mode, min-of-N in ONE session (the r15 protocol).
# Round 17 re-pins both decades on the RECALIBRATED ScaleGen data
# (long-tailed lines-per-order — q18 does real work now).
#
# Usage: scripts/tpch_walls.sh [multiplier] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."

MULT="${1:-1000}"
REPS="${2:-2}"
DIR="/tmp/scale${MULT}"

if [ "$MULT" -ge 1000 ]; then
  : "${SPARK_DRIVER_MEM:=64g}"; export SPARK_DRIVER_MEM
  : "${SPARK_GRAFT_SHUFFLE:=256}"; export SPARK_GRAFT_SHUFFLE
fi
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_TPCH_MODE=walls
export SPARK_GRAFT_TPCH_REPS="$REPS"

sbt -batch "runMain graft.TpchAudit $DIR" 2>&1 | grep -E "\[tpchaudit"
