#!/bin/sh
# Standalone repro for the Spark 4.1.2 TIMESTAMP_NTZ x CBO MatchError
# (fz_0039) that Graft.analyzeStatSafeColumns works around.
#
#   leg 1: ANALYZE ... FOR ALL COLUMNS + cbo.enabled=true + a range
#          predicate over the NTZ column -> scala.MatchError in
#          FilterEstimation.evaluateBinary (INTERNAL_ERROR) at
#          optimization time. REPRODUCES the bug on stock settings.
#   leg 2: the same query after Graft.analyzeStatSafeColumns (NTZ/complex/
#          binary columns skipped from ANALYZE) -> correct result, CBO on.
#
# Exit 0 = bug reproduced AND workaround passes. Exit 1 = either leg
# surprised us; if leg 1 stopped crashing, Spark fixed the bug upstream —
# retire the carve-out in Graft.analyzeStatSafeColumns.
set -e
cd "$(dirname "$0")/.."
exec sbt -batch "runMain graft.ReproNtzCbo"
