#!/usr/bin/env bash
# Flake-soak harness — the analog of the reference's main/test-mr-many.sh
# (lines 15-22: re-run the suite N times to flush rare scheduling races,
# fail on first red). Two modes:
#
#  default     — the suites with genuine concurrency and process-level
#                fault injection (streaming micro-batches, task-retry
#                crash recovery, executor-JVM kill, straggler
#                speculation, the mrout commit protocol, stage-
#                parallelism observation): the 1-in-20 flake candidates
#                a single green run cannot clear.
#  --full      — the ENTIRE `sbt test` in one JVM per iteration, suite
#                ordering intact. This is the mode that catches
#                cross-suite shared-session leaks (the r7
#                DynamicAppJarSpec artifact leak was invisible to the
#                per-suite-group mode by construction: it needed the
#                full 22-suite shared-session run to reproduce).
#
# Usage: tools/soak.sh [N]              (default 10)
#        tools/soak.sh --full [N]      (default 5)
#        SOAK_SUITES="..." tools/soak.sh 5
set -u
FULL=0
if [ "${1:-}" = "--full" ]; then
  FULL=1
  shift
fi
if [ "$FULL" = 1 ]; then
  N="${1:-5}"
  CMD="test"
else
  N="${1:-10}"
  SUITES="${SOAK_SUITES:-graft.streaming.EventStreamsSpec graft.mr.FaultToleranceSpec graft.mr.ExecutorLossSpec graft.mr.SpeculationSpec graft.sources.MrOutSourceSpec graft.mr.ParallelismSpec}"
  CMD="testOnly $SUITES"
fi
cd "$(dirname "$0")/.."
mkdir -p target
for i in $(seq 1 "$N"); do
  echo "[soak] iteration $i/$N: $(date -u +%H:%M:%SZ)"
  if ! sbt -batch "$CMD" > "target/soak-$i.log" 2>&1; then
    echo "[soak] FAILED at iteration $i — see target/soak-$i.log"
    tail -40 "target/soak-$i.log"
    exit 1
  fi
done
echo "[soak] $N/$N iterations green"
